"""Interactive-session benchmark: propagation throughput as the certain
bank grows over many rounds (the reference's real eval regime:
rounds=60 -> Mmax ~ 80 slots ~ 130k memory tokens at 480p).

The XLA sort path degrades super-linearly with bank size; the Pallas
streaming kernel is linear in the VALID prefix and skips dead blocks."""

import sys
import time
from pathlib import Path

# repo-root import without PYTHONPATH (setting PYTHONPATH breaks the axon
# TPU plugin's interpreter-startup registration in this image)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from eva_vos_tpu.models import PropagationNetwork, FusionNet
from eva_vos_tpu.engine import InferenceEngine
from eva_vos_tpu.engine.propagation import EngineConfig, prepare_video, pad_mask
from eva_vos_tpu.data import synthetic_video


def main(t=60, h=480, w=854, rounds=10, max_interactions=60,
         strategy="auto", no_fusion=False):
    dtype = jnp.bfloat16
    ph, pw = h + (-h) % 16, w + (-w) % 16
    stcn = PropagationNetwork(dtype=dtype)
    fusion = FusionNet(dtype=dtype)
    sp = stcn.init(jax.random.PRNGKey(0), jnp.zeros((ph, pw, 3), dtype),
                   jnp.zeros((1, ph, pw), dtype), method="init_all")
    fp = fusion.init(jax.random.PRNGKey(1), jnp.zeros((ph, pw, 3), dtype),
                     jnp.zeros((ph, pw), dtype), jnp.zeros((ph, pw), dtype),
                     jnp.zeros((ph, pw, 2), dtype), jnp.zeros((2,), dtype))
    engine = InferenceEngine(
        stcn, None if no_fusion else fusion, sp, fp,
        EngineConfig(max_interactions=max_interactions, feature_chunk=2,
                     readout_strategy=strategy))
    print(f"readout: {engine.config.readout_strategy}", flush=True)

    images, masks = synthetic_video(t, h, w, 1, seed=0)
    padded, pad = prepare_video(images, dtype=dtype)
    feats = engine.precompute_features(padded)
    jax.block_until_ready(feats.k16)
    state = engine.init_state(feats, 1)
    print(f"bank: {state.bank_k.shape[0]} slots x {state.bank_k.shape[1]} "
          f"tokens", flush=True)

    # spread interactions like an annotation session
    order = [0, t - 1] + list(range(2, t - 1, max(1, t // rounds)))[:rounds - 2]
    total_frames = 0
    t0 = None
    interacted = set()
    for r, idx in enumerate(order[:rounds]):
        # frames this round's fwd+bwd passes actually propagate (the pass
        # bounds are the nearest already-interacted frames on either side)
        fwd = min((i for i in interacted if i > idx), default=t)
        bwd = max((i for i in interacted if i < idx), default=-1)
        n_frames = max(0, fwd - idx - 1) + max(0, idx - bwd - 1)
        interacted.add(idx)

        m = pad_mask(masks[:, idx].astype(np.float32), pad)
        start = time.perf_counter()
        state = engine.interact(state, feats, m, idx, donate=True)
        jax.block_until_ready(state.prob)
        dt = time.perf_counter() - start
        if r == 0:
            print(f"round 1 (compile): {dt:.1f}s", flush=True)
            t0 = time.perf_counter()
        else:
            total_frames += n_frames
            print(f"round {r + 1}: bank={int(state.certain_count)} certain, "
                  f"{n_frames} frames, {dt * 1000:.0f} ms", flush=True)
    elapsed = time.perf_counter() - t0
    print(f"steady-state: {total_frames / elapsed:.1f} propagated frames/sec "
          f"({(rounds - 1) / elapsed:.2f} rounds/sec) over {rounds - 1} "
          f"rounds", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    rounds = 10
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1])
        del args[i:i + 2]
    pos = [a for a in args if not a.startswith("--")]
    main(rounds=rounds, strategy=pos[0] if pos else "auto",
         no_fusion="--no-fusion" in args)

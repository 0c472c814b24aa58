"""Headline benchmark: STCN propagation throughput at 480p, single chip.

Matches BASELINE.md's flagship metric (config 2): space-time memory
propagation of a 480p single-object video — per-frame encode_key is
precomputed once per video (as the reference's key buffer amortizes it),
and the timed region is the full interact() pass: top-k memory attention,
decode, aggregation, and mem_freq memory admission over T-1 frames.

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
denominator is REFERENCE_GPU_FPS, a documented literature estimate for
STCN propagation on the reference's CUDA stack (~15 fps at 480p on a
V100-class GPU). Replace with a measured value when GPU hardware exists.

Usage:
    python bench.py           # full 480p benchmark on the default device
    python bench.py --quick   # tiny CPU smoke run (same code path)
"""

import argparse
import json
import time

import numpy as np

REFERENCE_GPU_FPS = 15.0


def run(quick: bool = False):
    import jax
    import jax.numpy as jnp

    if quick:
        jax.config.update("jax_platforms", "cpu")

    from eva_vos_tpu.models import PropagationNetwork, FusionNet
    from eva_vos_tpu.engine import InferenceEngine
    from eva_vos_tpu.engine.propagation import (EngineConfig, prepare_video,
                                                pad_mask)
    from eva_vos_tpu.data import synthetic_video

    if quick:
        t, h, w = 4, 48, 64
        key_arch, value_arch, top_k = "resnet18", "resnet18", 8
        dtype = jnp.float32
        iters = 1
    else:
        t, h, w = 30, 480, 854
        key_arch, value_arch, top_k = "resnet50", "resnet18", 50
        dtype = jnp.bfloat16
        iters = 3

    stcn = PropagationNetwork(key_arch=key_arch, value_arch=value_arch,
                              top_k=top_k, dtype=dtype)
    fusion = FusionNet(dtype=dtype)
    # init at the padded (multiple-of-16) geometry the engine runs at
    ph = h + (-h) % 16
    pw = w + (-w) % 16
    frame0 = jnp.zeros((ph, pw, 3), dtype)
    mask0 = jnp.zeros((1, ph, pw), dtype)
    sp = stcn.init(jax.random.PRNGKey(0), frame0, mask0, method="init_all")
    fp = fusion.init(jax.random.PRNGKey(1), frame0, mask0[0], mask0[0],
                     jnp.zeros((ph, pw, 2), dtype), jnp.zeros((2,), dtype))

    cfg = EngineConfig(mem_freq=5, top_k=top_k, max_interactions=4,
                       feature_chunk=2)
    engine = InferenceEngine(stcn, fusion, sp, fp, cfg)
    import sys

    strat = engine.config.readout_strategy
    probe = "passed" if strat.startswith("pallas") else "not used"
    print(f"[bench] readout strategy: {strat} (pallas kernel probe {probe})",
          file=sys.stderr)

    images, masks = synthetic_video(t, h, w, num_objects=1, seed=0)
    padded, pad = prepare_video(images, dtype=dtype)
    feats = engine.precompute_features(padded)
    jax.block_until_ready(feats.k16)

    state0 = engine.init_state(feats, 1)
    m0 = pad_mask(masks[:, 0].astype(np.float32), pad).astype(jnp.float32)

    # warm-up (compile)
    out = engine.interact(state0, feats, m0, 0)
    jax.block_until_ready(out.prob)

    start = time.perf_counter()
    for _ in range(iters):
        out = engine.interact(state0, feats, m0, 0)
        jax.block_until_ready(out.prob)
    elapsed = time.perf_counter() - start

    frames = (t - 1) * iters
    fps = frames / elapsed
    result = {
        "metric": "stcn_propagation_fps_480p" if not quick
                  else "stcn_propagation_fps_quick",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / REFERENCE_GPU_FPS, 3),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    run(quick=args.quick)

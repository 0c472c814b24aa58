"""r4: decompose the long-session (60-round) per-round cost at high fill.

The 60-round interactive tail propagates only 1-3 frames per round, so
fixed per-round work (interaction-frame encode_key/encode_value, bank
admission, pass dispatch) and the high-fill selection sweep dominate.
This probe times, at a fill-72 bank on the production 480p geometry:

  r0  donated interact at idx with NO propagation span (idx adjacent to
      both neighbors)  -> the fixed per-round floor
  r1  rounds propagating ~2 frames (1 each side)
  r3  rounds propagating ~6 frames

window-synced (chained donated calls, one scalar fetch per window).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

def main():
    from eva_vos_tpu.models import PropagationNetwork, FusionNet
    from eva_vos_tpu.engine import InferenceEngine
    from eva_vos_tpu.engine.propagation import (EngineConfig, prepare_video,
                                                pad_mask)
    from eva_vos_tpu.data import synthetic_video

    t, h, w = 60, 480, 854
    dtype = jnp.bfloat16
    stcn = PropagationNetwork(key_arch="resnet50", value_arch="resnet18",
                              top_k=50, dtype=dtype)
    fusion = FusionNet(dtype=dtype)
    ph, pw = h + (-h) % 16, w + (-w) % 16
    sp = stcn.init(jax.random.PRNGKey(0), jnp.zeros((ph, pw, 3), dtype),
                   jnp.zeros((1, ph, pw), dtype), method="init_all")
    fp = FusionNet(dtype=dtype).init(
        jax.random.PRNGKey(1), jnp.zeros((ph, pw, 3), dtype),
        jnp.zeros((ph, pw), dtype), jnp.zeros((ph, pw), dtype),
        jnp.zeros((ph, pw, 2), dtype), jnp.zeros((2,), dtype))
    cfg = EngineConfig(mem_freq=5, top_k=50, max_interactions=60,
                       feature_chunk=2)
    engine = InferenceEngine(stcn, fusion, sp, fp, cfg)

    images, masks = synthetic_video(t, h, w, num_objects=1, seed=0)
    padded, pad = prepare_video(images, dtype=dtype)
    feats = engine.precompute_features(padded)
    masks_dev = pad_mask(masks.astype(np.float32), pad)
    jax.block_until_ready(masks_dev)

    # farthest-point order to fill the bank to ~72 slots like a real
    # 60-round session (interact admits per pass)
    order = [0, t - 1]
    while len(order) < 44:
        s = sorted(order)
        gaps = [(s[i + 1] - s[i], s[i]) for i in range(len(s) - 1)]
        g, lo = max(gaps)
        if g <= 1:
            break
        order.append(lo + g // 2)

    state = engine.init_state(feats, 1)
    t0 = time.perf_counter()
    for r, idx in enumerate(order):
        state = engine.interact(state, feats, masks_dev[:, idx], idx,
                                donate=(r > 0))
        if r in (0, 1):
            jax.device_get(state.certain_count)  # compile edges
    jax.device_get(state.certain_count)
    fill = int(jax.device_get(state.certain_count))
    print(f"[probe] filled session: {len(order)} rounds in "
          f"{time.perf_counter() - t0:.1f}s, certain={fill}",
          file=sys.stderr, flush=True)

    res = {"fill_rounds": len(order)}

    def timed_rounds(idxs, label, n=8):
        nonlocal state
        # warm one call per distinct idx parity (same executable)
        st = state
        t0 = time.perf_counter()
        for i in range(n):
            st = engine.interact(st, feats, masks_dev[:, idxs[i % len(idxs)]],
                                 idxs[i % len(idxs)], donate=True)
        jax.device_get(st.certain_count)
        state = st
        ms = (time.perf_counter() - t0) / n * 1e3
        res[label] = round(ms, 2)
        print(f"[probe] {label}: {ms:.1f} ms/round", file=sys.stderr,
              flush=True)

    # zero-span rounds: re-interact frames whose neighbors are interacted
    s = sorted(order)
    zero_idxs = [i for i in s[1:-1] if (i - 1) in set(s) and (i + 1)
                 in set(s)][:4] or [s[1]]
    timed_rounds(zero_idxs, "round_ms_zero_span")

    # short-span rounds: ~1 frame each side
    one_gap = [lo + 1 for i, lo in enumerate(s[:-1])
               if s[i + 1] - lo == 3][:4]
    if one_gap:
        timed_rounds(one_gap, "round_ms_2frames")

    with open("/root/repo/experiments/r4_tail_probe.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()

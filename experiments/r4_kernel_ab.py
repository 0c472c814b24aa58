"""r4: window-synced end-to-end kernel A/B at production geometry.

All r3 kernel comparisons (r3_batch3 "defaults win every variant") were
timed with per-round ``block_until_ready`` on DONATED outputs — the exact
methodology the r4 sync probe showed can return before device execution
completes through the tunnel.  This re-runs the honest interactive session
with WINDOW-based timing (rounds chain through donated state, one 4-byte
fetch per window edge) for each kernel variant, one process per variant
(EVAVOS_* env snapshot at engine construction):

  EVAVOS_AB_LABEL=default                      python experiments/r4_kernel_ab.py
  EVAVOS_AB_LABEL=chunked EVAVOS_SEL_METHOD=chunked python ...
  EVAVOS_AB_LABEL=notau   EVAVOS_SEL_NOTAU=1   python ...

Appends one JSON line per run to experiments/r4_kernel_ab.jsonl.
"""

import json
import os
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

    cache_dir = os.environ.get("EVAVOS_JAX_CACHE", "/tmp/evavos_xla_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    label = os.environ.get("EVAVOS_AB_LABEL", "default")
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
    print(f"[ab:{label}] kernels={engine.config.kernels} "
          f"readout={engine.config.readout_strategy}",
          file=sys.stderr, flush=True)

    images, masks = synthetic_video(t, h, w, num_objects=1, seed=0)
    padded, pad = prepare_video(images, dtype=dtype)
    feats = engine.precompute_features(padded)
    masks_dev = pad_mask(masks.astype(np.float32), pad)
    jax.block_until_ready(masks_dev)

    rounds = 30
    order = [0, t - 1]
    while len(order) < rounds:
        s = sorted(order)
        gaps = [(s[i + 1] - s[i], s[i]) for i in range(len(s) - 1)]
        g, lo = max(gaps)
        if g <= 1:
            break
        order.append(lo + g // 2)

    state = engine.init_state(feats, 1)
    interacted = set()
    edges = {5, 10, 20, rounds}
    windows = []
    wstart, wframes, t0 = 1, 0, None
    comp0 = time.perf_counter()
    for r, idx in enumerate(order[:rounds]):
        fwd = min((i for i in interacted if i > idx), default=t)
        bwd = max((i for i in interacted if i < idx), default=-1)
        n_frames = max(0, fwd - idx - 1) + max(0, idx - bwd - 1)
        interacted.add(idx)
        if r == 0:
            state = engine.interact(state, feats, masks_dev[:, idx], idx,
                                    donate=True)
            jax.device_get(state.certain_count)
            print(f"[ab:{label}] round-0 (compile) "
                  f"{time.perf_counter() - comp0:.0f}s",
                  file=sys.stderr, flush=True)
            t0 = time.perf_counter()
            continue
        state = engine.interact(state, feats, masks_dev[:, idx], idx,
                                donate=True)
        wframes += n_frames
        if (r + 1) in edges or r == rounds - 1:
            jax.device_get(state.certain_count)
            now = time.perf_counter()
            windows.append((wstart, r + 1, wframes, round(now - t0, 4)))
            wstart, wframes, t0 = r + 1, 0, now

    def span(a, b):
        fr = sum(x[2] for x in windows if x[0] >= a and x[1] <= b)
        sec = sum(x[3] for x in windows if x[0] >= a and x[1] <= b)
        return fr, sec

    fr10, s10 = span(1, 10)
    fr_all, s_all = span(1, rounds)
    fr_late, s_late = span(10, rounds)
    out = {
        "label": label,
        "sel_method": os.environ.get("EVAVOS_SEL_METHOD", ""),
        "notau": bool(os.environ.get("EVAVOS_SEL_NOTAU")),
        "fps_rounds1_10": round(fr10 / s10, 2) if s10 else None,
        "fps_rounds10_30": round(fr_late / s_late, 2) if s_late else None,
        "fps_all": round(fr_all / s_all, 2) if s_all else None,
        "session_s": round(s_all, 2),
        "windows": windows,
    }
    with open("/root/repo/experiments/r4_kernel_ab.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

"""Profile rounds of the honest interactive session with jax.profiler and
aggregate device-op durations from the perfetto trace.

The earlier bisect attempts timed ISOLATED jitted stages, which over a
tunneled TPU inflates every number by per-dispatch latency (and produced
nonsense like a 0.001 ms readout).  The profiler traces the REAL fused
computation, so the per-op totals attribute the honest session's cost
without distorting it."""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/evavos_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from eva_vos_tpu.models import PropagationNetwork, FusionNet
from eva_vos_tpu.engine import InferenceEngine
from eva_vos_tpu.engine.propagation import EngineConfig, prepare_video, pad_mask
from eva_vos_tpu.data import synthetic_video


def run_session(engine, feats, masks, order, prof_dir=None):
    state = engine.init_state(feats, 1)
    times = []
    for r, idx in enumerate(order):
        m = pad_mask(masks[:, idx].astype(np.float32), engine._pad)
        start = time.perf_counter()
        if r == 2 and prof_dir:
            jax.profiler.start_trace(prof_dir)
        state = engine.interact(state, feats, m, idx, donate=True)
        jax.block_until_ready(state.prob)
        if r == 4 and prof_dir:
            jax.profiler.stop_trace()
        times.append(time.perf_counter() - start)
    return times


def main():
    t, h, w = 60, 480, 854
    dtype = jnp.bfloat16
    ph, pw = h + (-h) % 16, w + (-w) % 16
    stcn = PropagationNetwork(dtype=dtype)
    fusion = FusionNet(dtype=dtype)
    sp = stcn.init(jax.random.PRNGKey(0), jnp.zeros((ph, pw, 3), dtype),
                   jnp.zeros((1, ph, pw), dtype), method="init_all")
    fp = fusion.init(jax.random.PRNGKey(1), jnp.zeros((ph, pw, 3), dtype),
                     jnp.zeros((ph, pw), dtype), jnp.zeros((ph, pw), dtype),
                     jnp.zeros((ph, pw, 2), dtype), jnp.zeros((2,), dtype))
    engine = InferenceEngine(stcn, fusion, sp, fp,
                             EngineConfig(max_interactions=60,
                                          feature_chunk=2))
    images, masks = synthetic_video(t, h, w, 1, seed=0)
    padded, pad = prepare_video(images, dtype=dtype)
    engine._pad = pad
    feats = engine.precompute_features(padded)
    jax.block_until_ready(feats.k16)

    order = [0, t - 1] + list(range(2, t - 1, max(1, t // 8)))[:6]
    prof_dir = "/root/repo/experiments/r3_prof"
    times = run_session(engine, feats, masks, order, prof_dir=prof_dir)
    for r, dt in enumerate(times):
        print(f"round {r + 1}: {dt * 1000:.0f} ms", flush=True)

    # aggregate the perfetto trace: device-track complete events only
    traces = glob.glob(prof_dir + "/**/*.trace.json.gz", recursive=True)
    print("traces:", traces, flush=True)
    if not traces:
        return
    with gzip.open(sorted(traces)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find device process ids (TPU tracks)
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device" in name.lower():
                dev_pids.add(e["pid"])
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            dur = e.get("dur", 0) / 1e3  # us -> ms
            name = e.get("name", "?")
            agg[name] += dur
            cnt[name] += 1
            total += dur
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:45]
    print(f"\ndevice total: {total:.1f} ms over traced rounds")
    for name, ms in top:
        print(f"{ms:9.2f} ms  x{cnt[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()

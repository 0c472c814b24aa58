"""r5: attribute the T=120 late-session 48 ms/round (VERDICT r4 #5).

BENCH run3/run4: interactive_tail_ms_per_round_T120 = 48.0-48.4 while the
T=60 zero-propagation floor is 13.4 ms/round.  Tail rounds propagate 1-2
frames each, so ~35 ms buys ~1.5 frames — ~23 ms/frame vs the 5 ms/frame
blocked-step marginal.  This script reproduces the bench's T=120 session,
then times at tail fill (~bank 72+):

  a. zero-propagation interact (re-interact an already-closed frame)
  b. tail rounds as the bench runs them (1-2 frames, fusion active)
  c. the same rounds on a fusion=None engine (fusion + get_attention cost)
  d. isolated single-frame phases at tail fill: fused selection+readout,
     decode, encode_value

Window timing (donated chained state, one 4-byte fetch per window).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("EVAVOS_JAX_CACHE", "/root/repo/.jax_compile_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["EVAVOS_JAX_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import bench as bench_mod
from eva_vos_tpu.models import PropagationNetwork, FusionNet
from eva_vos_tpu.engine import InferenceEngine
from eva_vos_tpu.engine.propagation import EngineConfig, prepare_video, pad_mask
from eva_vos_tpu.data import synthetic_video

OUT = Path(__file__).with_suffix(".json")
res = {}


def farthest_point_order(t, rounds):
    order = [0, t - 1]
    while len(order) < rounds:
        s = sorted(order)
        gaps = [(s[i + 1] - s[i], s[i]) for i in range(len(s) - 1)]
        g, lo = max(gaps)
        if g <= 1:
            break
        order.append(lo + g // 2)
    return order[:rounds]


def run_session(engine, feats, masks_dev, order, sync_every=None):
    """Returns (state, per-window seconds list)."""
    state = engine.init_state(feats, 1)
    t0 = None
    for r, idx in enumerate(order):
        state = engine.interact(state, feats, masks_dev[:, idx], idx,
                                donate=True)
        if r == 0:
            jax.device_get(state.certain_count)
            t0 = time.perf_counter()
    jax.device_get(state.certain_count)
    return state, time.perf_counter() - t0


def timed_rounds(engine, feats, masks_dev, state, idxs, label):
    # warm (compile specializations already done by the session)
    t0 = time.perf_counter()
    for idx in idxs:
        state = engine.interact(state, feats, masks_dev[:, idx], idx,
                                donate=True)
    jax.device_get(state.certain_count)
    ms = (time.perf_counter() - t0) / max(1, len(idxs)) * 1e3
    res[label] = round(ms, 2)
    print(label, res[label], flush=True)
    return state


def main():
    t, h, w = 120, 480, 854
    dtype = jnp.bfloat16
    stcn = PropagationNetwork(key_arch="resnet50", value_arch="resnet18",
                              top_k=50, dtype=dtype)
    fusion = FusionNet(dtype=dtype)
    ph, pw = h + (-h) % 16, w + (-w) % 16
    # fitted weights if cached (any geometry key works for timing)
    import glob
    import pickle
    sp_host = None
    cands = sorted(glob.glob("/root/repo/.bench_cache/stcn_*.pkl"))
    if cands:
        with open(cands[0], "rb") as f:
            sp_host = pickle.load(f)
        sp = jax.tree.map(lambda x: jnp.asarray(x, dtype), sp_host)
        print(f"loaded fitted stcn {cands[0]}", flush=True)
    else:
        sp = stcn.init(jax.random.PRNGKey(0),
                       jnp.zeros((ph, pw, 3), dtype),
                       jnp.zeros((1, ph, pw), dtype), method="init_all")
    fcands = sorted(glob.glob("/root/repo/.bench_cache/fusion_*.pkl"))
    if fcands:
        with open(fcands[0], "rb") as f:
            fp_host = pickle.load(f)
        fp = jax.tree.map(lambda x: jnp.asarray(x, dtype), fp_host)
    else:
        fp = FusionNet(dtype=dtype).init(
            jax.random.PRNGKey(1), jnp.zeros((ph, pw, 3), dtype),
            jnp.zeros((ph, pw), dtype), jnp.zeros((ph, pw), dtype),
            jnp.zeros((ph, pw, 2), dtype), jnp.zeros((2,), dtype))

    cfg = EngineConfig(mem_freq=5, top_k=50, max_interactions=60,
                       feature_chunk=2)
    engine = InferenceEngine(stcn, fusion, sp, fp, cfg)
    print(f"readout: {engine.config.readout_strategy}", flush=True)

    images, masks = synthetic_video(t, h, w, num_objects=1, seed=1)
    padded, pad = prepare_video(images, dtype=dtype)
    feats = engine.precompute_features(padded)
    jax.block_until_ready(feats.k16)
    masks_dev = pad_mask(masks.astype(np.float32), pad)
    jax.block_until_ready(masks_dev)

    order = farthest_point_order(t, 40)
    t0 = time.perf_counter()
    state, sess_s = run_session(engine, feats, masks_dev, order)
    res["session_rounds"] = len(order) - 1
    res["session_s"] = round(sess_s, 2)
    cc = int(jax.device_get(state.certain_count))
    res["tail_bank_fill"] = cc
    print(f"session done {sess_s:.1f}s fill={cc}", flush=True)

    # a. zero-propagation: re-interact frames whose both neighbors are
    #    interacted (gap closed) — pure fixed cost
    interacted = sorted(order)
    closed = [i for i in interacted[1:-1]
              if (i - 1 in interacted or i - 1 < 0)
              and (i + 1 in interacted or i + 1 >= t)]
    if len(closed) >= 4:
        state = timed_rounds(engine, feats, masks_dev, state, closed[:4],
                             "zero_prop_ms_per_round")

    # b. tail rounds: continue the farthest-point order past 60
    order_ext = farthest_point_order(t, 90)[40:]
    tail_idxs = order_ext[:12]
    if tail_idxs:
        state = timed_rounds(engine, feats, masks_dev, state, tail_idxs,
                             "tail_ms_per_round_fused")
        # frames those rounds propagated
        s = set(order)
        fr = 0
        for idx in tail_idxs:
            fwd = min((i for i in s if i > idx), default=t)
            bwd = max((i for i in s if i < idx), default=-1)
            fr += max(0, fwd - idx - 1) + max(0, idx - bwd - 1)
            s.add(idx)
        res["tail_frames_per_round"] = round(fr / len(tail_idxs), 2)

    # c. (dropped: a fusion=None engine would recompile the full interact
    #    graph ~20 min through the tunnel; fusion share bounded analytically)

    # d. isolated phases at tail fill
    bank_k, bank_v, front = state.bank_k, state.bank_v, state.certain_count
    seg = jax.jit(lambda ti: engine._segment_frame(
        feats, bank_k, bank_v, front, ti))
    ti = jnp.asarray(order_ext[12] if len(order_ext) > 12 else 60, jnp.int32)
    out = seg(ti)
    jax.block_until_ready(out)
    jax.device_get(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    for _ in range(10):
        out = seg(ti)
    jax.device_get(jnp.ravel(out)[0])
    res["single_frame_seg_decode_ms"] = round(
        (time.perf_counter() - t0) / 10 * 1e3, 2)
    print("single_frame_seg_decode_ms", res["single_frame_seg_decode_ms"],
          flush=True)

    ev = jax.jit(lambda ti, m: engine._encode_value(feats, ti, m))
    m1 = jnp.asarray(np.asarray(masks_dev[:, 60]), dtype)
    out = ev(ti, m1)
    jax.block_until_ready(out)
    jax.device_get(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    for _ in range(10):
        out = ev(ti, m1)
    jax.device_get(jnp.ravel(out)[0])
    res["encode_value_ms"] = round((time.perf_counter() - t0) / 10 * 1e3, 2)
    print("encode_value_ms", res["encode_value_ms"], flush=True)


    # e. tunnel dispatch overhead: N chained trivial dispatches + 1 fetch.
    #    Bounds the per-interact host->terminal cost that no device-side
    #    optimization can remove.
    tiny = jnp.zeros((8,), jnp.float32)
    triv = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(triv(tiny))
    x = tiny
    t0 = time.perf_counter()
    for _ in range(32):
        x = triv(x)
    jax.device_get(x[0])
    res["dispatch_overhead_ms_per_call"] = round(
        (time.perf_counter() - t0) / 32 * 1e3, 2)
    print("dispatch_overhead_ms_per_call",
          res["dispatch_overhead_ms_per_call"], flush=True)

    OUT.write_text(json.dumps(res, indent=1))
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

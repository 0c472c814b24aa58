"""Round-3 batch 2: validate + time the chunked kernels and the donated
interactive path on the real chip, in ONE process (the axon tunnel makes
per-process compiles expensive; results flush incrementally).

Parts (each skippable via argv):
  kernels     — selection tournament-vs-chunked + readout old-vs-chunked at
                blocked B=5 geometry across bank fills, exactness asserted
                against the XLA oracle
  bisect      — real-engine stage attribution (segment / fusion /
                encode_value / full interact / zero-propagation interact,
                donated and not)
  interactive — the 10-round donated annotation-session bench (honest
                propagated frames/sec)

Usage: python experiments/r3_batch2.py [kernels] [bisect] [interactive]
Writes experiments/r3_batch2.json (merged incrementally).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

# persistent compile cache: the axon tunnel's remote-compile helper
# intermittently drops the pipe on big 480p programs; caching successful
# compiles makes a retry of the script resume instead of recompiling
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/evavos_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

OUT = Path(__file__).parent / "r3_batch2.json"


def save(key, value):
    data = {}
    if OUT.exists():
        data = json.loads(OUT.read_text())
    data[key] = value
    OUT.write_text(json.dumps(data, indent=2))
    print(f"[saved] {key}: {json.dumps(value)[:200]}", flush=True)


def timed(fn, *args, iters=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


HW = 1620                      # 480p/16 key tokens per frame
CK, CV, TOP_K = 64, 512, 50
MMAX = 78                      # 72-slot production bank, padded
B = 5                          # blocked frames per segmentation call


def make_bank(kind, rng):
    """Clustered = per-slot centroid + noise (temporal structure like a
    real bank); random = iid."""
    if kind == "clustered":
        cents = rng.standard_normal((MMAX, CK))
        mk = (np.repeat(cents, HW, axis=0)
              + 0.7 * rng.standard_normal((MMAX * HW, CK)))
        qk = (np.tile(cents[3], (B * HW, 1))
              + 0.7 * rng.standard_normal((B * HW, CK)))
    else:
        mk = rng.standard_normal((MMAX * HW, CK))
        qk = rng.standard_normal((B * HW, CK))
    mv = rng.standard_normal((1, MMAX * HW, CV))
    return (jnp.asarray(mk, jnp.bfloat16), jnp.asarray(qk, jnp.bfloat16),
            jnp.asarray(mv, jnp.bfloat16))


def part_kernels():
    import os

    from eva_vos_tpu.kernels.memory_topk import pallas_memory_topk
    from eva_vos_tpu.kernels.memory_readout import pallas_fused_readout
    from eva_vos_tpu.ops.memory_attention import memory_affinity_topk

    rng = np.random.default_rng(0)
    for kind in ("clustered", "random"):
        mk, qk, mv = make_bank(kind, rng)
        res = {}
        for fill in (7, 13, 30, 50, 72):
            valid = jnp.asarray(fill * HW, jnp.int32)
            row = {}

            def sel_tour(q, v):
                return pallas_memory_topk(mk, q, TOP_K, v, block_q=512,
                                          block_m=1024, method="tournament")

            def sel_chunk(q, v):
                return pallas_memory_topk(mk, q, TOP_K, v, block_q=512,
                                          block_m=1024, method="chunked")

            # exactness of chunked vs oracle at this fill.  On bf16 inputs
            # the oracle's HIGHEST-precision dot can perturb near-ties vs
            # the kernel's native bf16 MXU dot, so also record the sorted
            # weight-multiset agreement (the robust check).
            rw, ri = memory_affinity_topk(mk, qk, TOP_K, fill * HW)
            w, i = sel_chunk(qk, valid)
            row["chunked_idx_exact"] = bool(
                (np.asarray(i) == np.asarray(ri)).all())
            row["chunked_w_multiset_close"] = bool(np.allclose(
                np.sort(np.asarray(w, np.float32), axis=-1),
                np.sort(np.asarray(rw, np.float32), axis=-1),
                rtol=1e-3, atol=1e-4))

            row["sel_tour_ms"] = round(timed(sel_tour, qk, valid) * 1e3, 3)
            row["sel_chunk_ms"] = round(timed(sel_chunk, qk, valid) * 1e3, 3)

            def fused(q, v):
                return pallas_fused_readout(mk, q, mv, TOP_K, v)

            row["fused_chunk_ms"] = round(timed(fused, qk, valid) * 1e3, 3)
            os.environ["EVAVOS_READOUT_METHOD"] = "grid"
            os.environ["EVAVOS_SEL_METHOD"] = "tournament"

            def fused_old(q, v):
                return pallas_fused_readout(mk, q, mv, TOP_K, v,
                                            sel_block_q=512, sel_block_m=1024)

            row["fused_old_ms"] = round(timed(fused_old, qk, valid) * 1e3, 3)
            del os.environ["EVAVOS_READOUT_METHOD"]
            del os.environ["EVAVOS_SEL_METHOD"]

            res[f"fill_{fill}"] = row
            save(f"kernels_{kind}", res)


def build_engine(no_fusion=False):
    from eva_vos_tpu.models import PropagationNetwork, FusionNet
    from eva_vos_tpu.engine import InferenceEngine
    from eva_vos_tpu.engine.propagation import EngineConfig

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
    engine = InferenceEngine(
        stcn, None if no_fusion else fusion, sp, fp,
        EngineConfig(max_interactions=60, feature_chunk=2))
    return engine, (t, h, w)


def part_bisect():
    from eva_vos_tpu.engine.propagation import prepare_video, pad_mask
    from eva_vos_tpu.data import synthetic_video
    from eva_vos_tpu.ops import aggregate_wbg

    engine, (t, h, w) = build_engine()
    print(f"readout: {engine.config.readout_strategy}", flush=True)
    dtype = jnp.bfloat16
    images, masks = synthetic_video(t, h, w, 1, seed=0)
    padded, pad = prepare_video(images, dtype=dtype)
    feats = engine.precompute_features(padded)
    jax.block_until_ready(feats.k16)
    state = engine.init_state(feats, 1)
    for idx in (0, t - 1, 20):
        m = pad_mask(masks[:, idx].astype(np.float32), pad)
        state = engine.interact(state, feats, m, idx)
    jax.block_until_ready(state.prob)
    res = {}

    tis = jnp.asarray([31, 32, 33, 34, 35], jnp.int32)
    front = jnp.asarray(13, jnp.int32)
    # NOTE: feats MUST be a jit argument, not a closure — closed-over
    # device arrays are inlined as MLIR constants and the ~200 MB payload
    # overflows the remote-compile helper's request limit (HTTP 413)
    seg = jax.jit(lambda fts, bk, bv, fr, ti: engine._segment_frames_batched(
        fts, bk, bv, fr, ti))
    res["segment_b5_fill13_ms"] = round(
        timed(seg, feats, state.bank_k, state.bank_v, front, tis) * 1e3, 2)
    save("bisect", res)

    out5 = seg(feats, state.bank_k, state.bank_v, front, tis)
    agg = jax.jit(lambda o: jax.vmap(
        lambda p: aggregate_wbg(p.astype(jnp.float32), keep_bg=True))(o))
    res["aggregate_b5_ms"] = round(timed(agg, out5) * 1e3, 2)
    save("bisect", res)

    h16, w16 = feats.f16_thin.shape[1:3]
    prob5 = agg(out5)
    key_k16 = feats.k16[0].reshape(h16, w16, -1)
    ph, pw = padded.shape[1:3]
    posd = jnp.ones((1, ph, pw), jnp.float32) * 0.1
    negd = jnp.ones((1, ph, pw), jnp.float32) * 0.1
    prev5 = jnp.moveaxis(state.prob[:, tis], 1, 0)
    fuse = jax.jit(lambda fts, prev, curr, kk, pd, nd, ti:
                   engine._fuse_frames_batched(
                       fts, prev, curr, kk, pd, nd,
                       jnp.asarray(40, jnp.int32), jnp.asarray(20, jnp.int32),
                       ti))
    res["fusion_b5_ms"] = round(
        timed(fuse, feats, prev5, prob5, key_k16, posd, negd, tis) * 1e3, 2)
    save("bisect", res)

    # fusion execution modes: packed s=2 (production) vs phase-GEMM vs x4
    for mode in ("gemm", "x4"):
        eng2 = object.__new__(type(engine))
        eng2.__dict__ = dict(engine.__dict__)
        eng2.config = engine.config._replace(fusion_packed=mode)
        fuse2 = jax.jit(lambda fts, prev, curr, kk, pd, nd, ti:
                        eng2._fuse_frames_batched(
                            fts, prev, curr, kk, pd, nd,
                            jnp.asarray(40, jnp.int32),
                            jnp.asarray(20, jnp.int32), ti))
        try:
            res[f"fusion_b5_{mode}_ms"] = round(
                timed(fuse2, feats, prev5, prob5, key_k16, posd, negd,
                      tis) * 1e3, 2)
        except Exception as e:
            res[f"fusion_b5_{mode}_ms"] = f"{type(e).__name__}: {e}"[:120]
        save("bisect", res)

    ev = jax.jit(lambda fts, m: engine._encode_value(
        fts, jnp.asarray(31), m))
    res["encode_value_ms"] = round(
        timed(ev, feats, prob5[0, 1:].astype(dtype)) * 1e3, 2)
    save("bisect", res)

    m = pad_mask(masks[:, 40].astype(np.float32), pad)
    t_int = timed(lambda: engine.interact(state, feats, m, 40), iters=5)
    n_frames = (59 - 40 - 1) + (40 - 20 - 1)
    res["interact_38f_ms"] = round(t_int * 1e3, 1)
    res["interact_ms_per_frame"] = round(t_int / n_frames * 1e3, 2)
    save("bisect", res)

    # fixed per-round cost: a zero-propagation interact
    m2 = pad_mask(masks[:, 2].astype(np.float32), pad)
    state2 = engine.interact(state, feats, m2, 2)
    jax.block_until_ready(state2.prob)
    m1 = pad_mask(masks[:, 1].astype(np.float32), pad)
    res["interact_zero_ms"] = round(
        timed(lambda: engine.interact(state2, feats, m1, 1), iters=10) * 1e3,
        1)
    save("bisect", res)

    # donated zero-propagation round (chained donations)
    cc2 = int(state2.certain_count)
    inter2 = np.asarray(state2.interacted)
    st = engine.interact(state2, feats, m1, 1, donate=False)
    jax.block_until_ready(st.prob)
    st = engine.interact(st._replace(
        certain_count=jnp.asarray(cc2, jnp.int32),
        interacted=jnp.asarray(inter2)), feats, m1, 1, donate=True)
    jax.block_until_ready(st.prob)
    t0 = time.perf_counter()
    for _ in range(10):
        st = engine.interact(st._replace(
            certain_count=jnp.asarray(cc2, jnp.int32),
            interacted=jnp.asarray(inter2)), feats, m1, 1, donate=True)
    jax.block_until_ready(st.prob)
    res["interact_zero_donated_ms"] = round(
        (time.perf_counter() - t0) / 10 * 1e3, 1)
    save("bisect", res)


def part_interactive(no_fusion=False):
    from eva_vos_tpu.engine.propagation import prepare_video, pad_mask
    from eva_vos_tpu.data import synthetic_video

    engine, (t, h, w) = build_engine(no_fusion=no_fusion)
    print(f"readout: {engine.config.readout_strategy}", flush=True)
    dtype = jnp.bfloat16
    images, masks = synthetic_video(t, h, w, 1, seed=0)
    padded, pad = prepare_video(images, dtype=dtype)
    feats = engine.precompute_features(padded)
    jax.block_until_ready(feats.k16)
    state = engine.init_state(feats, 1)

    # device-resident annotation masks: slicing on device replaces the
    # per-round 1.6 MB host->device mask upload (over a tunneled TPU that
    # upload is a visible slice of the fixed per-round cost; in the real
    # loop SAM produces masks on device anyway)
    masks_dev = pad_mask(masks.astype(np.float32), pad)   # [K, T, nh, nw]
    jax.block_until_ready(masks_dev)

    # session 1: the 10-round headline protocol (matches bench.py), then
    # session 2 continues to 30 rounds on a fresh state — same compiled
    # program, deeper bank fills — to expose the late-regime steady state.
    for rounds, tag in ((10, ""), (30, "_r30")):
        state = engine.init_state(feats, 1)
        order = ([0, t - 1]
                 + list(range(2, t - 1, max(1, t // rounds)))[:rounds - 2])
        total_frames = 0
        t0 = None
        interacted = set()
        per_round = []
        tail_frames = tail_time = 0.0
        for r, idx in enumerate(order[:rounds]):
            fwd = min((i for i in interacted if i > idx), default=t)
            bwd = max((i for i in interacted if i < idx), default=-1)
            n_frames = max(0, fwd - idx - 1) + max(0, idx - bwd - 1)
            interacted.add(idx)
            m = masks_dev[:, idx]
            start = time.perf_counter()
            state = engine.interact(state, feats, m, idx, donate=True)
            jax.block_until_ready(state.prob)
            dt = time.perf_counter() - start
            if r == 0:
                print(f"round 1 (compile): {dt:.1f}s", flush=True)
                t0 = time.perf_counter()
            else:
                total_frames += n_frames
                per_round.append([n_frames, round(dt * 1e3)])
                if r >= rounds // 2:
                    tail_frames += n_frames
                    tail_time += dt
                print(f"round {r + 1}: {n_frames} frames, {dt * 1e3:.0f} ms",
                      flush=True)
        elapsed = time.perf_counter() - t0
        key = ("interactive_nofusion" if no_fusion else "interactive") + tag
        save(key, {
            "fps_honest": round(total_frames / elapsed, 1),
            "rounds_per_sec": round((rounds - 1) / elapsed, 2),
            "tail_fps_honest": round(tail_frames / tail_time, 1)
            if tail_time else None,
            "per_round_frames_ms": per_round,
        })


if __name__ == "__main__":
    parts = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "kernels", "bisect", "interactive"]
    for p in parts:
        print(f"=== {p} ===", flush=True)
        if p == "kernels":
            part_kernels()
        elif p == "bisect":
            part_bisect()
        elif p == "interactive":
            part_interactive()
        elif p == "interactive_nofusion":
            part_interactive(no_fusion=True)

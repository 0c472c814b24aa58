"""Re-tune the attention kernels on REAL banks + bisect the segment glue.

r3_realbank showed real banks are fully spread (live_pair_frac = 1.0):
no block is skippable, so the earlier parameter sweeps (run on synthetic
clustered/random draws) may have tuned for the wrong regime.  This script:

  banks   — one engine session; saves bank snapshots to /tmp/realbank_*.npz
            so the sweeps below never pay the engine compile again
  sweep   — selection tile geometry x tournament params and readout
            block_m on the saved real banks
  glue    — bisect _segment_frames_batched: readout alone, + reshape,
            + decode; finds the ~7.5 ms/block gap vs sum-of-parts

Usage: python experiments/r3_realtune.py [banks] [sweep] [glue]
Writes experiments/r3_realtune.json incrementally.
"""

import functools
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/evavos_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

OUT = Path(__file__).parent / "r3_realtune.json"
BANKS = "/tmp/realbank_{}.npz"
FILLS = (8, 15, 29)


def save(key, value):
    data = json.loads(OUT.read_text()) if OUT.exists() else {}
    data[key] = value
    OUT.write_text(json.dumps(data, indent=2))
    print(f"[saved] {key}: {json.dumps(value)[:160]}", flush=True)


def timed(fn, *args, iters=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def timed_chain(fn, qk, valid, iters=20):
    """Chained timing: each iteration's query input carries a zero-valued
    data dependency on the previous iteration's output, so executions
    serialize on-device.  The tunneled TPU reports impossible times for
    unchained same-input loops (0.03 ms for multi-ms kernels — its
    completion signaling batches); the chain forces honest latencies."""
    out = fn(qk, valid)
    jax.block_until_ready(out)

    def dep(o):
        leaf = o[0] if isinstance(o, tuple) else o
        return (leaf.reshape(-1)[0] * 0).astype(qk.dtype)

    t0 = time.perf_counter()
    q = qk
    for _ in range(iters):
        out = fn(q, valid)
        q = qk + dep(out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def build_engine():
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
    engine = InferenceEngine(stcn, fusion, sp, fp,
                             EngineConfig(max_interactions=60,
                                          feature_chunk=2))
    return engine, (t, h, w)


def session_feats(engine, t, h, w):
    from eva_vos_tpu.engine.propagation import prepare_video
    from eva_vos_tpu.data import synthetic_video

    images, masks = synthetic_video(t, h, w, 1, seed=0)
    padded, pad = prepare_video(images, dtype=jnp.bfloat16)
    feats = engine.precompute_features(padded)
    jax.block_until_ready(feats.k16)
    return feats, masks, pad


def part_banks():
    from eva_vos_tpu.engine.propagation import pad_mask

    engine, (t, h, w) = build_engine()
    feats, masks, pad = session_feats(engine, t, h, w)
    state = engine.init_state(feats, 1)
    order = [0, t - 1] + list(range(2, t - 1, 2))
    for r, idx in enumerate(order):
        m = pad_mask(masks[:, idx].astype(np.float32), pad)
        state = engine.interact(state, feats, m, idx)
        if r + 1 in FILLS:
            np.savez(BANKS.format(r + 1),
                     bank_k=np.asarray(state.bank_k),
                     bank_v=np.asarray(state.bank_v),
                     cc=int(state.certain_count))
            print(f"saved bank at {r + 1} rounds", flush=True)
    # query set: 5 consecutive frames mid-video (the blocked geometry)
    qk = np.asarray(feats.k16[25:30]).reshape(5 * feats.k16.shape[1], -1)
    np.savez("/tmp/realbank_qk.npz", qk=qk)
    save("banks", {"fills": list(FILLS), "hw": int(feats.k16.shape[1])})


def load_bank(nrounds):
    import ml_dtypes

    d = np.load(BANKS.format(nrounds))
    # np.savez stores bf16 as raw void ("|V2"); view restores the dtype
    bank_k, bank_v, cc = d["bank_k"], d["bank_v"], int(d["cc"])
    if bank_k.dtype.kind == "V":
        bank_k = bank_k.view(ml_dtypes.bfloat16)
        bank_v = bank_v.view(ml_dtypes.bfloat16)
    mmax, hw, ck = bank_k.shape
    cv = bank_v.shape[-1]
    mk = jnp.asarray(bank_k.reshape(mmax * hw, ck))
    mv = jnp.asarray(bank_v.reshape(1, mmax * hw, cv))
    qk_np = np.load("/tmp/realbank_qk.npz")["qk"]
    if qk_np.dtype.kind == "V":
        qk_np = qk_np.view(ml_dtypes.bfloat16)
    qk = jnp.asarray(qk_np)
    return mk, mv, qk, jnp.asarray(cc * hw, jnp.int32)


def part_sweep():
    """Config OUTER, fills inner, jax.clear_caches() between configs: the
    tournament env knobs are read at trace time inside a jitted function,
    so without a cache clear every config after the first would silently
    re-measure the first config's kernel.  All timings use timed_chain
    (the unchained loop reports impossible times on the tunneled TPU)."""
    from eva_vos_tpu.kernels.memory_topk import pallas_memory_topk
    from eva_vos_tpu.kernels.memory_readout import pallas_fused_readout

    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    top_k = 50
    banks = {n: load_bank(n) for n in FILLS}
    res = {n: {} for n in FILLS}

    def run_sel(key, method, bq, bm, rounds=None, group=None):
        if rounds:
            os.environ["EVAVOS_TOUR_ROUNDS"] = str(rounds)
        else:
            os.environ.pop("EVAVOS_TOUR_ROUNDS", None)
        if group:
            os.environ["EVAVOS_TOUR_GROUP"] = str(group)
        else:
            os.environ.pop("EVAVOS_TOUR_GROUP", None)
        jax.clear_caches()
        for nrounds in FILLS:
            mk, mv, qk, valid = banks[nrounds]

            def sel(q, v):
                return pallas_memory_topk(mk, q, top_k, v, block_q=bq,
                                          block_m=bm, method=method)
            try:
                res[nrounds][key] = round(
                    timed_chain(sel, qk, valid, iters=10) * 1e3, 3)
            except Exception as e:
                res[nrounds][key] = f"{type(e).__name__}: {e}"[:60]
            save(f"sweep_{nrounds}", res[nrounds])

    # anchor: the unchained harness on the default config, to quantify the
    # measurement artifact against r3_batch2's numbers
    jax.clear_caches()
    for nrounds in FILLS:
        mk, mv, qk, valid = banks[nrounds]

        def sel(q, v):
            return pallas_memory_topk(mk, q, top_k, v, block_q=512,
                                      block_m=1024, method="tournament")
        res[nrounds]["anchor_unchained_r6"] = round(
            timed(sel, qk, valid, iters=10) * 1e3, 3)
        save(f"sweep_{nrounds}", res[nrounds])

    run_sel("sel_t_r6_gdef", "tournament", 512, 1024)  # production default
    run_sel("sel_t_r4_gdef", "tournament", 512, 1024, rounds=4)
    run_sel("sel_t_r8_gdef", "tournament", 512, 1024, rounds=8)
    run_sel("sel_t_r6_g64", "tournament", 512, 1024, rounds=6, group=64)
    run_sel("sel_t_r6_g256", "tournament", 512, 1024, rounds=6, group=256)
    run_sel("sel_t_q256", "tournament", 256, 1024)
    run_sel("sel_grid", "grid", 512, 1024)
    run_sel("sel_chunked", "chunked", 512, 1024)
    # resident: ONE extraction over the candidate scratch — the design
    # that removes the per-block serial extraction; g*rounds must cover
    # pad_k=56 (an escalated block writes its exact top-pad_k into its
    # candidate slice)
    run_sel("res_g128_r8", "resident", 512, 1024, rounds=8, group=128)
    run_sel("res_g64_r4", "resident", 512, 1024, rounds=4, group=64)
    run_sel("res_g32_r2", "resident", 512, 1024, rounds=2, group=32)
    run_sel("res_g64_r8", "resident", 512, 1024, rounds=8, group=64)

    os.environ.pop("EVAVOS_TOUR_ROUNDS", None)
    os.environ.pop("EVAVOS_TOUR_GROUP", None)
    jax.clear_caches()

    # fused readout: new sorted-slot kernel (default), no-skip ablation,
    # chunked variant, and block granularity
    def run_fused(key, rbm=None, env=None):
        if env:
            os.environ[env] = "1"
        jax.clear_caches()
        for nrounds in FILLS:
            mk, mv, qk, valid = banks[nrounds]

            def fused(q, v):
                kw = {"readout_block_m": rbm} if rbm else {}
                return pallas_fused_readout(mk, q, mv, top_k, v, **kw)
            try:
                res[nrounds][key] = round(
                    timed_chain(fused, qk, valid, iters=10) * 1e3, 3)
            except Exception as e:
                res[nrounds][key] = f"{type(e).__name__}: {e}"[:60]
            save(f"sweep_{nrounds}", res[nrounds])
        if env:
            os.environ.pop(env, None)

    run_fused("fused_sorted_default")
    run_fused("fused_noskip", env="EVAVOS_READOUT_NOSKIP")
    run_fused("fused_rbm2048", rbm=2048)
    run_fused("fused_rbm1024", rbm=1024)
    os.environ["EVAVOS_READOUT_METHOD"] = "chunked"
    run_fused("fused_chunked_ro")
    os.environ.pop("EVAVOS_READOUT_METHOD", None)


def part_glue():
    from eva_vos_tpu.engine.propagation import pad_mask

    engine, (t, h, w) = build_engine()
    feats, masks, pad = session_feats(engine, t, h, w)
    state = engine.init_state(feats, 1)
    for idx in (0, t - 1, 20):
        m = pad_mask(masks[:, idx].astype(np.float32), pad)
        state = engine.interact(state, feats, m, idx)
    jax.block_until_ready(state.prob)

    tis = jnp.asarray([31, 32, 33, 34, 35], jnp.int32)
    front = jnp.asarray(13, jnp.int32)
    hw = feats.k16.shape[1]
    cfg = engine.config
    res = {}

    # stage 1: readout only (as the engine calls it, incl. gathers/reshape)
    def ro_only(fts, bk, bv, fr, ti):
        mmax, hw_, ck = bk.shape
        cv = bv.shape[-1]
        q = fts.k16[ti].reshape(ti.shape[0] * hw_, ck)
        return engine._readout(bk.reshape(mmax * hw_, ck), q,
                               bv.reshape(bv.shape[0], mmax * hw_, cv),
                               min(cfg.top_k, mmax * hw_), fr * hw_)

    f1 = jax.jit(ro_only)
    res["readout_asengine_ms"] = round(
        timed(f1, feats, state.bank_k, state.bank_v, front, tis) * 1e3, 2)
    save("glue", res)

    # stage 2: + reshape/transpose to decoder layout
    def ro_reshape(fts, bk, bv, fr, ti):
        out = ro_only(fts, bk, bv, fr, ti)
        h16, w16 = fts.f16_thin.shape[1:3]
        return out.reshape(out.shape[0], ti.shape[0], h16, w16,
                           out.shape[-1]).transpose(1, 0, 2, 3, 4)

    f2 = jax.jit(ro_reshape)
    res["readout_reshape_ms"] = round(
        timed(f2, feats, state.bank_k, state.bank_v, front, tis) * 1e3, 2)
    save("glue", res)

    # stage 3: decode only, from a precomputed readout
    ro = f2(feats, state.bank_k, state.bank_v, front, tis)
    ro = jax.block_until_ready(ro)

    def dec_only(fts, ro_, ti):
        def decode_one(r, thin, f8, f4):
            return engine.stcn.apply(engine.stcn_params, r, thin, f8, f4,
                                     skips_precomputed=True,
                                     method="decode_with_readout")
        return jax.vmap(decode_one)(ro_, fts.f16_thin[ti], fts.f8[ti],
                                    fts.f4[ti])

    f3 = jax.jit(dec_only)
    res["decode_only_ms"] = round(timed(f3, feats, ro, tis) * 1e3, 2)
    save("glue", res)

    # full segment (the engine's own path)
    f4_ = jax.jit(lambda fts, bk, bv, fr, ti:
                  engine._segment_frames_batched(fts, bk, bv, fr, ti))
    res["segment_full_ms"] = round(
        timed(f4_, feats, state.bank_k, state.bank_v, front, tis) * 1e3, 2)
    save("glue", res)

    # fusion stages: attention alone vs full fuse
    h16, w16 = feats.f16_thin.shape[1:3]
    key_k16 = feats.k16[0].reshape(h16, w16, -1)
    ph, pw = feats.images.shape[1:3]
    posd = jnp.ones((1, ph, pw), jnp.float32) * 0.1
    negd = jnp.ones((1, ph, pw), jnp.float32) * 0.1

    def attn_only(fts, kk, pd, nd, ti):
        def one(t_):
            return engine.stcn.apply(engine.stcn_params, kk, pd, nd,
                                     fts.k16[t_].reshape(h16, w16, -1),
                                     method="get_attention")
        return jax.vmap(one)(ti)

    f5 = jax.jit(attn_only)
    res["fuse_attn_only_ms"] = round(
        timed(f5, feats, key_k16, posd, negd, tis) * 1e3, 2)
    save("glue", res)

    prob5 = jax.vmap(lambda p: p)(jnp.moveaxis(state.prob[:, tis], 1, 0))
    fuse_full = jax.jit(lambda fts, prev, curr, kk, pd, nd, ti:
                        engine._fuse_frames_batched(
                            fts, prev, curr, kk, pd, nd,
                            jnp.asarray(40, jnp.int32),
                            jnp.asarray(20, jnp.int32), ti))
    res["fuse_full_ms"] = round(
        timed(fuse_full, feats, prob5, prob5, key_k16, posd, negd,
              tis) * 1e3, 2)
    save("glue", res)


if __name__ == "__main__":
    parts = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "banks", "sweep", "glue"]
    for p in parts:
        print(f"=== {p} ===", flush=True)
        {"banks": part_banks, "sweep": part_sweep, "glue": part_glue}[p]()

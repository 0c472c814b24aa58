"""Round-2 TPU experiment: selection variants + fused gated readout.

Times the memory-readout strategies at the headline-bench geometry
(N=8100 blocked queries, M=16200-token bank, CK=64, CV=512, bf16) and the
interactive geometry (72-slot bank).  Chained fori_loop with a real data
dependency between iterations — single-op microbenchmarks on the axon
tunnel report impossible times (see .claude/skills/verify/SKILL.md).

Run on TPU:  python experiments/r2_kernel_bench.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from eva_vos_tpu.ops import memory_readout
from eva_vos_tpu.kernels import (pallas_supported, fused_readout_supported,
                                 pallas_memory_topk, pallas_fused_readout)


def timed_loop(fn, qk0, iters=30):
    """fn(qk) -> [K, N, CV]; chain: next qk depends on previous output."""

    def body(_, qk):
        out = fn(qk)  # [K, N, CV]
        # real data dependency (a 0.0-weighted term would be DCE'd away):
        # tiny perturbation, negligible drift over the loop
        delta = jnp.mean(out, axis=(0, 2))[:, None].astype(jnp.float32)
        return (qk.astype(jnp.float32) + 1e-6 * delta).astype(qk.dtype)

    run = jax.jit(lambda qk: jax.lax.fori_loop(0, iters, body, qk))
    out = run(qk0)
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    out = run(qk0)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return dt / iters


def bench_geometry(name, m_tokens, n_queries, valid, top_k=50, ck=64,
                   cv=512, dtype=jnp.bfloat16, k_obj=1):
    rng = np.random.default_rng(0)
    mk = jnp.asarray(rng.standard_normal((m_tokens, ck)), dtype)
    qk0 = jnp.asarray(rng.standard_normal((n_queries, ck)), dtype)
    mv = jnp.asarray(rng.standard_normal((k_obj, m_tokens, cv)), dtype)

    timings = {}
    variants = {}

    if pallas_supported():
        def sel(method, bq, bm):
            def fn(qk):
                w, _ = pallas_memory_topk(mk, qk, top_k, valid, block_q=bq,
                                          block_m=bm, method=method)
                return w[None]
            return fn

        variants["sel_grid_4096"] = sel("grid", 256, 4096)
        variants["sel_tour_q128_m4096"] = sel("tournament", 128, 4096)
        variants["sel_tour_q128_m2048"] = sel("tournament", 128, 2048)
        variants["sel_tour_q256_m2048"] = sel("tournament", 256, 2048)

        def fused(bq, bm):
            def fn(qk):
                return pallas_fused_readout(mk, qk, mv, top_k, valid,
                                            block_q=bq, block_m=bm)
            return fn

        variants["fused_q128_m4096"] = fused(128, 4096)
        variants["fused_q128_m2048"] = fused(128, 2048)

    def strat(s):
        def fn(qk):
            return memory_readout(mk, qk, mv, top_k=top_k, valid_tokens=valid,
                                  strategy=s)
        return fn

    variants["pallas_gather"] = strat("pallas")
    if m_tokens <= 40000:
        variants["xla_gather"] = strat("gather")

    for vname, fn in variants.items():
        try:
            ms = timed_loop(fn, qk0) * 1e3
            timings[vname] = round(ms, 3)
            print(f"[{name}] {vname:22s}: {ms:8.3f} ms/call", flush=True)
        except Exception as e:
            timings[vname] = f"ERROR: {type(e).__name__}"
            print(f"[{name}] {vname:22s}: ERROR {e}", flush=True)

    # correctness cross-check on TPU at this geometry
    try:
        ref = np.asarray(memory_readout(mk, qk0, mv, top_k=top_k,
                                        valid_tokens=valid,
                                        strategy="gather"), np.float32)
        for vname, fn in [("pallas_fused_tour",
                           lambda q: pallas_fused_readout(
                               mk, q, mv, top_k, valid, block_q=128,
                               block_m=4096))]:
            got = np.asarray(fn(qk0), np.float32)
            ok = np.allclose(got, ref, rtol=2e-2, atol=2e-2)
            print(f"[{name}] {vname} vs gather: "
                  f"max|d|={np.abs(got - ref).max():.5f} ok={ok}", flush=True)
            timings[f"{vname}_ok"] = bool(ok)
        w_ref, i_ref = pallas_memory_topk(mk, qk0, top_k, valid,
                                          block_q=256, block_m=4096,
                                          method="grid")
        w_t, i_t = pallas_memory_topk(mk, qk0, top_k, valid, block_q=128,
                                      block_m=4096, method="tournament")
        sel_ok = bool((np.asarray(i_t) == np.asarray(i_ref)).all())
        print(f"[{name}] tournament idx == grid idx: {sel_ok}", flush=True)
        timings["tournament_idx_ok"] = sel_ok
    except Exception as e:
        print(f"[{name}] correctness check ERROR {e}", flush=True)
    return timings


def main():
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          flush=True)
    print(f"pallas_supported: {pallas_supported()}", flush=True)
    print(f"fused_readout_supported: {fused_readout_supported()}", flush=True)

    out = {}
    # headline bench: 10-slot bank, 7 live, blocked 5-frame queries
    out["headline"] = bench_geometry("headline", m_tokens=10 * 1620,
                                     n_queries=5 * 1620, valid=7 * 1620)
    # single-frame (sequential engine / entry probe)
    out["single"] = bench_geometry("single", m_tokens=10 * 1620,
                                   n_queries=1620, valid=7 * 1620)
    # interactive: 72-slot certain bank, fully live
    out["interactive"] = bench_geometry("interactive", m_tokens=78 * 1620,
                                        n_queries=1620, valid=72 * 1620)
    with open("experiments/r2_kernel_bench.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

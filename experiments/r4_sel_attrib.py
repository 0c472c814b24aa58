"""r4: selection-kernel component attribution at production geometry.

VERDICT r3 #4 asks for selection <= 8 ms at fill-72 real banks (r3 measured
14.5 ms at fill 13, ~42% of a blocked step).  Before building a new kernel,
attribute the cost (the r3 lesson: measure first — two speculative designs
regressed on-chip).  Variants, all timed with chained calls (each call's
qk depends on the previous call's output, so the device serializes) and
ONE 4-byte fetch per window (honest under the axon tunnel sync semantics,
see r4_sync_probe):

  full       production tournament_topk_t (fp32 scores, R=6, group=128)
  mxu_only   scores matmul + running column max only — the DMA + MXU floor
  no_extract tournament rounds only, candidates written raw — no per-block
             50-pass merge extraction, no verify (NOT exact; attribution)
  no_verify  tournament + merge extraction, but no count-verify/escalation
             (NOT exact; isolates the verify passes)
  no_argmax  tournament rounds record VALUES only (max + mask, no argmax /
             id bookkeeping) — bounds what a cheaper id scheme could save
  defer8     candidates buffered across 8 blocks, ONE merge extraction per
             window ((8*48+50)*50/8 = 2712 extraction rows per block vs the
             per-block (48+50)*50 = 4900) — the S-deferred merge design
  bm2048     production kernel at 512x2048 tiles (EVAVOS_SKIP_VALIDATE
             territory — the r2 calibration never measured 1M-elem tiles)

plus a VPU dtype probe: 50 chained max/where passes over a [1024, 512]
tile in fp32 vs bf16 (does v5e pack 2 bf16 per lane op?).

Writes experiments/r4_sel_attrib.json.
"""

import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("EVAVOS_JAX_CACHE", "/tmp/evavos_xla_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["EVAVOS_JAX_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

from eva_vos_tpu.kernels.memory_topk import (  # noqa: E402
    NEG_INF, _compiler_params, _extract_topk_rows, live_blocks,
    tournament_topk_t)

CK = 64
TOP_K = 50
BQ, BM = 512, 1024
GROUP = 128
ROUNDS = 6
N = 8100                      # 5-frame 480p block
TOKENS_PER_SLOT = 1620


def _kernel_ablate(qk_ref, mk_ref, msq_ref, valid_ref, vals_ref, idx_ref,
                   run_vals, run_idx, cand_vals, cand_idx, *, block_m,
                   top_k, scale, rounds, group, mode, defer_s=8):
    """Production tournament with components removed (attribution only —
    every mode except defer8 is NOT an exact selection; defer8 is exact
    up to the missing verify/escalation, like no_verify)."""
    j = pl.program_id(1)
    q = qk_ref[:]
    nq = q.shape[0]
    g = block_m // group
    n_cand = rounds * g                                  # per block

    @pl.when(j == 0)
    def _():
        run_vals[:] = jnp.full((top_k, nq), NEG_INF, jnp.float32)
        run_idx[:] = jnp.zeros((top_k, nq), jnp.int32)
        if mode == "defer8":
            cand_vals[:] = jnp.full((defer_s * n_cand, nq), NEG_INF,
                                    jnp.float32)
            cand_idx[:] = jnp.zeros((defer_s * n_cand, nq), jnp.int32)

    @pl.when(j * block_m < valid_ref[0])
    def _():
        dot = jax.lax.dot_general(
            mk_ref[:], q, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        scores = (2.0 * dot - msq_ref[:][:, None]) / scale
        tok_col = j * block_m + jax.lax.broadcasted_iota(
            jnp.int32, (block_m, 1), 0)
        scores = jnp.where(tok_col < valid_ref[0], scores, NEG_INF)

        if mode == "mxu_only":
            m = jnp.max(scores, axis=0)                  # [Qt]
            run_vals[0:1, :] = jnp.maximum(run_vals[0:1, :], m[None, :])
            return

        tau_run = run_vals[top_k - 1:top_k, :]

        @pl.when(jnp.any(scores > tau_run))
        def _():
            sub_ids = jax.lax.broadcasted_iota(jnp.int32, (1, group, 1), 1)
            base = j * block_m + group * jax.lax.broadcasted_iota(
                jnp.int32, (g, nq), 0)
            s3 = scores.reshape(g, group, nq)
            vs, ids = [], []
            for _ in range(rounds):
                m = jnp.max(s3, axis=1)
                if mode == "no_argmax":
                    vs.append(m)
                    s3 = jnp.where(s3 == m[:, None, :],
                                   jnp.float32(NEG_INF), s3)
                    continue
                am = jnp.argmax(s3, axis=1).astype(jnp.int32)
                vs.append(m)
                ids.append(base + am)
                s3 = jnp.where(sub_ids == am[:, None, :], NEG_INF, s3)
            cv1 = jnp.concatenate(vs, axis=0)            # [R*G, Qt]
            if mode == "no_argmax":
                nd = min(n_cand, top_k) // 8 * 8
                run_vals[pl.ds(0, nd), :] = cv1[:nd]
                return
            ci1 = jnp.concatenate(ids, axis=0)

            if mode == "no_extract":
                # dump the first candidate rows; no merge
                nd = min(n_cand, top_k) // 8 * 8
                run_vals[pl.ds(0, nd), :] = cv1[:nd]
                run_idx[pl.ds(0, nd), :] = ci1[:nd]
                return

            if mode == "defer8":
                # buffer this block's candidates; the merge happens at
                # window end below
                slot = (j % defer_s) * n_cand
                cand_vals[pl.ds(slot, n_cand), :] = cv1
                cand_idx[pl.ds(slot, n_cand), :] = ci1
                return

            cat_v = jnp.concatenate([cv1, run_vals[:]], axis=0)
            cat_i = jnp.concatenate([ci1, run_idx[:]], axis=0)
            mv1, mi1 = _extract_topk_rows(cat_v, cat_i, top_k)
            # mode == no_verify: skip the count-verify + escalation chain
            run_vals[:] = mv1
            run_idx[:] = mi1

    if mode == "defer8":
        window_end = ((j % defer_s) == defer_s - 1) | (
            j == pl.num_programs(1) - 1)

        @pl.when(window_end & (j * block_m < valid_ref[0]))
        def _():
            cat_v = jnp.concatenate([cand_vals[:], run_vals[:]], axis=0)
            cat_i = jnp.concatenate([cand_idx[:], run_idx[:]], axis=0)
            mv1, mi1 = _extract_topk_rows(cat_v, cat_i, top_k)
            run_vals[:] = mv1
            run_idx[:] = mi1
            cand_vals[:] = jnp.full((defer_s * n_cand, nq), NEG_INF,
                                    jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        vals_ref[:] = run_vals[:]
        idx_ref[:] = run_idx[:]


def ablate_topk_t(qk_p, mk_p, msq, valid, *, mode, block_q=BQ, block_m=BM):
    np_, ck = qk_p.shape
    mp_ = mk_p.shape[0]
    n_blocks = mp_ // block_m
    return pl.pallas_call(
        functools.partial(_kernel_ablate, block_m=block_m, top_k=TOP_K,
                          scale=math.sqrt(ck), rounds=ROUNDS, group=GROUP,
                          mode=mode),
        grid=(np_ // block_q, live_blocks(valid, block_m, n_blocks, False)),
        in_specs=[
            pl.BlockSpec((block_q, ck), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, ck), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m,), lambda i, j: (j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((TOP_K, block_q), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TOP_K, block_q), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((TOP_K, np_), jnp.float32),
            jax.ShapeDtypeStruct((TOP_K, np_), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TOP_K, block_q), jnp.float32),
            pltpu.VMEM((TOP_K, block_q), jnp.int32),
            pltpu.VMEM((8 * ROUNDS * (block_m // GROUP), block_q),
                       jnp.float32),
            pltpu.VMEM((8 * ROUNDS * (block_m // GROUP), block_q),
                       jnp.int32),
        ],
        compiler_params=_compiler_params(),
        interpret=False,
    )(qk_p, mk_p, msq, valid)


def make_inputs(fill_slots, dtype=jnp.bfloat16, m_pad_unit=BM, seed=0):
    rng = np.random.default_rng(seed)
    m = fill_slots * TOKENS_PER_SLOT
    mp = m + (-m) % m_pad_unit
    npad = N + (-N) % BQ
    mk = jnp.asarray(rng.standard_normal((mp, CK)), dtype)
    qk = jnp.asarray(rng.standard_normal((npad, CK)), dtype)
    msq = jnp.sum(mk.astype(jnp.float32) ** 2, axis=-1)
    valid = jnp.asarray([m], jnp.int32)
    return qk, mk, msq, valid


def chained_time(fn, qk, args, iters=20, warmup=3):
    """Serialize calls by feeding a scalar of the output back into qk."""
    @jax.jit
    def step(qk):
        vals, idx = fn(qk, *args)
        bump = (vals[0, 0] * 0.0).astype(qk.dtype)
        return qk + bump, vals

    q = qk
    for _ in range(warmup):
        q, v = step(q)
    jax.device_get(v[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        q, v = step(q)
    jax.device_get(v[0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


def vpu_dtype_probe():
    """50 chained max+where passes over [1024, 512]: fp32 vs bf16."""
    def kernel(x_ref, o_ref, *, passes):
        x = x_ref[:]
        acc = x[0:1, :]
        for _ in range(passes):
            m = jnp.max(x, axis=0)
            x = jnp.where(x == m[None, :], jnp.asarray(NEG_INF, x.dtype), x)
            acc = jnp.maximum(acc, m[None, :])
        o_ref[:] = acc

    out = {}
    for dt, name in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((1024, 512)), dt)

        def run(x):
            return pl.pallas_call(
                functools.partial(kernel, passes=50),
                out_shape=jax.ShapeDtypeStruct((1, 512), x.dtype),
                compiler_params=_compiler_params(),
            )(x)

        @jax.jit
        def step(x):
            o = run(x)
            return x + (o[0, 0] * 0).astype(x.dtype), o

        q = x
        for _ in range(3):
            q, o = step(q)
        jax.device_get(o[0, 0])
        t0 = time.perf_counter()
        for _ in range(50):
            q, o = step(q)
        jax.device_get(o[0, 0])
        out[name] = round((time.perf_counter() - t0) / 50 * 1e3, 4)
    return out


def main():
    results = {"device": jax.devices()[0].device_kind,
               "geometry": f"N={N} CK={CK} k={TOP_K} bq={BQ} bm={BM} "
                           f"R={ROUNDS} group={GROUP}"}
    for fill in (13, 72):
        qk, mk, msq, valid = make_inputs(fill)
        row = {}
        # production (exact) kernel
        row["full"] = round(chained_time(
            lambda q, mk, msq, valid: tournament_topk_t(
                q, mk, msq, valid, top_k=TOP_K, block_q=BQ, block_m=BM,
                scale=math.sqrt(CK)),
            qk, (mk, msq, valid)), 3)
        for mode in ("mxu_only", "no_extract", "no_argmax",
                     "no_verify", "defer8"):
            row[mode] = round(chained_time(
                functools.partial(
                    lambda q, mk, msq, valid, mode: ablate_topk_t(
                        q, mk, msq, valid, mode=mode),
                    mode=mode),
                qk, (mk, msq, valid)), 3)
        # 512x2048 production kernel (past the validator calibration)
        try:
            os.environ["EVAVOS_SKIP_VALIDATE"] = "1"
            qk2, mk2, msq2, valid2 = make_inputs(fill, m_pad_unit=2048)
            row["bm2048"] = round(chained_time(
                lambda q, mk, msq, valid: tournament_topk_t(
                    q, mk, msq, valid, top_k=TOP_K, block_q=BQ,
                    block_m=2048, scale=math.sqrt(CK)),
                qk2, (mk2, msq2, valid2)), 3)
        except Exception as e:  # noqa: BLE001
            row["bm2048"] = f"failed: {type(e).__name__}: {e}"[:200]
        finally:
            os.environ.pop("EVAVOS_SKIP_VALIDATE", None)
        results[f"fill{fill}"] = row
        print(f"fill {fill}: {row}", flush=True)

    results["vpu_probe_ms_50pass_1024x512"] = vpu_dtype_probe()
    print("vpu probe:", results["vpu_probe_ms_50pass_1024x512"], flush=True)

    with open("/root/repo/experiments/r4_sel_attrib.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

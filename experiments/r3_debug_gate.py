"""Instrumented gated-readout: dump per-query recomputed-score max and
gate count, compared against the selection's vmax/tau — isolates whether
the fused-readout mismatch on clustered data is a score-recompute
divergence or a gate/tie bug.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import functools
import math
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eva_vos_tpu.kernels.memory_topk import (_compiler_params, live_blocks,
                                             tournament_topk_t)

NEG_INF = -1e30
HW, CK, CV = 1620, 64, 512


def _probe_kernel(qk_ref, mk_ref, msq_ref, vals_ref, idx_ref, valid_ref,
                  out_ref, *, block_m, top_k, scale):
    """out[0] = running max recomputed score; out[1] = gate count;
    out[2] = count of s > vmax."""
    j = pl.program_id(0)
    q = qk_ref[:]
    nq = q.shape[0]
    vals = vals_ref[:]
    sel_idx = idx_ref[:]
    vmax = vals[0:1, :]
    tau = vals[top_k - 1:top_k, :]
    tie_max = jnp.max(jnp.where(vals == tau, sel_idx, jnp.int32(-1)),
                      axis=0, keepdims=True)

    dot = jax.lax.dot_general(
        mk_ref[:], q, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    s = (2.0 * dot - msq_ref[:][:, None]) / scale
    tok = j * block_m + jax.lax.broadcasted_iota(jnp.int32, (block_m, nq), 0)
    s = jnp.where(tok < valid_ref[0], s, NEG_INF)

    gate = (s > tau) | ((s == tau) & (tok <= tie_max))

    prev = jnp.where(j == 0,
                     jnp.stack([jnp.full((nq,), NEG_INF, jnp.float32),
                                jnp.zeros((nq,), jnp.float32),
                                jnp.zeros((nq,), jnp.float32)]),
                     out_ref[:])
    smax = jnp.maximum(prev[0], jnp.max(s, axis=0))
    gcount = prev[1] + jnp.sum(gate.astype(jnp.float32), axis=0)
    above = prev[2] + jnp.sum((s > vmax).astype(jnp.float32), axis=0)
    out_ref[:] = jnp.stack([smax, gcount, above])


def probe(mk, qk, top_k, valid, block_q=128, block_m=4096):
    n, ck = qk.shape
    m = mk.shape[0]
    scale = math.sqrt(ck)
    rb = 2048
    pad_unit = 4096
    pad_n = (-n) % block_q
    pad_m = (-m) % pad_unit
    qk_p = jnp.pad(qk, ((0, pad_n), (0, 0)))
    mk_p = jnp.pad(mk, ((0, pad_m), (0, 0)))
    msq = jnp.sum(mk_p.astype(jnp.float32) ** 2, axis=-1)
    valid_arr = jnp.asarray([valid], jnp.int32)
    np_, mp_ = n + pad_n, m + pad_m

    vals_t, idx_t = tournament_topk_t(qk_p, mk_p, msq, valid_arr,
                                      top_k=top_k, block_q=block_q,
                                      block_m=block_m, scale=scale)
    n_blocks = mp_ // rb
    out = pl.pallas_call(
        functools.partial(_probe_kernel, block_m=rb, top_k=top_k,
                          scale=scale),
        grid=(live_blocks(valid_arr, rb, n_blocks, False), np_ // block_q),
        in_specs=[
            pl.BlockSpec((block_q, ck), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, ck), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb,), lambda j, i: (j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((top_k, block_q), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((top_k, block_q), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((3, block_q), lambda j, i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, np_), jnp.float32),
        compiler_params=_compiler_params(),
    )(qk_p, mk_p, msq, vals_t, idx_t, valid_arr)
    return (np.asarray(vals_t)[:, :n], np.asarray(idx_t)[:, :n],
            np.asarray(out)[:, :n])


def main(mmax=20, fill=7, top_k=50):
    rng = np.random.default_rng(0)
    cents = rng.standard_normal((mmax, CK)) * 1.5
    mk = (np.repeat(cents, HW, axis=0)
          + 0.7 * rng.standard_normal((mmax * HW, CK)))
    qc = cents[rng.integers(mmax)]
    qk = np.tile(qc, (HW, 1)) + 0.7 * rng.standard_normal((HW, CK))
    mk = jnp.asarray(mk, jnp.bfloat16)
    qk = jnp.asarray(qk, jnp.bfloat16)
    valid = fill * HW

    vals, idx, out = probe(mk, qk, top_k, valid)
    smax, gcount, above = out
    vmax = vals[0]
    tau = vals[top_k - 1]
    print("recomputed smax - selection vmax: "
          f"min {np.min(smax - vmax):.4f} max {np.max(smax - vmax):.4f}",
          flush=True)
    print(f"queries with smax > vmax: {(smax > vmax).sum()}/{len(vmax)}",
          flush=True)
    print(f"tokens above vmax (total): {above.sum():.0f}", flush=True)
    print(f"gate counts: min {gcount.min():.0f} max {gcount.max():.0f} "
          f"(expected ~{top_k})", flush=True)
    q13 = 13
    print(f"q13: vmax {vmax[q13]:.4f} tau {tau[q13]:.4f} smax {smax[q13]:.4f}"
          f" gates {gcount[q13]:.0f} above {above[q13]:.0f}", flush=True)


if __name__ == "__main__":
    main()

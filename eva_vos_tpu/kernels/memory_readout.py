"""Pallas TPU kernel: threshold-gated streaming memory readout.

Second half of the space-time memory read (reference
``mivos/model/propagation/prop_net.py:80-115``: ``softmax_w_g_top`` top-k
weights followed by the value-bank matmul).  The selection kernel
(``memory_topk.py``) produces the exact top-k (values, indices); the XLA
readout then either gathers rows of the value bank ([K, N, top_k, CV]
materialization, gather-hostile on TPU) or densifies a [N, M] scatter
matrix.  This kernel does neither: it streams the memory bank through VMEM
a second time and, per block,

1. recomputes the block's affinity scores on the MXU with bit-identical
   dtype/precision to the selection kernel,
2. gates them at the per-query k-th selected value tau — including the
   lax.top_k tie rule (score == tau admitted only for token ids <= the
   largest selected tie id), so the gated set is EXACTLY the selected set,
3. accumulates ``gate * exp(s - vmax) @ V_block`` into a VMEM fp32
   accumulator — one MXU matmul per block, no index traffic at all.

The softmax denominator is applied outside (computed in XLA from the
selection values); dead blocks past the bank fill pointer skip scoring,
gating and the matmul via ``pl.when``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .memory_topk import pallas_memory_topk

NEG_INF = -1e30


def _gated_readout_kernel(qk_ref, mk_ref, msq_ref, mv_ref, vals_ref,
                          idx_ref, valid_ref, out_ref, acc, *,
                          block_m: int, top_k: int, scale: float,
                          n_blocks: int, n_obj: int):
    j = pl.program_id(1)
    q = qk_ref[:]                           # [Qt, CK]
    nq = q.shape[0]
    cv = mv_ref.shape[-1]

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros((n_obj, nq, cv), jnp.float32)

    @pl.when(j * block_m < valid_ref[0])
    def _():
        vals = vals_ref[:]                  # [Qt, k] selection values (desc)
        sel_idx = idx_ref[:]                # [Qt, k] selected token ids
        vmax = vals[:, 0:1]                 # [Qt, 1]
        tau = vals[:, top_k - 1:top_k]      # [Qt, 1] k-th selected value
        # largest selected token id among entries tied at tau — the
        # lax.top_k rule keeps the LOWEST ids on ties, so the selected set
        # is exactly {s > tau} u {s == tau and id <= tie_max}
        tie_max = jnp.max(
            jnp.where(vals == tau, sel_idx, jnp.int32(-1)),
            axis=1, keepdims=True)          # [Qt, 1]

        # recompute this block's scores with the selection kernel's exact
        # dtype/precision so equality against tau is bitwise-meaningful
        prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        dot = jax.lax.dot_general(
            q, mk_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        s = (2.0 * dot - msq_ref[:][None, :]) / scale      # [Qt, Bm] fp32
        tok = j * block_m + jax.lax.broadcasted_iota(
            jnp.int32, (nq, block_m), 1)
        s = jnp.where(tok < valid_ref[0], s, NEG_INF)

        gate = (s > tau) | ((s == tau) & (tok <= tie_max))
        contrib = jnp.where(gate, jnp.exp(s - vmax), 0.0)  # [Qt, Bm] fp32

        for o in range(n_obj):              # static K loop, contrib shared
            v_blk = mv_ref[o].astype(jnp.float32)          # [Bm, CV]
            acc[o] += jax.lax.dot_general(
                contrib, v_blk, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    @pl.when(j == n_blocks - 1)
    def _():
        # normalize in-kernel (z from the selection values — identical math
        # to the XLA oracle's w = exp(v - v0) / sum) and emit the value
        # dtype: keeps the XLA-side output out of scoped VMEM (a full fp32
        # [N, CV] output blew the 16 MB limit at production sizes)
        vals = vals_ref[:]
        z = jnp.sum(jnp.exp(vals - vals[:, 0:1]), axis=1)[None, :, None]
        out_ref[:] = (acc[:] / z).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("top_k", "block_q", "block_m",
                                    "readout_block_m", "interpret",
                                    "selection_method"))
def pallas_fused_readout(mk, qk, mv, top_k: int, valid_tokens=None,
                         block_q: int = 256, block_m: int = 2048,
                         readout_block_m: int | None = None,
                         interpret: bool = False,
                         selection_method: str = "tournament"):
    """Exact top-k attention readout, fully in two streaming kernels.

    mk [M, CK], qk [N, CK], mv [K_obj, M, CV]
    -> [K_obj, N, CV] in mv.dtype (bitwise-equal selected set and softmax
    weights as ``ops.memory_attention.memory_readout``).

    ``readout_block_m`` (default min(block_m, 2048)) bounds the gated
    sweep's value window: the [Bm, CV] mv blocks are double-buffered in
    VMEM alongside the [K, N_tile, CV] accumulator, so large selection
    blocks would blow the 16 MB scoped-VMEM budget at production sizes.
    """
    n, ck = qk.shape
    m = mk.shape[0]
    n_obj, _, cv = mv.shape
    scale = math.sqrt(ck)

    # pass 1: exact streaming selection (raw values + indices)
    vals, idx = pallas_memory_topk(
        mk, qk, top_k, valid_tokens, block_q=block_q, block_m=block_m,
        interpret=interpret, method=selection_method, return_raw=True)

    if readout_block_m is None:
        readout_block_m = min(block_m, 2048)
    block_m = readout_block_m
    pad_n = (-n) % block_q
    pad_m = (-m) % block_m
    qk_p = jnp.pad(qk, ((0, pad_n), (0, 0)))
    mk_p = jnp.pad(mk, ((0, pad_m), (0, 0)))
    mv_p = jnp.pad(mv, ((0, 0), (0, pad_m), (0, 0)))
    # padded query rows: vals pad with NEG_INF so tau/vmax stay inert
    vals_p = jnp.pad(vals, ((0, pad_n), (0, 0)), constant_values=NEG_INF)
    idx_p = jnp.pad(idx, ((0, pad_n), (0, 0)))
    msq = jnp.sum(mk_p.astype(jnp.float32) ** 2, axis=-1)
    valid = jnp.asarray(
        [m if valid_tokens is None else valid_tokens], jnp.int32)

    np_, mp_ = n + pad_n, m + pad_m
    n_blocks = mp_ // block_m

    out = pl.pallas_call(
        functools.partial(_gated_readout_kernel, block_m=block_m,
                          top_k=top_k, scale=scale, n_blocks=n_blocks,
                          n_obj=n_obj),
        grid=(np_ // block_q, n_blocks),
        in_specs=[
            pl.BlockSpec((block_q, ck), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, ck), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m,), lambda i, j: (j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_obj, block_m, cv), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, top_k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, top_k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((n_obj, block_q, cv), lambda i, j: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_obj, np_, cv), mv.dtype),
        scratch_shapes=[pltpu.VMEM((n_obj, block_q, cv), jnp.float32)],
        interpret=interpret,
    )(qk_p, mk_p, msq, mv_p, vals_p, idx_p, valid)

    return out[:, :n]


_SUPPORTED = None


def fused_readout_supported() -> bool:
    """Probe whether the compiled fused-readout kernel runs and agrees with
    the XLA oracle on this backend."""
    global _SUPPORTED
    if _SUPPORTED is None:
        try:
            import numpy as np

            rng = np.random.default_rng(0)
            mk = jnp.asarray(rng.standard_normal((4096, 64)), jnp.float32)
            qk = jnp.asarray(rng.standard_normal((128, 64)), jnp.float32)
            mv = jnp.asarray(rng.standard_normal((1, 4096, 256)), jnp.float32)
            out = pallas_fused_readout(mk, qk, mv, top_k=50, block_q=128,
                                       block_m=2048)
            jax.block_until_ready(out)
            from ..ops.memory_attention import memory_readout

            ref = memory_readout(mk, qk, mv, top_k=50, strategy="gather")
            _SUPPORTED = bool(np.allclose(np.asarray(out), np.asarray(ref),
                                          rtol=1e-4, atol=1e-5))
        except Exception:
            _SUPPORTED = False
    return _SUPPORTED

"""Pallas TPU kernel: threshold-gated streaming memory readout.

Second half of the space-time memory read (reference
``mivos/model/propagation/prop_net.py:80-115``: ``softmax_w_g_top`` top-k
weights followed by the value-bank matmul).  The tournament selection
kernel (``memory_topk.py``) produces the exact top-k (values, indices);
the XLA readout then either gathers rows of the value bank
([K, N, top_k, CV] materialization, gather-hostile on TPU) or densifies a
[N, M] scatter matrix.  This kernel does neither: it streams the memory
bank through VMEM a second time and, per block,

1. recomputes the block's affinity scores BIT-IDENTICALLY to the selection
   kernel (same transposed [Bm, Qt] orientation, dtype and precision — the
   gate below relies on float equality),
2. gates them at the per-query k-th selected value tau — including the
   lax.top_k tie rule (score == tau admitted only for token ids <= the
   largest selected tie id), so the gated set is EXACTLY the selected set,
3. accumulates ``gate * exp(s - vmax) @ V_block`` into the revisited fp32
   output block — one MXU matmul per (bank block, query tile), no index
   traffic at all.  The bank block is the OUTER grid dimension, so each
   mk/mv block is DMA'd once total (bank traffic O(M), not
   O(M * N/block_q)),

   NOTE (ADVICE r2): using the revisited output block as the fp32
   accumulator relies on Mosaic's output-revisit semantics (the block is
   re-fetched when the same output index recurs non-consecutively across
   grid steps).  This is validated empirically by the TPU-gated tests
   (``tests/test_tpu_kernels.py`` — run them for any jax/Mosaic bump);
   if it ever breaks, swap the accumulator for a per-query-tile VMEM
   scratch (grid order would then need query tiles OUTER).
4. normalizes by the softmax denominator in-kernel on the last bank block.

The memory-axis grid is sized by the bank's valid prefix (dynamic grid,
``memory_topk.live_blocks``): blocks past the fill pointer are never
scheduled, so they cost neither DMA nor compute — mostly-empty interactive
banks read only what exists.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .memory_topk import (_compiler_params, live_blocks, tournament_topk_t,
                          validate_block_geometry)

NEG_INF = -1e30


def _gated_readout_kernel(qk_ref, mk_ref, msq_ref, mv_ref, vals_ref,
                          idx_ref, valid_ref, out_ref, *,
                          block_m: int, top_k: int, scale: float,
                          n_obj: int):
    """Grid is (bank_block OUTER, query_tile INNER): the mk/mv blocks'
    index map depends only on the outer dim, so each bank block is DMA'd
    ONCE and all query tiles sweep it — total bank traffic is O(M), not
    O(M * N/block_q).  The fp32 accumulator is the revisited output block
    itself (one per query tile); normalization happens on the last bank
    block."""
    j = pl.program_id(0)                    # bank block (outer)
    q = qk_ref[:]                           # [Qt, CK]
    nq = q.shape[0]

    vals = vals_ref[:]                      # [k, Qt] selection values (desc)
    sel_idx = idx_ref[:]                    # [k, Qt] selected token ids
    vmax = vals[0:1, :]                     # [1, Qt]
    tau = vals[top_k - 1:top_k, :]          # [1, Qt] k-th selected value
    # largest selected token id among entries tied at tau — the lax.top_k
    # rule keeps the LOWEST ids on ties, so the selected set is exactly
    # {s > tau} u {s == tau and id <= tie_max}
    tie_max = jnp.max(
        jnp.where(vals == tau, sel_idx, jnp.int32(-1)),
        axis=0, keepdims=True)              # [1, Qt]

    # recompute this block's scores bit-identically to the selection
    # kernel (same orientation/dtype/precision) so equality against tau
    # is meaningful
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    dot = jax.lax.dot_general(
        mk_ref[:], q, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    s = (2.0 * dot - msq_ref[:][:, None]) / scale      # [Bm, Qt] fp32
    tok = j * block_m + jax.lax.broadcasted_iota(
        jnp.int32, (block_m, nq), 0)
    s = jnp.where(tok < valid_ref[0], s, NEG_INF)

    gate = (s > tau) | ((s == tau) & (tok <= tie_max))
    contrib = jnp.where(gate, jnp.exp(s - vmax), 0.0)  # [Bm, Qt] fp32

    prev = jnp.where(j == 0, jnp.zeros_like(out_ref[:]), out_ref[:])
    acc = []
    for o in range(n_obj):                  # static K loop, contrib shared
        v_blk = mv_ref[o].astype(jnp.float32)          # [Bm, CV]
        acc.append(prev[o] + jax.lax.dot_general(
            contrib, v_blk, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))      # [Qt, CV]
    acc = jnp.stack(acc)

    # normalize on the last bank block: z from the selection values —
    # identical math to the XLA oracle's w = exp(v - v0) / sum
    z = jnp.sum(jnp.exp(vals - vmax), axis=0)          # [Qt]
    last = j == pl.num_programs(0) - 1
    out_ref[:] = jnp.where(last, acc / z[None, :, None], acc)


@functools.partial(jax.jit,
                   static_argnames=("top_k", "block_q", "block_m",
                                    "readout_block_m", "interpret"))
def pallas_fused_readout(mk, qk, mv, top_k: int, valid_tokens=None,
                         block_q: int = 128, block_m: int = 4096,
                         readout_block_m: int | None = None,
                         interpret: bool = False):
    """Exact top-k attention readout, fully in two streaming kernels
    (tournament selection + threshold-gated value sweep).

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

    if readout_block_m is None:
        readout_block_m = min(block_m, 2048)
    # one padded geometry serves both kernels; block_m and readout_block_m
    # must both divide it
    pad_unit = max(block_m, readout_block_m)
    assert pad_unit % readout_block_m == 0 and pad_unit % block_m == 0, (
        "block_m and readout_block_m must divide their maximum")

    pad_n = (-n) % block_q
    pad_m = (-m) % pad_unit
    qk_p = jnp.pad(qk, ((0, pad_n), (0, 0)))
    mk_p = jnp.pad(mk, ((0, pad_m), (0, 0)))
    mv_p = jnp.pad(mv, ((0, 0), (0, pad_m), (0, 0)))
    msq = jnp.sum(mk_p.astype(jnp.float32) ** 2, axis=-1)
    valid = jnp.asarray(
        [m if valid_tokens is None else valid_tokens], jnp.int32)

    np_, mp_ = n + pad_n, m + pad_m

    # pass 1: exact streaming selection, transposed outputs [k, Np]
    vals_t, idx_t = tournament_topk_t(
        qk_p, mk_p, msq, valid, top_k=top_k, block_q=block_q,
        block_m=block_m, scale=scale, interpret=interpret)

    rb = readout_block_m
    n_blocks = mp_ // rb
    if not interpret:
        validate_block_geometry(block_q=block_q, block_m=rb, ck=ck,
                                top_k=top_k, cv=cv, n_obj=n_obj,
                                kernel="readout")

    # bank block is the OUTER grid dim (query tiles inner): each mv/mk
    # block is fetched once total; the fp32 output blocks are revisited
    # per bank block and act as the accumulator
    out = pl.pallas_call(
        functools.partial(_gated_readout_kernel, block_m=rb,
                          top_k=top_k, scale=scale, n_obj=n_obj),
        grid=(live_blocks(valid, rb, n_blocks, interpret), np_ // block_q),
        in_specs=[
            pl.BlockSpec((block_q, ck), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, ck), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb,), lambda j, i: (j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_obj, rb, cv), lambda j, i: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((top_k, block_q), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((top_k, block_q), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((n_obj, block_q, cv), lambda j, i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_obj, np_, cv), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(qk_p, mk_p, msq, mv_p, vals_t, idx_t, valid)

    return out[:, :n].astype(mv.dtype)


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
                                       block_m=4096)
            jax.block_until_ready(out)
            from ..ops.memory_attention import memory_readout

            ref = memory_readout(mk, qk, mv, top_k=50, strategy="gather")
            _SUPPORTED = bool(np.allclose(np.asarray(out), np.asarray(ref),
                                          rtol=1e-4, atol=1e-5))
        except Exception:
            _SUPPORTED = False
    return _SUPPORTED

"""Pallas TPU kernel: index-scattered streaming memory readout.

Second half of the space-time memory read (reference
``mivos/model/propagation/prop_net.py:80-115``: ``softmax_w_g_top`` top-k
weights followed by the value-bank matmul).  The tournament selection
kernel (``memory_topk.py``) produces the exact top-k (values, indices);
the XLA readout then either gathers rows of the value bank
([K, N, top_k, CV] materialization, gather-hostile on TPU) or densifies a
[N, M] scatter matrix in HBM.  This kernel streams the VALUE bank through
VMEM and, per (bank block, query tile):

1. skips outright when none of the tile's selected token ids fall in the
   block (``top_k`` ids per query cluster in a handful of temporally-near
   bank frames, so a warm bank skips almost every pair — readout compute
   tracks the top-k SPREAD, not the bank size),
2. builds the contribution matrix by SCATTERING the selection's own
   softmax weights at its token ids — ``contrib[b, q] = w[t, q]`` where
   ``sel_idx[t, q] == block_base + b`` — a k-pass broadcast-compare
   accumulation with NO score recompute.  (An earlier design recomputed
   block scores and gated them at the k-th selected value; that relied on
   float equality BETWEEN two separately-compiled kernels, which Mosaic
   does not guarantee — large clustered scores exposed recompute
   divergence, r3_debug_clustered.  Scattering the selection's indices is
   exact by construction and also removes the readout's mk/msq DMA and
   MXU dot.)
3. accumulates ``contrib @ V_block`` into a WHOLE-OUTPUT fp32 VMEM
   scratch ([K, N, CV] — ~17 MB at the blocked-engine geometry, well
   inside scoped VMEM).  The bank block is the OUTER grid dimension, so
   each mv block is DMA'd once total (bank traffic O(M), not
   O(M * N/block_q)).

   The r2 kernel instead accumulated into the REVISITED output block and
   relied on Mosaic re-fetching it when the same output index recurs
   non-consecutively across grid steps; the r3 debugging session
   (r3_debug_gate) caught that revisit pattern silently corrupting
   partial sums at 13-query-tile geometry.  The scratch accumulator has
   no cross-step output reads at all, which removes the failure mode.
4. normalizes by the softmax denominator (from the selection values) on
   the last bank block and only then writes the output tile.

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

from .memory_topk import (_compiler_params, chunked_topk_t, live_blocks,
                          resident_fits, resident_topk_t, tournament_topk_t,
                          validate_block_geometry)

NEG_INF = -1e30


def _scatter_readout_kernel(mv_ref, vals_ref, idx_ref, out_ref, acc_ref,
                            sw_ref, si_ref, *, block_m: int, block_q: int,
                            top_k: int, n_obj: int, ro_win: int = 16,
                            no_skip: bool = False):
    """Grid is (bank_block OUTER, query_tile INNER); see module docstring.
    ``acc_ref`` is the whole-output fp32 scratch [n_obj, Np, CV].

    SORTED-SLOT build (r3): at j == 0 each tile's (weight, id) pairs are
    re-sorted by ASCENDING token id into ``sw_ref``/``si_ref`` (exact —
    ids are unique per query, so every contrib element receives exactly
    one nonzero addend and reordering is bit-equal).  With sorted ids the
    slots hitting a given bank block form a CONTIGUOUS range, and on
    real banks (whose ids spread over every block — r3_realbank:
    live_pair_frac=1.0, so the block-level skip never fires) that range
    is a handful of slots wide.  Each live pair then builds its one-hot
    contributions from one 16-slot dynamic window instead of all
    ``top_k`` slots, with an exact full-build fallback when a tile's
    range exceeds the window (wide spreads near tiny fills)."""
    j = pl.program_id(0)                    # bank block (outer)
    i = pl.program_id(1)                    # query tile (inner)

    vals = vals_ref[:]                      # [k, Qt] selection values (desc)
    nq = vals.shape[1]
    col = pl.ds(i * block_q, block_q)

    # window width: larger windows fit more (block, tile) pairs at mid
    # fills (fewer 50-pass full-build fallbacks) at the cost of more
    # passes when they do fit; 8-multiple keeps the dynamic slice aligned
    win = min(ro_win, top_k)
    win = max(8, win - win % 8)
    pad_k = sw_ref.shape[0]                 # top_k rounded up to 8 sublanes
    big = jnp.int32(2 ** 30)

    @pl.when(j == 0)
    def _():
        acc_ref[:, col, :] = jnp.zeros((n_obj, nq, mv_ref.shape[-1]),
                                       jnp.float32)
        # id-ascending resort, once per tile: top_k min-id extractions
        # over the [k, Qt] slot axis.  Ids are UNIQUE per query, so the
        # min row is identified by equality — no argmin (Mosaic lowers
        # int32 min reductions but rejects int32 argmin on TPU).
        # Rows [top_k, pad_k) are inert sentinels (w=0, id=big) so the
        # 8-aligned dynamic window below can cover the last real slots.
        w = jnp.exp(vals - vals[0:1, :])    # [k, Qt] softmax numerators
        rem = idx_ref[:]
        for t in range(top_k):
            minv = jnp.min(rem, axis=0)                # [Qt]
            hit = rem == minv[None, :]                 # [k, Qt] exactly one
            si_ref[t, col] = minv
            sw_ref[t, col] = jnp.sum(jnp.where(hit, w, 0.0), axis=0)
            rem = jnp.where(hit, big, rem)
        for t in range(top_k, pad_k):
            si_ref[t, col] = jnp.full((nq,), big, jnp.int32)
            sw_ref[t, col] = jnp.zeros((nq,), jnp.float32)

    # block skip from the SELECTED ids: only blocks containing at least one
    # selected token for some query in this tile contribute
    lo = j * block_m
    si = si_ref[:, col]                     # [k, Qt] ids, ascending per q
    in_block = (si >= lo) & (si < lo + block_m)

    # contiguous active-slot range for this (block, tile)
    hits = jnp.any(in_block, axis=1)                   # [pad_k]
    trange = jax.lax.broadcasted_iota(jnp.int32, (pad_k,), 0)
    lo_t = jnp.min(jnp.where(hits, trange, pad_k))
    hi_t = jnp.max(jnp.where(hits, trange, -1))
    # 8-aligned window start (sublane-dim dynamic slices want alignment) —
    # written as 8 * (...) so Mosaic can statically prove the alignment;
    # the sentinel rows let the window run past top_k up to pad_k
    base = 8 * jnp.minimum(lo_t // 8, max(0, (pad_k - win) // 8))
    fits = (hi_t - base) < win

    def _mm(contrib):
        for o in range(n_obj):              # static K loop, contrib shared
            # matmul in the value bank's NATIVE dtype with fp32 accumulate:
            # fp32 banks keep the full-precision pass (test oracle at 1e-5);
            # bf16 banks (production) get a single native MXU pass — the
            # r2/r3 kernel upcast to fp32 + HIGHEST here, paying ~4-6x MXU
            # passes to add precision below the bank's own storage rounding
            v_blk = mv_ref[o]                          # [Bm, CV]
            # HIGHEST (fp32 contract) is only legal — and only meaningful —
            # for fp32 operands; Mosaic rejects it outright on bf16 inputs
            prec = (jax.lax.Precision.HIGHEST
                    if v_blk.dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT)
            acc_ref[o, col, :] += jax.lax.dot_general(
                contrib.astype(v_blk.dtype), v_blk,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)                        # [Qt, CV]

    tok = lo + jax.lax.broadcasted_iota(jnp.int32, (block_m, nq), 0)
    any_hit = jnp.any(in_block)

    def _full_build():
        # exact full top_k-pass build (the fallback for a tile whose
        # active range exceeds the window, and the no-skip ablation)
        contrib = jnp.zeros((block_m, nq), jnp.float32)
        for t in range(top_k):              # static unroll
            hit = si_ref[t:t + 1, col] == tok          # [Bm, Qt]
            contrib = contrib + jnp.where(hit, sw_ref[t:t + 1, col], 0.0)
        _mm(contrib)

    if no_skip:                             # static python branch
        _full_build()
    else:
        @pl.when(any_hit & fits)
        def _():
            # windowed build: active slots all lie in [base, base + win)
            sw_win = sw_ref[pl.ds(base, win), col]     # [win, Qt]
            si_win = si_ref[pl.ds(base, win), col]
            contrib = jnp.zeros((block_m, nq), jnp.float32)
            for t in range(win):            # static unroll
                hit = si_win[t:t + 1, :] == tok        # [Bm, Qt]
                contrib = contrib + jnp.where(hit, sw_win[t:t + 1, :], 0.0)
            _mm(contrib)

        @pl.when(any_hit & ~fits)
        def _():
            _full_build()

    # normalize on the last bank block: z from the selection values —
    # identical math to the XLA oracle's w = exp(v - v0) / sum.  The
    # output block is only meaningful at j == last; earlier steps write
    # the (unnormalized) running scratch, each overwritten by the next
    # revisit — no cross-step READS of the output remain.
    z = jnp.sum(jnp.exp(vals - vals[0:1, :]), axis=0)  # [Qt]
    last = j == pl.num_programs(0) - 1
    acc = acc_ref[:, col, :]
    out_ref[:] = jnp.where(last, acc / z[None, :, None], acc)


def _scatter_readout_kernel_chunked(mv_ref, vals_ref, idx_ref, out_ref,
                                    acc_ref, *, block_m: int, super_m: int,
                                    block_q: int, top_k: int, n_obj: int,
                                    no_skip: bool = False):
    """Chunked variant of ``_scatter_readout_kernel``: the memory-axis grid
    step DMAs a ``super_m``-token value SUPERBLOCK and an in-kernel loop
    walks its ``block_m`` sub-chunks, skipping each one unless some
    selected id lands in it (one [k, Qt] compare — the ids of a warm bank
    cluster into a handful of sub-chunks).  Cuts the per-grid-step
    scheduling overhead ``super_m / block_m``-fold; the accumulator
    semantics (whole-output fp32 scratch, normalize on the last memory
    step) are identical to the per-block kernel."""
    j = pl.program_id(0)                    # value superblock (outer)
    i = pl.program_id(1)                    # query tile (inner)

    vals = vals_ref[:]                      # [k, Qt]
    sel_idx = idx_ref[:]                    # [k, Qt]
    w = jnp.exp(vals - vals[0:1, :])        # [k, Qt]
    nq = vals.shape[1]
    cv = mv_ref.shape[-1]
    col = pl.ds(i * block_q, block_q)

    @pl.when(j == 0)
    def _():
        acc_ref[:, col, :] = jnp.zeros((n_obj, nq, cv), jnp.float32)

    n_sub = super_m // block_m
    sb_base = j * super_m

    def body(t, carry):
        lo = sb_base + t * block_m
        in_block = (sel_idx >= lo) & (sel_idx < lo + block_m)

        def go(_):
            tok = lo + jax.lax.broadcasted_iota(jnp.int32, (block_m, nq), 0)
            contrib = jnp.zeros((block_m, nq), jnp.float32)
            for k in range(top_k):          # static unroll
                hit = sel_idx[k:k + 1, :] == tok
                contrib = contrib + jnp.where(hit, w[k:k + 1, :], 0.0)
            for o in range(n_obj):
                v_blk = mv_ref[o, pl.ds(t * block_m, block_m), :]
                prec = (jax.lax.Precision.HIGHEST
                        if v_blk.dtype == jnp.float32
                        else jax.lax.Precision.DEFAULT)
                acc_ref[o, col, :] += jax.lax.dot_general(
                    contrib.astype(v_blk.dtype), v_blk,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec)
            return 0

        return jax.lax.cond(no_skip | jnp.any(in_block), go,
                            lambda _: 0, None)

    jax.lax.fori_loop(0, n_sub, body, 0)

    z = jnp.sum(w, axis=0)                  # [Qt]
    last = j == pl.num_programs(0) - 1
    acc = acc_ref[:, col, :]
    out_ref[:] = jnp.where(last, acc / z[None, :, None], acc)


@functools.partial(jax.jit,
                   static_argnames=("top_k", "block_q", "block_m",
                                    "readout_block_m", "sel_block_q",
                                    "sel_block_m", "interpret", "kcfg"))
def pallas_fused_readout(mk, qk, mv, top_k: int, valid_tokens=None,
                         block_q: int = 128, block_m: int = 4096,
                         readout_block_m: int | None = None,
                         sel_block_q: int | None = None,
                         sel_block_m: int | None = None,
                         interpret: bool = False,
                         kcfg=None):
    """Exact top-k attention readout, fully in two streaming kernels
    (tournament selection + index-scattered value sweep).

    mk [M, CK], qk [N, CK], mv [K_obj, M, CV]
    -> [K_obj, N, CV] in mv.dtype — the exact softmax readout of the
    tournament selection's candidate set (equal to
    ``ops.memory_attention.memory_readout`` up to score ties, which may
    resolve to different-but-equal-valued candidates across the two
    implementations' dot orderings).

    ``readout_block_m`` (default min(block_m, 2048)) bounds the value
    sweep's window: the [Bm, CV] mv blocks are double-buffered in VMEM
    alongside the [K, N_tile, CV] accumulator.

    ``sel_block_q``/``sel_block_m`` override the SELECTION pass's tile
    geometry independently of the readout's: the tournament is VPU-latency
    bound and wants fat query tiles (512x1024 measured ~2x faster than
    128x4096 on v5e, r3_sel_geometry), while the readout's contrib/skip
    granularity has its own optimum.  Defaults fall back to
    ``block_q``/``block_m``.

    ``kcfg``: an optional :class:`~eva_vos_tpu.kernels.config.KernelConfig`
    carrying the remaining knobs (method choices, tournament params,
    sorted-slot window, ablation flags) as a hashable static argument —
    jit-cache-correct, unlike the EVAVOS_* env vars (which remain only as
    process-start fallbacks for experiment scripts).
    """
    from .config import KernelConfig, resolve

    if kcfg is None:
        kcfg = KernelConfig()
    n, ck = qk.shape
    m = mk.shape[0]
    n_obj, _, cv = mv.shape
    scale = math.sqrt(ck)

    if sel_block_q is None or sel_block_m is None:
        # default the SELECTION pass to fat query tiles: the tournament is
        # VPU-latency bound and 512x1024 measured ~2x faster than the
        # readout's 128x4096 tiling on v5e (r3_sel_geometry,
        # r3_interactive_v5_fatsel) — fall back to the readout tiling on
        # devices whose scoped-VMEM budget can't fit the fat tile
        cand_q = sel_block_q or 512
        cand_m = sel_block_m or 1024
        try:
            if not interpret:
                validate_block_geometry(block_q=cand_q, block_m=cand_m,
                                        ck=ck, top_k=top_k,
                                        kernel="selection")
            sel_block_q, sel_block_m = cand_q, cand_m
        except ValueError:
            sel_block_q = sel_block_q or block_q
            sel_block_m = sel_block_m or block_m
    if readout_block_m is None:
        # coarse value blocks win across fills (r3_readout_sweep: 4096 beats
        # 512 by 1.4x at fill 72 — grid-step overhead dominates what finer
        # skip granularity saves); pick the largest block that fits the
        # scoped-VMEM budget for this object count (the [K, Bm, CV] value
        # window is double-buffered, so K=2 at 4096 would blow the budget)
        for cand in (4096, 2048, 1024, 512, 256, 128, block_m):
            if cand > block_m:
                continue
            readout_block_m = cand
            try:
                validate_block_geometry(block_q=block_q, block_m=cand,
                                        ck=ck, top_k=top_k, cv=cv,
                                        n_obj=n_obj, kernel="readout")
                break
            except ValueError:
                continue
    # one padded geometry serves both kernels; the selection and readout
    # bank/query block sizes must each divide their maximum (all powers of
    # two in practice)
    pad_unit = max(sel_block_m, readout_block_m)
    assert pad_unit % readout_block_m == 0 and pad_unit % sel_block_m == 0, (
        "sel_block_m and readout_block_m must divide their maximum")
    pad_q_unit = max(block_q, sel_block_q)
    assert (pad_q_unit % block_q == 0 and pad_q_unit % sel_block_q == 0), (
        "block_q and sel_block_q must divide their maximum")

    pad_n = (-n) % pad_q_unit
    pad_m = (-m) % pad_unit
    qk_p = jnp.pad(qk, ((0, pad_n), (0, 0)))
    mk_p = jnp.pad(mk, ((0, pad_m), (0, 0)))
    mv_p = jnp.pad(mv, ((0, 0), (0, pad_m), (0, 0)))
    msq = jnp.sum(mk_p.astype(jnp.float32) ** 2, axis=-1)
    valid = jnp.asarray(
        [m if valid_tokens is None else valid_tokens], jnp.int32)

    np_, mp_ = n + pad_n, m + pad_m

    # pass 1: exact streaming selection, transposed outputs [k, Np].
    # The per-block tournament is the production default: on-chip timing
    # (r3_batch2 kernels sweep, v5e) shows it 3.7x faster than the chunked
    # newest-first variant on clustered (realistic) 72-slot banks — the
    # per-block grid lets the running-tau skip drop a whole block's
    # compute, while the chunked kernel's in-kernel sub-block loop
    # serializes DMA and compute without the grid's double-buffering.
    # The chunked and resident variants remain via KernelConfig.sel_method
    # (or the EVAVOS_SEL_METHOD process-start env) as ablations.
    sel = resolve(kcfg.sel_method, "EVAVOS_SEL_METHOD", "tournament")
    select = {"resident": resident_topk_t, "tournament": tournament_topk_t,
              "chunked": chunked_topk_t}.get(sel, tournament_topk_t)
    sel_kw = {}
    if select is tournament_topk_t:
        sel_kw["defer_s"] = kcfg.tour_defer
    vals_t, idx_t = select(
        qk_p, mk_p, msq, valid, top_k=top_k, block_q=sel_block_q,
        block_m=sel_block_m, scale=scale, interpret=interpret,
        group=kcfg.tour_group, rounds=kcfg.tour_rounds,
        no_skip=kcfg.sel_notau, **sel_kw)

    rb = readout_block_m
    n_blocks = mp_ // rb
    if not interpret:
        validate_block_geometry(block_q=block_q, block_m=rb, ck=ck,
                                top_k=top_k, cv=cv, n_obj=n_obj,
                                kernel="readout")
        from .memory_topk import _vmem_limit_bytes

        scratch_bytes = 4 * n_obj * np_ * cv
        limit = _vmem_limit_bytes()
        if scratch_bytes > limit * 3 // 4:
            raise ValueError(
                f"fused readout accumulator [K={n_obj}, N={np_}, CV={cv}] "
                f"fp32 needs {scratch_bytes / 2**20:.0f} MiB VMEM scratch "
                f"(> {limit * 3 // 4 / 2**20:.0f} MiB available) — use "
                f"readout strategy 'scatter' for this many objects/queries")

    # the per-block grid readout is the production default: r3_batch2
    # on-chip timing shows it 3.2x faster than the chunked superblock
    # variant on clustered 72-slot banks (the ~12 us/grid-step scheduling
    # hypothesis behind the chunked design did not survive measurement —
    # the grid pipeline's DMA/compute overlap is worth more)
    method = resolve(kcfg.readout_method, "EVAVOS_READOUT_METHOD", "grid")
    ro_win = resolve(kcfg.ro_win, "EVAVOS_RO_WIN", 16)
    no_skip = bool(resolve(kcfg.readout_noskip, "EVAVOS_READOUT_NOSKIP",
                           False))
    if method == "chunked":
        # superblock DMA + in-kernel sub-chunk loop (ablation): one DMA
        # per superblock, sub-chunk loop inside the kernel.  The
        # superblock is sized to keep the double-buffered value window
        # within a fraction of scoped VMEM next to the whole-output
        # accumulator.
        from .memory_topk import _vmem_limit_bytes as _vlb

        # finer sub-chunks than the per-block grid's optimum: the r3
        # "coarse value blocks win" result (r3_readout_sweep) was grid-step
        # overhead, which the in-kernel loop removes — 1024-token chunks
        # make the contrib build 4x cheaper and the selected-id skip
        # 4x sharper at the same DMA width
        rb = min(rb, 1024)
        itemsize = jnp.dtype(mv_p.dtype).itemsize
        budget = _vlb() // 4
        rsuper = min(16384, budget // max(1, 2 * n_obj * cv * itemsize))
        rsuper -= rsuper % rb
        rsuper = max(rsuper, rb)
        extra = (-mp_) % rsuper
        if extra:
            mv_p = jnp.pad(mv_p, ((0, 0), (0, extra), (0, 0)))
        n_super = mv_p.shape[1] // rsuper
        out = pl.pallas_call(
            functools.partial(_scatter_readout_kernel_chunked, block_m=rb,
                              super_m=rsuper, block_q=block_q, top_k=top_k,
                              n_obj=n_obj, no_skip=no_skip),
            grid=(live_blocks(valid, rsuper, n_super, interpret),
                  np_ // block_q),
            in_specs=[
                pl.BlockSpec((n_obj, rsuper, cv), lambda j, i: (0, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((top_k, block_q), lambda j, i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((top_k, block_q), lambda j, i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_obj, block_q, cv),
                                   lambda j, i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_obj, np_, cv), jnp.float32),
            scratch_shapes=[pltpu.VMEM((n_obj, np_, cv), jnp.float32)],
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(mv_p, vals_t, idx_t)
        return out[:, :n].astype(mv.dtype)

    # bank block is the OUTER grid dim (query tiles inner): each mv block
    # is fetched once total; accumulation happens in a whole-output fp32
    # VMEM scratch (no output-revisit reads)
    out = pl.pallas_call(
        functools.partial(_scatter_readout_kernel, block_m=rb,
                          block_q=block_q, top_k=top_k, n_obj=n_obj,
                          ro_win=ro_win, no_skip=no_skip),
        grid=(live_blocks(valid, rb, n_blocks, interpret), np_ // block_q),
        in_specs=[
            pl.BlockSpec((n_obj, rb, cv), lambda j, i: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((top_k, block_q), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((top_k, block_q), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_obj, block_q, cv), lambda j, i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_obj, np_, cv), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_obj, np_, cv), jnp.float32),
                        pltpu.VMEM((-(-top_k // 8) * 8, np_), jnp.float32),
                        pltpu.VMEM((-(-top_k // 8) * 8, np_), jnp.int32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(mv_p, vals_t, idx_t)

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

"""Pallas TPU kernel: streaming top-k memory affinity.

The XLA path (``ops.memory_attention``) materializes the [N, M] score
matrix in HBM before ``lax.top_k``.  This kernel streams the memory bank
through VMEM in blocks: for each query tile it computes the block's scores
on the MXU and merges the block's top-k with a running top-k carried in
VMEM scratch — HBM traffic drops from O(N*M) score bytes to the memory
bank itself.

Exact semantics: identical candidate set as a global top-k.  Merging block
top-k lists preserves the final top-k because any global top-k element is
necessarily in its own block's top-k.  Ties resolve toward lower indices
(blocks are scanned in order and the merge prefers the incumbent on equal
values), matching ``lax.top_k``.

Three variants (``method=``):
* ``grid`` (production): memory blocks are the fastest-varying GRID
  dimension — Mosaic pipelines the block DMAs; a running top-k lives in
  VMEM scratch across grid steps; blocks past the bank fill pointer skip
  both scoring and merging via ``pl.when``.
* ``iterative``: in-kernel ``fori_loop`` over blocks with an end-merge.
* ``sort``: ``lax.top_k`` inside the kernel — unimplemented in Mosaic on
  TPU (kept as the interpret-mode reference).

Selection is sort-free: k (max, argmax, mask-out) passes per block.
Scores accumulate in fp32; on fp32 inputs the dots use Precision.HIGHEST
(the default MXU fp32 path rounds through bf16 and perturbs selection).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Mosaic's default scoped-VMEM budget is 16 MB; newer TPU generations have
# 128 MB.  Raising the cap admits bigger memory blocks (fewer grid steps ->
# fewer running top-k merges, the selection kernel's serial VPU cost) while
# leaving room for double-buffered DMAs.  The cap is derived from the local
# device generation (ADVICE r2: a hardcoded 96 MB fails to compile on
# 16 MB-VMEM parts) and can be overridden with EVAVOS_VMEM_LIMIT_MB.
_VMEM_TOTAL_MB = {  # per-core VMEM by device_kind prefix
    "TPU v2": 16, "TPU v3": 16, "TPU v4": 128, "TPU v5": 128,
    "TPU v6": 128, "TPU7": 128,
}


def _vmem_limit_bytes() -> int:
    import os

    env = os.environ.get("EVAVOS_VMEM_LIMIT_MB")
    if env:
        return int(env) * 1024 * 1024
    total_mb = None
    try:
        kind = jax.devices()[0].device_kind
        for prefix, mb in _VMEM_TOTAL_MB.items():
            if kind.startswith(prefix):
                total_mb = mb
                break
    except Exception:
        pass
    if total_mb is None:
        total_mb = 16  # Mosaic default on unknown parts
    # leave 1/4 headroom for Mosaic's own buffers / DMA double-buffering
    return (total_mb * 3 // 4) * 1024 * 1024


VMEM_LIMIT = None  # resolved lazily (jax.devices() at import time is costly)


def _compiler_params():
    global VMEM_LIMIT
    if VMEM_LIMIT is None:
        VMEM_LIMIT = _vmem_limit_bytes()
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


def validate_block_geometry(*, block_q: int, block_m: int, ck: int,
                            top_k: int, cv: int = 0, n_obj: int = 0,
                            kernel: str = "selection",
                            cand_rows: int = 0) -> None:
    """Cheap VMEM-footprint estimate; raises a descriptive ValueError for
    block geometries that cannot fit the scoped-VMEM budget (ADVICE r2:
    oversized blocks otherwise surface as opaque backend JaxRuntimeErrors
    — the r2_dyngrid_sweep log shows block_q=512 and block_m=8192 dying
    deep in Mosaic).  The model counts the major VMEM residents: the
    double-buffered bank blocks, the [block_m, block_q] fp32 score tile
    (x3 for elementwise intermediates), candidate/output buffers, and for
    the readout kernel the double-buffered value blocks + fp32 accumulator.
    """
    import os

    if os.environ.get("EVAVOS_SKIP_VALIDATE"):
        return  # experimental geometries: let Mosaic/the runtime decide
    limit = _vmem_limit_bytes()
    f32 = 4
    # Empirical calibration on v5e at the 96 MiB cap (r2_dyngrid_sweep):
    # the selection kernel compiles at a 128x4096 score tile and dies at
    # 128x8192 / 512x4096; the readout runs at 128x2048 and dies at
    # 256x4096.  Mosaic's live set is therefore ~dozens of fp32 words per
    # score element (tournament rounds + escalation branch + gated
    # contrib all co-resident), so gate on the score-tile element count,
    # scaled by the device's scoped budget.
    max_elems = (1 << 19) * limit // (96 * 1024 * 1024)
    elems = block_m * block_q
    # plus the kernel's statically-sized residents must leave room
    fixed = 2 * block_m * ck * f32 + block_m * f32 + block_q * ck * f32
    fixed += 4 * top_k * block_q * f32
    # deferred-merge candidate scratch (vals + idx), ADVICE r4: at
    # block_m=8192 / defer 8 / block_q=512 this is ~12.6 MB — geometries
    # must not pass validation and then die in Mosaic
    fixed += 2 * cand_rows * block_q * f32
    if kernel == "readout":
        fixed += 2 * n_obj * block_m * cv * f32     # mv double-buffered
        fixed += n_obj * block_q * cv * f32         # fp32 accumulator
    if elems > max_elems or fixed > limit // 2:
        raise ValueError(
            f"pallas {kernel} kernel block geometry (block_q={block_q}, "
            f"block_m={block_m}, top_k={top_k}, ck={ck}"
            + (f", cv={cv}, n_obj={n_obj}" if kernel == "readout" else "")
            + f") exceeds the ~{limit / 2**20:.0f} MiB scoped-VMEM budget "
            f"on this device (score tile {elems} elems > {max_elems}, or "
            f"fixed buffers {fixed / 2**20:.1f} MiB) — shrink "
            f"block_m/block_q (or raise EVAVOS_VMEM_LIMIT_MB if the device "
            f"allows)")


def _merge_topk(run_vals, run_idx, new_vals, new_idx, k):
    """Merge two [Q, k] sorted-descending candidate sets -> top-k.

    Prefers lower indices on ties by re-sorting on (value, -index) — the
    concatenation keeps incumbents first, and jax.lax.top_k is stable.
    """
    vals = jnp.concatenate([run_vals, new_vals], axis=1)
    idx = jnp.concatenate([run_idx, new_idx], axis=1)
    top_vals, pos = jax.lax.top_k(vals, k)
    top_idx = jnp.take_along_axis(idx, pos, axis=1)
    return top_vals, top_idx


def _extract_topk(scores, payload, k, base=None):
    """Iterative k-max extraction over the last axis — no sort, no gather.

    k (max, argmax, mask-out) passes on VMEM-resident data cost far less
    than the O(M log^2 M) sort XLA lowers ``top_k`` to (measured 9.5 ms per
    frame at [1620, 16200] on v5e — 85% of the whole propagation step).
    Ties pick the lowest index (argmax first-match), identical to lax.top_k.
    The per-element ``payload`` (global token id) rides along via a masked
    reduction, avoiding gathers that Mosaic may not lower.

    scores [Q, B] fp32, payload [Q, B] int32
    -> ([Q, k] vals desc, [Q, k] payload of the selected elements).
    """
    q, b = scores.shape
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (q, b), 1)
    out_slot = jax.lax.broadcasted_iota(jnp.int32, (q, k), 1)
    consecutive = base is not None  # token ids are base + column

    def body(j, carry):
        scores, vals, idx = carry
        m = jnp.max(scores, axis=1)                          # [Q]
        am = jnp.argmax(scores, axis=1).astype(jnp.int32)    # [Q]
        hit = col_ids == am[:, None]
        if consecutive:
            # consecutive ids — derive from argmax, no reduction needed
            pay = am + base
        else:
            pay = jnp.sum(jnp.where(hit, payload, 0), axis=1)  # [Q]
        vals = jnp.where(out_slot == j, m[:, None], vals)
        idx = jnp.where(out_slot == j, pay[:, None], idx)
        scores = jnp.where(hit, NEG_INF, scores)
        return scores, vals, idx

    vals0 = jnp.full((q, k), NEG_INF, jnp.float32)
    idx0 = jnp.zeros((q, k), jnp.int32)
    _, vals, idx = jax.lax.fori_loop(0, k, body, (scores, vals0, idx0))
    return vals, idx


def _kernel_iter(qk_ref, mk_ref, msq_ref, valid_ref, vals_ref, idx_ref, *,
                 block_m: int, top_k: int, scale: float):
    """Sort-free variant: per-block iterative extraction; candidates from
    all blocks accumulate into one buffer and merge ONCE at the end (one
    extra extraction instead of one per block).  Blocks entirely past the
    bank's fill pointer are skipped outright — with the engine's fixed-size
    bank the valid prefix is usually a fraction of Mmax."""
    m_total = mk_ref.shape[0]
    n_blocks = m_total // block_m
    q = qk_ref[:]
    nq = q.shape[0]

    cand_vals0 = jnp.full((nq, n_blocks * top_k), NEG_INF, jnp.float32)
    cand_idx0 = jnp.zeros((nq, n_blocks * top_k), jnp.int32)
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (nq, n_blocks * top_k), 1)

    def body(b, carry):
        cand_vals, cand_idx = carry

        def live(_):
            mk_blk = mk_ref[pl.ds(b * block_m, block_m), :]
            msq_blk = msq_ref[pl.ds(b * block_m, block_m)]
            # fp32 inputs need HIGHEST (default MXU fp32 rounds via bf16 and
            # perturbs the selection); bf16 inputs use the native bf16 MXU
            # path with fp32 accumulation — identical to the XLA reference
            # op on the same inputs. Mosaic rejects HIGHEST on bf16 lhs.
            prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT)
            dot = jax.lax.dot_general(
                q, mk_blk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)
            scores = (2.0 * dot - msq_blk[None, :]) / scale
            token_ids = b * block_m + jax.lax.broadcasted_iota(
                jnp.int32, (nq, block_m), 1)
            scores = jnp.where(token_ids < valid_ref[0], scores, NEG_INF)
            blk_vals, blk_idx = _extract_topk(scores, None, top_k,
                                              base=b * block_m)
            in_slot = (slot_ids >= b * top_k) & (slot_ids < (b + 1) * top_k)
            placed_v = _place_block(blk_vals, b, top_k, n_blocks * top_k)
            placed_i = _place_block(blk_idx.astype(jnp.float32), b, top_k,
                                    n_blocks * top_k)
            cv = jnp.where(in_slot, placed_v, cand_vals)
            ci = jnp.where(in_slot, placed_i.astype(jnp.int32), cand_idx)
            return cv, ci

        # skip blocks entirely beyond the valid prefix
        return jax.lax.cond(b * block_m < valid_ref[0], live,
                            lambda _: (cand_vals, cand_idx), None)

    cand_vals, cand_idx = jax.lax.fori_loop(0, n_blocks, body,
                                            (cand_vals0, cand_idx0))
    # final exact merge over all block candidates (ties -> lower slot ->
    # lower block -> lower token index, the lax.top_k rule)
    vals, idx = _extract_topk(cand_vals, cand_idx, top_k)
    vals_ref[:] = vals
    idx_ref[:] = idx


def _place_block(x, b, k, width):
    """Shift x's k columns to offset ``b*k`` in a width-col buffer via a
    one-hot matmul (Mosaic rejects ``pltpu.roll`` with a traced shift; a
    [k, width] one-hot built from iotas + one tiny dot is vector-friendly).
    Token-index payloads ride as fp32 — exact below 2^24.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, width), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, width), 1)
    onehot = (cols == rows + b * k).astype(jnp.float32)
    # HIGHEST is essential: the default MXU fp32 path rounds through bf16,
    # corrupting both candidate scores and integer payloads (> 256).
    return jax.lax.dot_general(
        x.astype(jnp.float32), onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _kernel(qk_ref, mk_ref, msq_ref, valid_ref, vals_ref, idx_ref, *,
            block_m: int, top_k: int, scale: float):
    m_total = mk_ref.shape[0]
    n_blocks = m_total // block_m
    q = qk_ref[:]                                   # [Qt, CK]

    run_vals = jnp.full((q.shape[0], top_k), NEG_INF, jnp.float32)
    run_idx = jnp.zeros((q.shape[0], top_k), jnp.int32)

    def body(b, carry):
        run_vals, run_idx = carry
        mk_blk = mk_ref[pl.ds(b * block_m, block_m), :]      # [Bm, CK]
        msq_blk = msq_ref[pl.ds(b * block_m, block_m)]       # [Bm]
        # same dtype-dependent precision rule as the other variants / the
        # XLA oracle: fp32 needs HIGHEST or the MXU rounds through bf16 and
        # can perturb top-k selection
        prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        dot = jax.lax.dot_general(
            q, mk_blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        scores = (2.0 * dot - msq_blk[None, :]) / scale      # [Qt, Bm]

        token_ids = b * block_m + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_m), 1)
        scores = jnp.where(token_ids < valid_ref[0], scores, NEG_INF)

        blk_vals, blk_idx = jax.lax.top_k(scores, top_k)
        blk_idx = blk_idx + b * block_m
        return _merge_topk(run_vals, run_idx, blk_vals,
                           blk_idx.astype(jnp.int32), top_k)

    run_vals, run_idx = jax.lax.fori_loop(0, n_blocks, body,
                                          (run_vals, run_idx))
    vals_ref[:] = run_vals
    idx_ref[:] = run_idx


def _kernel_grid(qk_ref, mk_ref, msq_ref, valid_ref, vals_ref, idx_ref,
                 run_vals, run_idx, *, block_m: int, top_k: int,
                 scale: float):
    """Grid-pipelined variant: the memory-block loop is a GRID dimension
    (fastest-varying), so Mosaic double-buffers the mk block DMAs across
    steps.  A running top-k lives in VMEM scratch (which persists across
    grid steps): each LIVE block extracts its top-k and merges with the
    running set over just 2k columns — dead blocks (past the bank fill
    pointer) skip both, so big mostly-empty banks cost almost nothing.
    Ties keep incumbents (earlier blocks -> lower indices), the lax.top_k
    rule."""
    j = pl.program_id(1)
    q = qk_ref[:]
    nq = q.shape[0]

    @pl.when(j == 0)
    def _():
        run_vals[:] = jnp.full((nq, top_k), NEG_INF, jnp.float32)
        run_idx[:] = jnp.zeros((nq, top_k), jnp.int32)

    @pl.when(j * block_m < valid_ref[0])
    def _():
        prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        dot = jax.lax.dot_general(
            q, mk_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        scores = (2.0 * dot - msq_ref[:][None, :]) / scale
        token_ids = j * block_m + jax.lax.broadcasted_iota(
            jnp.int32, (nq, block_m), 1)
        scores = jnp.where(token_ids < valid_ref[0], scores, NEG_INF)
        blk_vals, blk_idx = _extract_topk(scores, None, top_k,
                                          base=j * block_m)
        cand_vals = jnp.concatenate([run_vals[:], blk_vals], axis=1)
        cand_idx = jnp.concatenate([run_idx[:], blk_idx], axis=1)
        mvals, midx = _extract_topk(cand_vals, cand_idx, top_k)
        run_vals[:] = mvals
        run_idx[:] = midx

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        vals_ref[:] = run_vals[:]
        idx_ref[:] = run_idx[:]


def _extract_topk_rows(scores, ids, k):
    """Iterative k-max extraction over axis 0 (token-major orientation).

    scores [C, Q] fp32, ids [C, Q] int32 (global token ids).
    Ties resolve to the LOWEST id via an explicit min-id reduction (not
    buffer position), so candidate buffers may be assembled in any order.
    Returns (vals [k, Q] desc, idx [k, Q]).
    """
    c, q = scores.shape
    big = jnp.int32(2 ** 30)
    out_row = jax.lax.broadcasted_iota(jnp.int32, (k, q), 0)

    def body(t, carry):
        scores, vals, idx = carry
        m = jnp.max(scores, axis=0)                           # [Q]
        tie = scores == m[None, :]
        pay = jnp.min(jnp.where(tie, ids, big), axis=0)       # [Q]
        hit = tie & (ids == pay[None, :])
        vals = jnp.where(out_row == t, m[None, :], vals)
        idx = jnp.where(out_row == t, pay[None, :], idx)
        scores = jnp.where(hit, NEG_INF, scores)
        return scores, vals, idx

    vals0 = jnp.full((k, q), NEG_INF, jnp.float32)
    idx0 = jnp.zeros((k, q), jnp.int32)
    # unroll: each iteration is a short serially-dependent op chain; rolled
    # fori_loop iterations cost ~1us fixed overhead each on the TPU scalar
    # core, which dominates the whole selection at production geometry
    _, vals, idx = jax.lax.fori_loop(0, k, body, (scores, vals0, idx0),
                                     unroll=True)
    return vals, idx


def _kernel_tournament(qk_ref, mk_ref, msq_ref, valid_ref, vals_ref, idx_ref,
                       run_vals, run_idx, cand_vals, cand_idx, buffered, *,
                       block_m: int, top_k: int, scale: float, rounds: int,
                       group: int, no_skip: bool = False, defer_s: int = 0):
    """Tournament variant: the per-block top-k extraction is the engine's
    VPU bottleneck (k sequential full-width max/argmax/mask passes — 85% of
    a blocked propagation step).  Everything runs TRANSPOSED — scores
    [Bm, Qt] with queries on lanes — so the token axis can be split on the
    MAJOR dimension ([G, group, Qt], a free shape cast; Mosaic rejects
    lane-dim splits):

    1. a token-group tournament: ``rounds`` max/argmax/mask passes over the
       group axis pull the top-R of every ``group``-token segment — R
       full-size passes instead of k,
    2. an exact top-k extraction over the G*R candidates (group/``rounds``
       times smaller), ties resolved by explicit min-id,
    3. a VERIFICATION count: tau = k-th candidate value; if
       #{s >= tau} == #{candidates >= tau} for every query, the candidate
       set provably contains every element >= tau, so the selection is
       exact (including lax.top_k tie order via the min-id rule),
    4. an ESCALATION fallback (lax.cond) to the full-size extraction for
       the rare tile where a single group hides more than ``rounds``
       global winners.

    ~6x fewer VPU ops than the grid kernel at production geometry, still
    bit-exact against the XLA oracle.

    DEFERRED MERGES (``defer_s`` > 1, r4): the r4_sel_attrib breakdown
    shows the per-block merge extraction (+9.0 ms) and the per-block
    count-verify (+6.9 ms) together cost more than the tournament itself
    (+8.5 ms) at fill-72.  v2 replaces both per-block steps on the common
    path with one RESIDUAL-MAX safe check (a single [G, Qt] pass):

      resid[g] = max of the group's UNextracted scores (free from the
      tournament's masked residual); safe = all(resid < tau_run).

    tau_run (the incumbent k-th value) only ever rises toward the final
    tau, so ``resid < tau_run <= tau_fin`` proves every element of this
    block worth >= tau_fin — even a tie at tau_fin, which the strict <
    covers — is among its ``rounds``-per-group candidates.  Safe blocks
    just append their candidates to a ``defer_s``-block buffer; ONE
    extraction per window merges buffer + incumbents ((S*R*G + k) * k
    rows per S blocks instead of (R*G + k) * k per block).  Unsafe blocks
    (cold tau early on, or a dense group) take the original per-block
    merge + count-verify + escalation chain, so exactness never rests on
    the safe check being common — only the speed does.
    """
    j = pl.program_id(1)
    q = qk_ref[:]                                             # [Qt, CK]
    nq = q.shape[0]
    g = block_m // group
    n_cand = rounds * g

    @pl.when(j == 0)
    def _():
        run_vals[:] = jnp.full((top_k, nq), NEG_INF, jnp.float32)
        run_idx[:] = jnp.zeros((top_k, nq), jnp.int32)
        if defer_s > 1:
            cand_vals[:] = jnp.full((defer_s * n_cand, nq), NEG_INF,
                                    jnp.float32)
            cand_idx[:] = jnp.zeros((defer_s * n_cand, nq), jnp.int32)
            buffered[0] = 0

    @pl.when(j * block_m < valid_ref[0])
    def _():
        prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        dot = jax.lax.dot_general(
            mk_ref[:], q, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        scores = (2.0 * dot - msq_ref[:][:, None]) / scale    # [Bm, Qt]
        # validity depends only on the token row: keep the iota [Bm, 1] and
        # broadcast (a [Bm, Qt] int32 buffer costs 4 MB VMEM at Bm=8192)
        tok_col = j * block_m + jax.lax.broadcasted_iota(
            jnp.int32, (block_m, 1), 0)
        scores = jnp.where(tok_col < valid_ref[0], scores, NEG_INF)

        # running-tau block skip (STATUS r2 roadmap #1): a block whose every
        # score is <= the running k-th value cannot change the selection —
        # a new token tying tau loses to the incumbent's lower id (blocks
        # ascend, the lax.top_k rule), so strict > is the exact condition.
        # Warm interactive banks skip most blocks at two VPU passes each
        # (compare + any) instead of the full tournament + extraction.
        tau_run = run_vals[top_k - 1:top_k, :]                # [1, Qt]

        @pl.when(no_skip | jnp.any(scores > tau_run))
        def _():
            sub_ids = jax.lax.broadcasted_iota(jnp.int32, (1, group, 1), 1)
            base = j * block_m + group * jax.lax.broadcasted_iota(
                jnp.int32, (g, nq), 0)

            def tourney(s3, n):
                """n max/argmax/mask passes over the group axis; returns the
                masked residual and the [n*G, Qt] extracted candidates."""
                vs, ids = [], []
                for _ in range(n):
                    m = jnp.max(s3, axis=1)                        # [G, Qt]
                    am = jnp.argmax(s3, axis=1).astype(jnp.int32)  # [G, Qt]
                    vs.append(m)
                    ids.append(base + am)
                    s3 = jnp.where(sub_ids == am[:, None, :], NEG_INF, s3)
                return (s3, jnp.concatenate(vs, axis=0),
                        jnp.concatenate(ids, axis=0))

            s3a, cv1, ci1 = tourney(scores.reshape(g, group, nq), rounds)

            # residual maxima: resid[g] = the best score the tournament did
            # NOT extract from group g.  "resid < tau" is EQUIVALENT to the
            # r3 count-verify (n_ge == c_ge over the full block): both say
            # exactly "no unextracted element >= tau" — but the residual
            # check is one [G, group, Qt] max over the already-masked
            # scores instead of two full compare+sum passes (r4_sel_attrib:
            # the per-block count-verify cost +6.9 ms at fill 72).
            resid1 = jnp.max(s3a, axis=1)                      # [G, Qt]

            def merge_now():
                # per-block merge + residual-verify + escalation (with
                # deferral this is only the UNSAFE-block fallback).
                # ONE extraction over block candidates + incumbents yields
                # the merged top-k directly; the min-id tie rule makes the
                # buffer order irrelevant.
                cat_v = jnp.concatenate([cv1, run_vals[:]], axis=0)
                cat_i = jnp.concatenate([ci1, run_idx[:]], axis=0)
                mv1, mi1 = _extract_topk_rows(cat_v, cat_i, top_k)

                def verified(mv, resid):
                    # every unextracted element is <= resid; resid < tau_m
                    # proves every block element >= tau_m is a candidate,
                    # so the merged set contains every global winner from
                    # this block (ties AT tau_m escalate conservatively,
                    # same as the count-verify they replace)
                    tau_m = mv[top_k - 1:top_k, :]             # [1, Qt]
                    return jnp.all(resid < tau_m)

                def level2(_):
                    # some group hid > ``rounds`` of this tile's winners:
                    # deepen the tournament by ``rounds`` more passes
                    # (top-2R per group) and re-verify — ~10x cheaper than
                    # the full [Bm + k, Qt] extraction the r2 kernel
                    # escalated straight to
                    s3b, cv2, ci2 = tourney(s3a, rounds)
                    cat2_v = jnp.concatenate([cv1, cv2, run_vals[:]],
                                             axis=0)
                    cat2_i = jnp.concatenate([ci1, ci2, run_idx[:]],
                                             axis=0)
                    mv2, mi2 = _extract_topk_rows(cat2_v, cat2_i, top_k)

                    def full(_):
                        tok = j * block_m + jax.lax.broadcasted_iota(
                            jnp.int32, (block_m, nq), 0)
                        full_v = jnp.concatenate([scores, run_vals[:]],
                                                 axis=0)
                        full_i = jnp.concatenate([tok, run_idx[:]], axis=0)
                        return _extract_topk_rows(full_v, full_i, top_k)

                    return jax.lax.cond(
                        verified(mv2, jnp.max(s3b, axis=1)),
                        lambda _: (mv2, mi2), full, None)

                mvals, midx = jax.lax.cond(
                    verified(mv1, resid1), lambda _: (mv1, mi1), level2,
                    None)
                run_vals[:] = mvals
                run_idx[:] = midx

            if defer_s > 1:
                # deferred merge: resid < tau_run (strict; tau_run only
                # rises toward the final tau) proves every potential winner
                # of this block is among cv1 — buffer and defer the merge.
                safe = jnp.all(resid1 < tau_run)

                @pl.when(safe)
                def _():
                    slot = (j % defer_s) * n_cand
                    cand_vals[pl.ds(slot, n_cand), :] = cv1
                    cand_idx[pl.ds(slot, n_cand), :] = ci1
                    buffered[0] = 1

                @pl.when(~safe)
                def _():
                    merge_now()
            else:
                merge_now()

    if defer_s > 1:
        window_end = ((j % defer_s) == defer_s - 1) | (
            j == pl.num_programs(1) - 1)

        # ADVICE r4: the window-end extraction is a full
        # (defer_s*rounds*g + k)-row, k-pass merge — running it even for
        # windows where every block tau-skipped (the common case on warm
        # banks) cost ~2x at fill 72 (r4_defer_timing.json).  The SMEM
        # ``buffered`` flag gates it to windows that actually buffered.
        @pl.when(window_end & (buffered[0] > 0))
        def _():
            cat_v = jnp.concatenate([cand_vals[:], run_vals[:]], axis=0)
            cat_i = jnp.concatenate([cand_idx[:], run_idx[:]], axis=0)
            mvals, midx = _extract_topk_rows(cat_v, cat_i, top_k)
            run_vals[:] = mvals
            run_idx[:] = midx
            cand_vals[:] = jnp.full((defer_s * n_cand, nq), NEG_INF,
                                    jnp.float32)
            buffered[0] = 0

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        vals_ref[:] = run_vals[:]
        idx_ref[:] = run_idx[:]


def _kernel_tournament_chunked(order_ref, qk_ref, mk_ref, msq_ref, valid_ref,
                               vals_ref, idx_ref, run_vals, run_idx, *,
                               block_m: int, super_m: int, top_k: int,
                               scale: float, rounds: int, group: int,
                               no_skip: bool = False):
    """Chunked tournament: same selection math as ``_kernel_tournament``
    but the memory-axis grid step moves a SUPERBLOCK (``super_m`` tokens,
    one big pipelined DMA) and an in-kernel ``fori_loop`` walks its
    ``block_m``-token sub-blocks.  Two structural wins over the per-block
    grid at warm interactive banks (fill 72 = 114 blocks x 16 query tiles
    = 1824 grid steps at ~12 us each — pure scheduling overhead):

    * grid steps drop ``super_m / block_m``-fold; the sub-block loop costs
      ~1 us per iteration instead of a Mosaic grid step,
    * the bank is processed NEWEST-FIRST (superblocks reversed via the
      scalar-prefetched ``order`` map, sub-blocks reversed in the loop).
      Propagation queries are temporally adjacent to the most recent
      admissions, so the running top-k's tau converges after the first
      sub-blocks and the remaining (old, low-affinity) sub-blocks skip at
      one compare+any pass each.

    Out-of-order exactness: the merge resolves ties by explicit MIN TOKEN
    ID (``_extract_topk_rows``), so candidate arrival order is irrelevant;
    the skip uses ``>=`` (not ``>``) so a sub-block holding a token that
    TIES the running tau is still processed and the min-id rule picks the
    lax.top_k winner.  A global winner w can never be skipped: tau_run is
    the k-th best of a candidate SUBSET, hence tau_run <= tau* <= score(w)
    whenever w is in the exact top-k.  The verify/escalate ladder is the
    same as the in-order kernel's.
    """
    j = pl.program_id(1)
    q = qk_ref[:]                                             # [Qt, CK]
    nq = q.shape[0]
    n_sub = super_m // block_m
    sb = order_ref[j]                       # bank superblock this step holds
    g = block_m // group
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    @pl.when(j == 0)
    def _():
        run_vals[:] = jnp.full((top_k, nq), NEG_INF, jnp.float32)
        run_idx[:] = jnp.zeros((top_k, nq), jnp.int32)

    def body(t, carry):
        s = n_sub - 1 - t                   # newest sub-block first
        base_tok = sb * super_m + s * block_m

        def live(_):
            mk_blk = mk_ref[pl.ds(s * block_m, block_m), :]
            msq_blk = msq_ref[pl.ds(s * block_m, block_m)]
            dot = jax.lax.dot_general(
                mk_blk, q, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            scores = (2.0 * dot - msq_blk[:, None]) / scale   # [Bm, Qt]
            tok_col = base_tok + jax.lax.broadcasted_iota(
                jnp.int32, (block_m, 1), 0)
            scores = jnp.where(tok_col < valid_ref[0], scores, NEG_INF)

            tau_run = run_vals[top_k - 1:top_k, :]            # [1, Qt]

            def process(_):
                sub_ids = jax.lax.broadcasted_iota(
                    jnp.int32, (1, group, 1), 1)
                base = base_tok + group * jax.lax.broadcasted_iota(
                    jnp.int32, (g, nq), 0)

                def tourney(s3, n):
                    vs, ids = [], []
                    for _ in range(n):
                        m = jnp.max(s3, axis=1)
                        am = jnp.argmax(s3, axis=1).astype(jnp.int32)
                        vs.append(m)
                        ids.append(base + am)
                        s3 = jnp.where(sub_ids == am[:, None, :],
                                       NEG_INF, s3)
                    return (s3, jnp.concatenate(vs, axis=0),
                            jnp.concatenate(ids, axis=0))

                s3a, cv1, ci1 = tourney(scores.reshape(g, group, nq), rounds)
                cat_v = jnp.concatenate([cv1, run_vals[:]], axis=0)
                cat_i = jnp.concatenate([ci1, run_idx[:]], axis=0)
                mv1, mi1 = _extract_topk_rows(cat_v, cat_i, top_k)

                def verified(mv, block_cv):
                    tau_m = mv[top_k - 1:top_k, :]
                    n_ge = jnp.sum((scores >= tau_m).astype(jnp.float32),
                                   axis=0)
                    c_ge = jnp.sum((block_cv >= tau_m).astype(jnp.float32),
                                   axis=0)
                    return jnp.all(n_ge == c_ge)

                def level2(_):
                    _, cv2, ci2 = tourney(s3a, rounds)
                    cat2_v = jnp.concatenate([cv1, cv2, run_vals[:]], axis=0)
                    cat2_i = jnp.concatenate([ci1, ci2, run_idx[:]], axis=0)
                    mv2, mi2 = _extract_topk_rows(cat2_v, cat2_i, top_k)

                    def full(_):
                        tok = base_tok + jax.lax.broadcasted_iota(
                            jnp.int32, (block_m, nq), 0)
                        full_v = jnp.concatenate([scores, run_vals[:]],
                                                 axis=0)
                        full_i = jnp.concatenate([tok, run_idx[:]], axis=0)
                        return _extract_topk_rows(full_v, full_i, top_k)

                    return jax.lax.cond(
                        verified(mv2, jnp.concatenate([cv1, cv2], axis=0)),
                        lambda _: (mv2, mi2), full, None)

                mvals, midx = jax.lax.cond(
                    verified(mv1, cv1), lambda _: (mv1, mi1), level2, None)
                run_vals[:] = mvals
                run_idx[:] = midx
                return 0

            return jax.lax.cond(no_skip | jnp.any(scores >= tau_run),
                                process, lambda _: 0, None)

        return jax.lax.cond(base_tok < valid_ref[0], live, lambda _: 0, None)

    jax.lax.fori_loop(0, n_sub, body, 0)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        vals_ref[:] = run_vals[:]
        idx_ref[:] = run_idx[:]


def chunked_topk_t(qk_p, mk_p, msq, valid, *, top_k: int, block_q: int,
                   block_m: int, super_m: int = 16384, scale: float,
                   interpret: bool = False, group: int | None = None,
                   rounds: int | None = None, no_skip: bool | None = None):
    """Chunked newest-first tournament selection on PRE-PADDED inputs; same
    contract as ``tournament_topk_t`` (TRANSPOSED outputs [top_k, Np]).
    ``block_m`` is the compute sub-block; ``super_m`` the per-grid-step DMA
    window (clamped to the padded bank and kept a multiple of block_m)."""
    np_, ck = qk_p.shape
    mp_ = mk_p.shape[0]
    if not interpret:
        validate_block_geometry(block_q=block_q, block_m=block_m, ck=ck,
                                top_k=top_k, kernel="selection")
        # the double-buffered key superblock must leave the scoped budget
        # mostly free for the score tile + tournament temporaries
        itemsize = jnp.dtype(mk_p.dtype).itemsize
        cap = _vmem_limit_bytes() // 4 // max(1, 2 * ck * itemsize)
        super_m = min(super_m, max(block_m, cap - cap % block_m))
    super_m = min(super_m, mp_)
    super_m -= super_m % block_m
    super_m = max(super_m, block_m)
    if mp_ % super_m:
        # wrapper pads the bank to a block_m multiple; round up to super_m
        extra = (-mp_) % super_m
        mk_p = jnp.pad(mk_p, ((0, extra), (0, 0)))
        msq = jnp.pad(msq, ((0, extra),))
        mp_ = mk_p.shape[0]
    n_super = mp_ // super_m
    from .config import resolve

    genv = resolve(group, "EVAVOS_TOUR_GROUP", 0)
    group = 128 if block_m % 128 == 0 else block_m
    if genv and block_m % genv == 0:
        group = genv
    g = block_m // group
    # r6 <= r8 at every measured fill (r3_tour_params); see tournament_topk_t
    rounds = resolve(rounds, "EVAVOS_TOUR_ROUNDS", 0) or max(6, -(-top_k // g))
    no_skip = bool(resolve(no_skip, "EVAVOS_SEL_NOTAU", False))

    live_sb = live_blocks(valid, super_m, n_super, interpret)
    if interpret:
        order = jnp.arange(n_super, dtype=jnp.int32)[::-1]
    else:
        order = jnp.maximum(
            live_sb - 1 - jnp.arange(n_super, dtype=jnp.int32), 0)
    return pl.pallas_call(
        functools.partial(_kernel_tournament_chunked, block_m=block_m,
                          super_m=super_m, top_k=top_k, scale=scale,
                          rounds=rounds, group=group, no_skip=no_skip),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(np_ // block_q, live_sb),
            in_specs=[
                pl.BlockSpec((block_q, ck), lambda i, j, order: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((super_m, ck),
                             lambda i, j, order: (order[j], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((super_m,), lambda i, j, order: (order[j],),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((top_k, block_q), lambda i, j, order: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((top_k, block_q), lambda i, j, order: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((top_k, block_q), jnp.float32),
                pltpu.VMEM((top_k, block_q), jnp.int32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((top_k, np_), jnp.float32),
            jax.ShapeDtypeStruct((top_k, np_), jnp.int32),
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(order, qk_p, mk_p, msq, valid)


def _kernel_resident(qk_ref, mk_ref, msq_ref, valid_ref, vals_ref, idx_ref,
                     cand_v, cand_i, *, block_m: int, top_k: int,
                     scale: float, rounds: int, group: int):
    """Resident-bank variant: the WHOLE key bank lives in VMEM (16 MB bf16
    at the production 78-slot/480p geometry — a fraction of a v4+/v5 core's
    128 MB), the grid is query tiles ONLY, and the memory-block loop runs
    in-kernel.  This removes the tournament kernel's two big warm-bank
    costs measured in r3_kernel_bench: the per-(block, tile) grid-step
    overhead (~12 us x 29 blocks x 13 tiles at fill 72) and the per-live-
    block k-pass merge (the running top-k is gone entirely):

    1. per live block (predicated ``cond`` — dead blocks cost nothing, no
       DMA either since the bank is resident): ``rounds`` tournament
       passes pull the top-R of every ``group``-token segment straight
       into a candidate scratch slice — no merging, no extraction,
    2. ONE exact extraction per query tile over all accumulated candidates
       (ties -> lowest token id, the lax.top_k rule — candidates carry
       global ids so buffer order is irrelevant),
    3. VERIFY sweep: recompute each live block's scores (same dot, same
       kernel, deterministic) and check #{s >= tau} == #{cand >= tau}
       per block at the extracted k-th value tau.  A mismatched block
       (some group hid > ``rounds`` of its >=tau elements) ESCALATES:
       its candidate slice is replaced by the block's exact top-k and the
       final extraction re-runs once over the repaired buffer.

    Exactness: a missed global winner w always satisfies
    ``score(w) >= tau`` (its absence forces a weaker element into the
    candidate top-k, so tau <= score(w)) — the count check therefore
    cannot pass while any winner is missing, and an escalated block
    contributes its full exact top-k, which contains every global winner
    it holds.
    """
    q = qk_ref[:]                                         # [Qt, CK]
    nq = q.shape[0]
    m_total = mk_ref.shape[0]
    n_blocks = m_total // block_m
    g = block_m // group
    gr = g * rounds                                       # cand rows/block
    pad_k = -(-top_k // 8) * 8          # sublane-aligned escalation writes
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    # scratch persists across grid steps — clear stale candidates
    cand_v[:] = jnp.full(cand_v.shape, NEG_INF, jnp.float32)
    cand_i[:] = jnp.zeros(cand_i.shape, jnp.int32)

    def scores_for(b):
        mk_blk = mk_ref[pl.ds(b * block_m, block_m), :]
        msq_blk = msq_ref[pl.ds(b * block_m, block_m)]
        dot = jax.lax.dot_general(
            mk_blk, q, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        s = (2.0 * dot - msq_blk[:, None]) / scale        # [Bm, Qt]
        tok = b * block_m + jax.lax.broadcasted_iota(
            jnp.int32, (block_m, 1), 0)
        return jnp.where(tok < valid_ref[0], s, NEG_INF)

    def body(b, carry):
        def live(_):
            s3 = scores_for(b).reshape(g, group, nq)
            sub_ids = jax.lax.broadcasted_iota(jnp.int32, (1, group, 1), 1)
            base = b * block_m + group * jax.lax.broadcasted_iota(
                jnp.int32, (g, nq), 0)
            vs, ids = [], []
            for _ in range(rounds):
                m = jnp.max(s3, axis=1)                        # [G, Qt]
                am = jnp.argmax(s3, axis=1).astype(jnp.int32)  # [G, Qt]
                vs.append(m)
                ids.append(base + am)
                s3 = jnp.where(sub_ids == am[:, None, :], NEG_INF, s3)
            cand_v[pl.ds(b * gr, gr), :] = jnp.concatenate(vs, axis=0)
            cand_i[pl.ds(b * gr, gr), :] = jnp.concatenate(ids, axis=0)
            return 0

        return jax.lax.cond(b * block_m < valid_ref[0], live,
                            lambda _: 0, None)

    jax.lax.fori_loop(0, n_blocks, body, 0)
    mvals, midx = _extract_topk_rows(cand_v[:], cand_i[:], top_k)

    # verify + per-block escalation
    tau = mvals[top_k - 1:top_k, :]                       # [1, Qt]

    def vbody(b, bad):
        def check(_):
            s = scores_for(b)
            n_ge = jnp.sum((s >= tau).astype(jnp.float32), axis=0)
            c_ge = jnp.sum((cand_v[pl.ds(b * gr, gr), :] >= tau)
                           .astype(jnp.float32), axis=0)
            mismatch = jnp.any(n_ge != c_ge)

            def esc(_):
                tok = b * block_m + jax.lax.broadcasted_iota(
                    jnp.int32, (block_m, nq), 0)
                ev, ei = _extract_topk_rows(s, tok, pad_k)
                cand_v[pl.ds(b * gr, pad_k), :] = ev
                cand_i[pl.ds(b * gr, pad_k), :] = ei
                if gr > pad_k:
                    cand_v[pl.ds(b * gr + pad_k, gr - pad_k), :] = jnp.full(
                        (gr - pad_k, nq), NEG_INF, jnp.float32)
                return 1

            return jax.lax.cond(mismatch, esc, lambda _: 0, None)

        return bad + jax.lax.cond(b * block_m < valid_ref[0], check,
                                  lambda _: 0, None)

    bad = jax.lax.fori_loop(0, n_blocks, vbody, 0)
    mvals, midx = jax.lax.cond(
        bad > 0,
        lambda _: _extract_topk_rows(cand_v[:], cand_i[:], top_k),
        lambda _: (mvals, midx), None)

    vals_ref[:] = mvals
    idx_ref[:] = midx


def resident_fits(m_padded: int, ck: int, itemsize: int, block_m: int,
                  block_q: int, top_k: int, rounds: int = 8,
                  group: int = 128) -> bool:
    """Whether the resident-bank selection kernel's VMEM residents (whole
    key bank + candidate scratch + working tiles) fit the scoped budget."""
    limit = _vmem_limit_bytes()
    g = block_m // group
    cand_rows = (m_padded // block_m) * g * rounds
    need = (m_padded * ck * itemsize          # resident bank
            + m_padded * 4                    # msq fp32
            + 2 * cand_rows * block_q * 4     # candidate vals + ids
            + 6 * block_m * block_q * 4)      # score tile + intermediates
    return need <= limit * 3 // 4


def resident_topk_t(qk_p, mk_p, msq, valid, *, top_k: int, block_q: int,
                    block_m: int, scale: float, interpret: bool = False,
                    group: int | None = None, rounds: int | None = None,
                    no_skip: bool | None = None):
    """Resident-bank selection on PRE-PADDED inputs; same contract as
    ``tournament_topk_t`` (TRANSPOSED outputs [top_k, Np]).  ``no_skip``
    is accepted for interface parity with the other selectors (the
    resident kernel has no running-tau block skip to disable)."""
    np_, ck = qk_p.shape
    mp_ = mk_p.shape[0]
    n_blocks = mp_ // block_m
    from .config import resolve

    genv = resolve(group, "EVAVOS_TOUR_GROUP", 0)
    group = 128 if block_m % 128 == 0 else block_m
    if genv and block_m % genv == 0:
        group = genv
    g = block_m // group
    # g*rounds >= pad_k so an escalated block's exact top-pad_k fits its
    # candidate slice (pad_k = top_k rounded up to the 8-sublane tile)
    pad_k = -(-top_k // 8) * 8
    rounds = (resolve(rounds, "EVAVOS_TOUR_ROUNDS", 0)
              or max(8, -(-top_k // g), -(-pad_k // g)))
    cand_rows = n_blocks * g * rounds
    return pl.pallas_call(
        functools.partial(_kernel_resident, block_m=block_m, top_k=top_k,
                          scale=scale, rounds=rounds, group=group),
        grid=(np_ // block_q,),
        in_specs=[
            pl.BlockSpec((block_q, ck), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp_, ck), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp_,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((top_k, block_q), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((top_k, block_q), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((top_k, np_), jnp.float32),
            jax.ShapeDtypeStruct((top_k, np_), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((cand_rows, block_q), jnp.float32),
            pltpu.VMEM((cand_rows, block_q), jnp.int32),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(qk_p, mk_p, msq, valid)


def live_blocks(valid, block_m: int, n_blocks: int, interpret: bool):
    """Grid extent over the memory axis: number of blocks intersecting the
    valid prefix (>= 1 so the output write always fires).  Dynamic (traced)
    on compiled backends — dead blocks then cost neither DMA nor grid
    steps, the big win for mostly-empty interactive banks; static full
    sweep in interpret mode (dynamic grids aren't interpretable).

    NOTE (ADVICE r2): because interpret mode always sees the static full
    grid, the CPU suite never exercises the dynamic-grid path (traced
    extent, num_programs-based last-block writes).  That path is covered
    only by the TPU-gated tests (``tests/test_tpu_kernels.py``,
    EVAVOS_TEST_TPU=1) — run those on hardware for every change here."""
    if interpret:
        return n_blocks
    v = valid[0] if valid.ndim else valid
    return jnp.clip((v + block_m - 1) // block_m, 1, n_blocks)


def tournament_topk_t(qk_p, mk_p, msq, valid, *, top_k: int, block_q: int,
                      block_m: int, scale: float, interpret: bool = False,
                      group: int | None = None, rounds: int | None = None,
                      no_skip: bool | None = None,
                      defer_s: int | None = None):
    """Tournament selection on PRE-PADDED inputs; returns TRANSPOSED
    (vals [top_k, Np], idx [top_k, Np]).  Shared by ``pallas_memory_topk``
    (which transposes back) and the fused gated readout (which consumes the
    transposed orientation directly so its score recompute is bit-identical
    to the selection's).  The memory-axis grid is sized by the bank's
    valid prefix (dynamic grid), so dead bank blocks are never fetched."""
    np_, ck = qk_p.shape
    mp_ = mk_p.shape[0]
    n_blocks = mp_ // block_m
    from .config import resolve

    genv = resolve(group, "EVAVOS_TOUR_GROUP", 0)
    group = 128 if block_m % 128 == 0 else block_m
    if genv and block_m % genv == 0:
        group = genv
    g = block_m // group
    # R=6: escalation is all-or-nothing per query tile, so its frequency
    # is set by the WORST query's densest group; 6 rounds keep group
    # overflow (a group hiding > R of a query's global top-k) rare while
    # shaving pass cost — the r3_tour_params sweep measured r6 <= r8 at
    # every fill on both clustered and random banks, with a cliff only at
    # r4.  verify/escalate keeps exactness regardless.
    rounds = resolve(rounds, "EVAVOS_TOUR_ROUNDS", 0) or max(6, -(-top_k // g))
    no_skip = bool(resolve(no_skip, "EVAVOS_SEL_NOTAU", False))
    # deferred merges (see _kernel_tournament docstring): the candidate
    # buffer's dynamic sublane slices need 8-row alignment, so fall back to
    # per-block merges for geometries whose per-block candidate count isn't
    # a sublane multiple.  DEFAULT 0 (ADVICE r4): r4_defer_timing.json
    # measured defer8 ~2x SLOWER than defer0 at production geometry
    # (fill72 54.7 ms vs 27.2 ms) because the window-end merge ran
    # unconditionally; deferral stays opt-in until re-measured with the
    # buffered-flag gate above.
    defer_s = resolve(defer_s, "EVAVOS_TOUR_DEFER", 0)
    if (rounds * g) % 8 != 0 or defer_s < 0:
        defer_s = 0
    defer_s = min(defer_s, 64)  # unbounded env values -> opaque VMEM OOMs
    if not interpret:
        validate_block_geometry(block_q=block_q, block_m=block_m, ck=ck,
                                top_k=top_k, kernel="selection",
                                cand_rows=max(defer_s, 1) * rounds * g)
    return pl.pallas_call(
        functools.partial(_kernel_tournament, block_m=block_m,
                          top_k=top_k, scale=scale,
                          rounds=rounds, group=group, no_skip=no_skip,
                          defer_s=defer_s),
        grid=(np_ // block_q,
              live_blocks(valid, block_m, n_blocks, interpret)),
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
            pl.BlockSpec((top_k, block_q), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((top_k, block_q), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((top_k, np_), jnp.float32),
            jax.ShapeDtypeStruct((top_k, np_), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((top_k, block_q), jnp.float32),
            pltpu.VMEM((top_k, block_q), jnp.int32),
            # deferred-merge candidate buffer (8 dummy rows when disabled —
            # the kernel never touches it then, but the ref must exist)
            pltpu.VMEM((max(defer_s, 1) * rounds * g, block_q),
                       jnp.float32),
            pltpu.VMEM((max(defer_s, 1) * rounds * g, block_q),
                       jnp.int32),
            pltpu.SMEM((1,), jnp.int32),  # window 'buffered' flag
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(qk_p, mk_p, msq, valid)


@functools.partial(jax.jit,
                   static_argnames=("top_k", "block_q", "block_m",
                                    "interpret", "method", "return_raw"))
def pallas_memory_topk(mk, qk, top_k: int, valid_tokens=None,
                       block_q: int = 256, block_m: int = 2048,
                       interpret: bool = False, method: str = "iterative",
                       return_raw: bool = False):
    """Streaming top-k scores.

    mk [M, CK], qk [N, CK] -> (weights [N, top_k] fp32, idx [N, top_k]);
    with ``return_raw`` the raw selection scores come back instead of the
    softmax weights (the fused readout kernel needs them for its gate).
    N must divide into block_q tiles after padding; M pads to block_m.

    method:
      'iterative'  — sort-free k-max extraction (the fast path; XLA's
                     top_k sort costs 85% of a propagation step on v5e)
      'grid'       — memory blocks as a pipelined grid dimension
      'tournament' — transposed group-tournament + verify/escalate
      'resident'   — whole bank in VMEM, one extraction per query tile
                     (production when it fits — see ``resident_fits``)
      'sort'       — lax.top_k inside the kernel (needs Mosaic sort
                     support)
    """
    n, ck = qk.shape
    m = mk.shape[0]
    scale = math.sqrt(ck)  # divide, matching ops.memory_attention rounding

    pad_n = (-n) % block_q
    pad_m = (-m) % block_m
    qk_p = jnp.pad(qk, ((0, pad_n), (0, 0)))
    mk_p = jnp.pad(mk, ((0, pad_m), (0, 0)))
    msq = jnp.sum(mk_p.astype(jnp.float32) ** 2, axis=-1)
    valid = jnp.asarray(
        [m if valid_tokens is None else valid_tokens], jnp.int32)

    np_, mp_ = n + pad_n, m + pad_m

    if method in ("tournament", "resident", "chunked"):
        select = {"resident": resident_topk_t,
                  "tournament": tournament_topk_t,
                  "chunked": chunked_topk_t}[method]
        vals_t, idx_t = select(
            qk_p, mk_p, msq, valid, top_k=top_k, block_q=block_q,
            block_m=block_m, scale=scale, interpret=interpret)
        vals = vals_t.T[:n]
        idx = idx_t.T[:n]
        if return_raw:
            return vals, idx
        w = jnp.exp(vals - vals[:, :1])
        w = w / jnp.sum(w, axis=1, keepdims=True)
        return w, idx

    if method == "grid":
        n_blocks = mp_ // block_m
        kernel = functools.partial(
            _kernel_grid, block_m=block_m, top_k=top_k, scale=scale)
        vals, idx = pl.pallas_call(
            kernel,
            grid=(np_ // block_q,
                  live_blocks(valid, block_m, n_blocks, interpret)),
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
                pl.BlockSpec((block_q, top_k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_q, top_k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((np_, top_k), jnp.float32),
                jax.ShapeDtypeStruct((np_, top_k), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, top_k), jnp.float32),
                pltpu.VMEM((block_q, top_k), jnp.int32),
            ],
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(qk_p, mk_p, msq, valid)
        vals = vals[:n]
        idx = idx[:n]
        if return_raw:
            return vals, idx
        w = jnp.exp(vals - vals[:, :1])
        w = w / jnp.sum(w, axis=1, keepdims=True)
        return w, idx

    grid = (np_ // block_q,)

    kernel_fn = _kernel_iter if method == "iterative" else _kernel
    vals, idx = pl.pallas_call(
        functools.partial(kernel_fn, block_m=block_m, top_k=top_k,
                          scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, ck), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp_, ck), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp_,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_q, top_k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, top_k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((np_, top_k), jnp.float32),
            jax.ShapeDtypeStruct((np_, top_k), jnp.int32),
        ),
        interpret=interpret,
    )(qk_p, mk_p, msq, valid)

    vals = vals[:n]
    idx = idx[:n]
    if return_raw:
        return vals, idx
    w = jnp.exp(vals - vals[:, :1])
    w = w / jnp.sum(w, axis=1, keepdims=True)
    return w, idx


_SUPPORTED = None


def pallas_supported() -> bool:
    """Probe whether the compiled kernel runs on this backend (Mosaic needs
    sort/top_k support inside kernels; falls back to the XLA path if not)."""
    global _SUPPORTED
    if _SUPPORTED is None:
        try:
            import numpy as np

            # Probe at production-like tile sizes: Mosaic rejects tiny
            # blocks whose derived buffers fall below the (8, 128) tiles.
            mk = jnp.asarray(np.random.default_rng(0)
                             .standard_normal((4096, 64)), jnp.float32)
            qk = jnp.asarray(np.random.default_rng(1)
                             .standard_normal((128, 64)), jnp.float32)
            w, i = pallas_memory_topk(mk, qk, top_k=50, block_q=128,
                                      block_m=2048, method="grid")
            jax.block_until_ready(w)
            from ..ops.memory_attention import memory_affinity_topk

            rw, ri = memory_affinity_topk(mk, qk, 50)
            _SUPPORTED = bool((np.asarray(i) == np.asarray(ri)).all())
        except Exception:
            _SUPPORTED = False
    return _SUPPORTED

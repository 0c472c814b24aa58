"""Space-time memory attention: top-k affinity softmax + value readout.

This is the hot op of STCN propagation.  Parity target:
``mivos/model/propagation/prop_net.py:46-115`` (``softmax_w_g_top`` +
``EvalMemoryReader``): affinity between memory keys and query keys is the
negative squared L2 distance scaled by 1/sqrt(CK); for every query position
only the top-k (default 50) memory tokens participate in the softmax; the
readout is the affinity-weighted sum of memory values.

TPU-first design notes
----------------------
* Layout is token-major: memory keys ``[M, CK]``, query keys ``[N, CK]``,
  memory values ``[M, CV]`` (the engine flattens [T, h, w] memory into M
  tokens).  The big matmul ``qk @ mk.T`` maps straight onto the MXU.
* The reference's affinity ``(-||m||^2 + 2 m.q - ||q||^2)/sqrt(CK)`` includes
  a per-query constant ``-||q||^2`` that affects neither the top-k selection
  (per-query ranking over memory) nor the softmax (shift invariance), so we
  drop it and compute ``(2 m.q - ||m||^2)/sqrt(CK)``.  Readout is bit-for-bit
  invariant to this simplification.
* Scores accumulate in fp32 (``preferred_element_type``) even when keys are
  bf16; the softmax itself is fp32.
* Invalid memory slots (the engine keeps a fixed-size bank with a fill count
  so interaction steps never re-trace) are masked to -inf before top-k.
* Two readout strategies: ``gather`` (take top-k values then weighted-sum)
  and ``scatter`` (densify the sparse softmax and use one big matmul).
  ``gather`` wins for large M (it avoids materializing the [N, M] sparse
  matrix); ``scatter`` can win when M is small.  Both are exact.

A Pallas streaming kernel (block top-k merge over the memory axis, never
materializing [N, M] in HBM) lives in ``eva_vos_tpu.kernels`` and is used
when enabled; this module is the XLA reference implementation and the
correctness oracle for it.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def resolve_strategy(strategy: str = "auto") -> str:
    """Resolve the production readout strategy for the current backend.

    'auto' -> 'pallas_fused' when the streaming kernels compile on this
    backend (TPU; tunneled TPUs may report a plugin name, so gate on
    not-CPU and a compile probe), falling back to 'pallas' (selection
    kernel + XLA gather) then 'scatter' (MXU densify).  Used by both the
    engine and the driver's graded ``entry()`` so they measure the same
    path.
    """
    if strategy != "auto":
        return strategy
    from ..kernels import fused_readout_supported, pallas_supported

    if jax.default_backend() == "cpu":
        return "scatter"
    if fused_readout_supported():
        return "pallas_fused"
    return "pallas" if pallas_supported() else "scatter"


def _scores(mk: jnp.ndarray, qk: jnp.ndarray, valid_tokens=None) -> jnp.ndarray:
    """Affinity scores [N, M] in fp32 (memory axis last).

    mk: [M, CK] memory keys; qk: [N, CK] query keys.
    valid_tokens: optional scalar int — tokens >= valid_tokens are masked.
    """
    ck = mk.shape[-1]
    dot = jax.lax.dot_general(
        qk, mk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [N, M]
    m_sq = jnp.sum(mk.astype(jnp.float32) ** 2, axis=-1)  # [M]
    scores = (2.0 * dot - m_sq[None, :]) / math.sqrt(ck)
    if valid_tokens is not None:
        token_ids = jnp.arange(mk.shape[0])
        scores = jnp.where(token_ids[None, :] < valid_tokens, scores, NEG_INF)
    return scores


def memory_affinity_topk(mk, qk, top_k: int, valid_tokens=None,
                         chunk: int | None = None):
    """Top-k memory tokens per query with softmax weights.

    ``chunk``: when set, the memory axis is processed in chunks of that many
    tokens, taking a per-chunk top-k and merging — exact (ties resolve to
    the lowest index either way, since concatenation preserves chunk order)
    and avoids materializing sort state over the full [N, M] score matrix.

    Returns (weights [N, top_k] fp32, indices [N, top_k] int32).
    """
    m = mk.shape[0]
    if chunk is None or chunk >= m:
        scores = _scores(mk, qk, valid_tokens)
        vals, idx = jax.lax.top_k(scores, top_k)  # sorted descending
    else:
        n_chunks = (m + chunk - 1) // chunk
        cand_vals, cand_idx = [], []
        for c in range(n_chunks):
            lo = c * chunk
            hi = min(m, lo + chunk)
            sub_valid = None
            if valid_tokens is not None:
                sub_valid = jnp.clip(valid_tokens - lo, 0, hi - lo)
            s = _scores(mk[lo:hi], qk, sub_valid)
            k_c = min(top_k, hi - lo)
            v, i = jax.lax.top_k(s, k_c)
            cand_vals.append(v)
            cand_idx.append(i + lo)
        vals_cat = jnp.concatenate(cand_vals, axis=1)
        idx_cat = jnp.concatenate(cand_idx, axis=1)
        vals, pos = jax.lax.top_k(vals_cat, top_k)
        idx = jnp.take_along_axis(idx_cat, pos, axis=1)

    # exp(v - v_max) / sum — v_max is vals[:, 0] as in the reference.
    w = jnp.exp(vals - vals[:, :1])
    w = w / jnp.sum(w, axis=1, keepdims=True)
    return w, idx


@partial(jax.jit, static_argnames=("top_k", "strategy", "pallas_block_m",
                                   "kernel_cfg"))
def memory_readout(mk, qk, mv, top_k: int = 50, valid_tokens=None,
                   strategy: str = "gather", pallas_block_m: int = 4096,
                   kernel_cfg=None):
    """Full top-k attention readout.

    mk: [M, CK] memory keys
    qk: [N, CK] query keys
    mv: [K, M, CV] memory values (K objects share one affinity)
    strategy: 'gather' (take-rows readout), 'scatter' (densify + MXU
    matmul), 'pallas' (streaming selection kernel + XLA gather readout),
    or 'pallas_fused' (streaming selection + threshold-gated streaming
    readout — the fast TPU path: no index gather, no [N, M] densify;
    one MXU matmul per memory block).
    ``kernel_cfg``: optional :class:`~eva_vos_tpu.kernels.config.KernelConfig`
    — the jit-cache-correct carrier for the pallas knobs (the EVAVOS_* env
    vars remain process-start fallbacks only).
    Returns [K, N, CV] in mv.dtype.
    """
    if strategy == "pallas_fused":
        from ..kernels.config import KernelConfig, resolve
        from ..kernels.memory_readout import pallas_fused_readout

        kcfg = kernel_cfg if kernel_cfg is not None else KernelConfig()
        # selection tile geometry: the tournament is VPU-latency bound and
        # wants fat query tiles (512x1024 measured ~2x faster than the
        # 128x4096 readout tiling on v5e, experiments/r3_sel_geometry)
        sel_bq = resolve(kcfg.sel_block_q, "EVAVOS_SEL_BQ", 0) or None
        sel_bm = resolve(kcfg.sel_block_m, "EVAVOS_SEL_BM", 0) or None
        ro_bq = resolve(kcfg.ro_block_q, "EVAVOS_RO_BQ", 0) or 128
        return pallas_fused_readout(
            mk, qk, mv, top_k, valid_tokens, block_q=ro_bq,
            block_m=min(pallas_block_m, max(mk.shape[0], 128)),
            sel_block_q=sel_bq, sel_block_m=sel_bm, kcfg=kcfg)
    if strategy == "pallas":
        from ..kernels.memory_topk import pallas_memory_topk

        w, idx = pallas_memory_topk(
            mk, qk, top_k, valid_tokens,
            block_m=min(pallas_block_m, max(mk.shape[0], 128)),
            method="grid")
    else:
        w, idx = memory_affinity_topk(mk, qk, top_k, valid_tokens)

    if strategy in ("gather", "pallas"):
        # [K, N, top_k, CV] gather then weighted sum over top_k.  O(N*k*CV)
        # regardless of bank size — the dense-scatter alternative
        # materializes [N, M] fp32, which explodes for big interactive
        # banks (72 slots -> 3.8 GB per readout).
        gathered = mv[:, idx, :]  # [K, N, top_k, CV]
        out = jnp.einsum(
            "nk,bnkc->bnc", w.astype(jnp.float32), gathered.astype(jnp.float32)
        )
    elif strategy == "scatter":
        n, m = qk.shape[0], mk.shape[0]
        dense = jnp.zeros((n, m), dtype=jnp.float32).at[
            jnp.arange(n)[:, None], idx
        ].add(w)
        out = jnp.einsum("nm,bmc->bnc", dense, mv.astype(jnp.float32))
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    return out.astype(mv.dtype)


def memory_affinity_topk_gauss(mk, qk, top_k: int, query_hw, sigma: float,
                               valid_tokens=None):
    """Top-k affinity with gaussian locality (the reference's kernelized
    memory, ``prop_net.py:33-44, 46-51, 92-99``; ``km`` is None on every
    entry-point path, provided for API parity).

    Each memory token gets a gaussian prior centered at its best-matching
    query position; the per-query exp-scores are weighted by that prior
    BEFORE the top-k selection.

    query_hw: (h, w) of the query grid — queries are its row-major cells.
    Returns (weights [N, top_k] fp32, indices [N, top_k] int32).
    """
    h, w = query_hw
    scores = _scores(mk, qk, valid_tokens)          # [N, M]
    maxes = jnp.max(scores, axis=1, keepdims=True)  # per-query max (memory axis)
    x_exp = jnp.exp(scores - maxes)

    # best query per memory token -> gaussian center.  NOTE: this argmax runs
    # over the QUERY axis, where the per-query -||q||^2 term is NOT constant,
    # so it must be restored here (it still cancels in the softmax above).
    ck = mk.shape[-1]
    q_sq = jnp.sum(qk.astype(jnp.float32) ** 2, axis=-1) / math.sqrt(ck)
    best_q = jnp.argmax(scores - q_sq[:, None], axis=0)  # [M]
    cy = (best_q // w).astype(jnp.float32)
    cx = (best_q % w).astype(jnp.float32)
    qy = (jnp.arange(h * w) // w).astype(jnp.float32)
    qx = (jnp.arange(h * w) % w).astype(jnp.float32)
    g = jnp.exp(-((qy[:, None] - cy[None, :]) ** 2
                  + (qx[:, None] - cx[None, :]) ** 2) / (2.0 * sigma ** 2))

    weighted = x_exp * g                            # [N, M]
    vals, idx = jax.lax.top_k(weighted, top_k)
    wsum = jnp.sum(vals, axis=1, keepdims=True)
    return vals / wsum, idx


def full_softmax_affinity(mk, qk, valid_tokens=None):
    """Dense softmax affinity over the memory axis: [N, M] fp32.

    Used by the fusion attention path (reference ``AttentionMemory``,
    ``prop_net.py:117-138``) where the memory is a single frame.  Note the
    reference softmaxes over the *memory* axis (dim=1 of [B, THW, HW]) —
    here that is axis 1 of the [N, M] transposed layout... careful: our
    [N, M] has memory last, so we softmax over axis=-1 per query. The
    reference's [THW, HW] matrix softmaxes per query column over THW — the
    same thing.
    """
    scores = _scores(mk, qk, valid_tokens)
    return jax.nn.softmax(scores, axis=-1)

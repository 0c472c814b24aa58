"""Memory-bank-sharded top-k attention readout (long-video scale-out).

The reference's only distribution strategy is data-parallel training and
manual video-range sharding (SURVEY.md §2.9).  The TPU-native analog of
sequence parallelism for this workload is sharding the space-time memory
bank across devices along the token (time) axis: each chip scores its
memory shard against the (replicated) query frame, computes a local top-k,
all-gathers the tiny (value, global-index) candidate sets, reduces them to
the exact global top-k, and contributes the readout terms it owns via psum.

This is EXACT — it reproduces the single-chip top-k softmax readout bit-for
-bit up to float addition order — and its collectives are O(N * top_k)
per chip instead of O(N * M): only candidate scores ride the ICI.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.memory_attention import NEG_INF


def sharded_memory_readout(mk, qk, mv, top_k: int, mesh: Mesh,
                           axis: str = "data", valid_tokens=None):
    """mk [M, CK] / mv [K, M, CV] sharded over ``axis`` along M;
    qk [N, CK] replicated.  Returns [K, N, CV] replicated.
    """
    n_shards = mesh.shape[axis]
    m_total = mk.shape[0]
    assert m_total % n_shards == 0, "memory tokens must divide the mesh axis"
    m_local = m_total // n_shards
    ck = mk.shape[1]

    def local_fn(mk_loc, qk_rep, mv_loc, valid):
        shard_id = jax.lax.axis_index(axis)
        offset = shard_id * m_local

        dot = jax.lax.dot_general(
            qk_rep, mk_loc, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        m_sq = jnp.sum(mk_loc.astype(jnp.float32) ** 2, axis=-1)
        scores = (2.0 * dot - m_sq[None, :]) / math.sqrt(ck)  # [N, m_local]

        token_ids = offset + jnp.arange(m_local)
        scores = jnp.where(token_ids[None, :] < valid[0], scores, NEG_INF)

        k_local = min(top_k, m_local)
        loc_vals, loc_idx = jax.lax.top_k(scores, k_local)      # [N, k]
        glob_idx = loc_idx + offset

        # all-gather the candidate sets: [shards, N, k]
        all_vals = jax.lax.all_gather(loc_vals, axis)
        all_idx = jax.lax.all_gather(glob_idx, axis)
        n = qk_rep.shape[0]
        cand_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(n, -1)
        cand_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(n, -1)

        k_eff = min(top_k, cand_vals.shape[1])
        top_vals, pos = jax.lax.top_k(cand_vals, k_eff)          # [N, top_k]
        top_idx = jnp.take_along_axis(cand_idx, pos, axis=1)

        w = jnp.exp(top_vals - top_vals[:, :1])
        w = w / jnp.sum(w, axis=1, keepdims=True)                # [N, top_k]

        # each shard contributes the terms whose tokens it owns
        local_sel = top_idx - offset
        in_shard = (local_sel >= 0) & (local_sel < m_local)
        sel = jnp.clip(local_sel, 0, m_local - 1)
        gathered = mv_loc[:, sel, :]                             # [K, N, top_k, CV]
        w_eff = jnp.where(in_shard, w, 0.0)
        part = jnp.einsum("nk,bnkc->bnc", w_eff.astype(jnp.float32),
                          gathered.astype(jnp.float32))
        return jax.lax.psum(part, axis)

    # valid rides as an explicit replicated arg: a traced fill pointer (the
    # engine's bank front) must not be closed over inside shard_map
    valid_arr = jnp.asarray(
        [m_total if valid_tokens is None else valid_tokens], jnp.int32)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, None), P(None, axis, None), P(None)),
        out_specs=P(None, None, None),
        check_vma=False,
    )
    return fn(mk, qk, mv, valid_arr).astype(mv.dtype)


def comm_model_bytes(n_queries: int, top_k: int, cv: int, k_obj: int,
                     n_shards: int) -> dict:
    """Analytic per-chip collective volume of ``sharded_memory_readout``.

    Two collectives ride the ICI per readout:
    * all-gather of the candidate sets: every chip receives the other
      chips' [N, k_local] fp32 values + int32 global ids
      -> 2 * 4 * N * min(top_k, m_local) * n_shards bytes received;
    * psum of the partial readout [K, N, CV] fp32
      -> 4 * K * N * CV bytes reduced per chip (ring all-reduce moves
      ~2x the buffer per chip independent of shard count).

    Crucially NOTHING scales with the bank size M — the bank stays
    resident on its owning chips; only candidates and the readout cross
    the interconnect.
    """
    gather = 2 * 4 * n_queries * top_k * n_shards
    psum = 2 * 4 * k_obj * n_queries * cv
    return {"all_gather_bytes": gather, "psum_bytes": psum,
            "total_bytes": gather + psum}


_COLLECTIVE_OPS = ("all-gather", "all-reduce", "reduce-scatter",
                   "collective-permute", "all-to-all")

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "s64": 8, "u64": 8, "s8": 1, "u8": 1, "pred": 1}


def collective_bytes_from_hlo(hlo_text: str) -> dict:
    """Sum the result-shape bytes of every collective op in an HLO dump —
    the measured counterpart of :func:`comm_model_bytes` (used by the
    multichip dryrun to assert the sharded readout's comm volume really
    is bank-size-independent)."""
    import re

    totals: dict = {op: 0 for op in _COLLECTIVE_OPS}
    # e.g.:  %ag = f32[8,12,7]{...} all-gather(...)
    pat = re.compile(
        r"=\s+(?:\()?([a-z0-9]+)\[([0-9,]*)\][^=]*?\b("
        + "|".join(_COLLECTIVE_OPS) + r")\(")
    for m in pat.finditer(hlo_text):
        dtype, dims, op = m.groups()
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        totals[op] += n * _DTYPE_BYTES[dtype]
    totals["total_bytes"] = sum(totals[op] for op in _COLLECTIVE_OPS)
    return totals

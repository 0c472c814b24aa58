"""Pallas streaming top-k kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from eva_vos_tpu.kernels import pallas_memory_topk
from eva_vos_tpu.ops import memory_affinity_topk


@pytest.mark.parametrize("method", ["sort", "iterative", "grid",
                                    "tournament", "resident", "chunked"])
@pytest.mark.parametrize("m,n,ck,top_k", [
    (512, 64, 16, 8),
    pytest.param(768, 100, 32, 16, marks=pytest.mark.slow)])
def test_matches_xla_oracle(rng, m, n, ck, top_k, method):
    mk = jnp.asarray(rng.standard_normal((m, ck)).astype(np.float32))
    qk = jnp.asarray(rng.standard_normal((n, ck)).astype(np.float32))

    ref_w, ref_i = memory_affinity_topk(mk, qk, top_k)
    w, i = pallas_memory_topk(mk, qk, top_k, block_q=32, block_m=128,
                              interpret=True, method=method)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref_w),
                               rtol=1e-5, atol=1e-6)


def test_bf16_inputs_match_xla(rng):
    """bf16 keys (the engine's bank dtype): kernel selection must match the
    XLA path computed on the same bf16 inputs."""
    m, n, ck, top_k = 512, 32, 16, 8
    mk = jnp.asarray(rng.standard_normal((m, ck)), jnp.bfloat16)
    qk = jnp.asarray(rng.standard_normal((n, ck)), jnp.bfloat16)
    ref_w, ref_i = memory_affinity_topk(mk, qk, top_k)
    w, i = pallas_memory_topk(mk, qk, top_k, block_q=32, block_m=128,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref_w),
                               rtol=2e-2, atol=1e-3)


def test_tournament_escalation_exact(rng):
    """All global winners packed into ONE lane group: the tournament's
    verification must detect the miss and escalate to the full extraction,
    keeping the result exact."""
    m, n, ck, top_k = 512, 32, 16, 16
    mk = rng.standard_normal((m, ck)).astype(np.float32)
    mk[20:40] *= 30.0  # 20 dominant tokens inside lanes [0,128)
    mk = jnp.asarray(mk)
    qk = jnp.asarray(30.0 * rng.standard_normal((n, ck)).astype(np.float32))
    ref_w, ref_i = memory_affinity_topk(mk, qk, top_k)
    w, i = pallas_memory_topk(mk, qk, top_k, block_q=32, block_m=512,
                              interpret=True, method="tournament")
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    # the tournament computes scores transposed (mk @ qk.T); at this test's
    # 30x-amplified magnitudes the different fp accumulation order shifts
    # softmax weights by ~1e-5 relative (selection itself is exact above)
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref_w),
                               rtol=1e-4, atol=1e-6)


def test_tournament_tie_order(rng):
    """Duplicated memory rows (ties everywhere, within and across groups):
    tournament candidate ordering must reproduce lax.top_k's lowest-index
    tie rule."""
    m, n, ck, top_k = 512, 16, 8, 12
    base = rng.standard_normal((64, ck)).astype(np.float32)
    mk = jnp.asarray(np.tile(base, (8, 1)))  # every row appears 8x
    qk = jnp.asarray(rng.standard_normal((n, ck)).astype(np.float32))
    ref_w, ref_i = memory_affinity_topk(mk, qk, top_k)
    w, i = pallas_memory_topk(mk, qk, top_k, block_q=16, block_m=256,
                              interpret=True, method="tournament")
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))


def test_resident_escalation_and_ties(rng):
    """Resident-bank kernel: all global winners packed into one lane group
    (forces the verify sweep's per-block escalation) and duplicated rows
    (ties within and across blocks) must still match lax.top_k exactly."""
    m, n, ck, top_k = 512, 32, 16, 16
    mk = rng.standard_normal((m, ck)).astype(np.float32)
    mk[20:40] *= 30.0  # 20 dominant tokens inside lanes [0,128)
    qk = 30.0 * rng.standard_normal((n, ck)).astype(np.float32)
    ref_w, ref_i = memory_affinity_topk(jnp.asarray(mk), jnp.asarray(qk),
                                        top_k)
    w, i = pallas_memory_topk(jnp.asarray(mk), jnp.asarray(qk), top_k,
                              block_q=32, block_m=256, interpret=True,
                              method="resident")
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))

    base = rng.standard_normal((64, ck)).astype(np.float32)
    mk2 = jnp.asarray(np.tile(base, (8, 1)))  # every row appears 8x
    qk2 = jnp.asarray(rng.standard_normal((16, ck)).astype(np.float32))
    ref_w, ref_i = memory_affinity_topk(mk2, qk2, 12)
    w, i = pallas_memory_topk(mk2, qk2, 12, block_q=16, block_m=256,
                              interpret=True, method="resident")
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))


def test_resident_valid_tokens(rng):
    """Partial bank fill through the resident kernel (dead blocks are
    skipped by the in-kernel predicate, not the grid)."""
    m, n, ck, top_k = 512, 32, 16, 8
    mk = jnp.asarray(rng.standard_normal((m, ck)).astype(np.float32))
    qk = jnp.asarray(rng.standard_normal((n, ck)).astype(np.float32))
    for valid in (100, 256, 300):
        ref_w, ref_i = memory_affinity_topk(mk, qk, top_k,
                                            valid_tokens=valid)
        w, i = pallas_memory_topk(mk, qk, top_k, valid_tokens=valid,
                                  block_q=16, block_m=128, interpret=True,
                                  method="resident")
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
        np.testing.assert_allclose(np.asarray(w), np.asarray(ref_w),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_chunked_escalation_ties_and_fill(rng):
    """Chunked newest-first tournament: winners packed into one lane group
    (escalation), duplicated rows (ties across sub-blocks — the reversed
    processing order must still resolve to the lowest token id), and
    partial fills at sub-block granularity."""
    m, n, ck, top_k = 512, 32, 16, 16
    mk = rng.standard_normal((m, ck)).astype(np.float32)
    mk[20:40] *= 30.0
    qk = 30.0 * rng.standard_normal((n, ck)).astype(np.float32)
    ref_w, ref_i = memory_affinity_topk(jnp.asarray(mk), jnp.asarray(qk),
                                        top_k)
    w, i = pallas_memory_topk(jnp.asarray(mk), jnp.asarray(qk), top_k,
                              block_q=32, block_m=128, interpret=True,
                              method="chunked")
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))

    base = rng.standard_normal((64, ck)).astype(np.float32)
    mk2 = jnp.asarray(np.tile(base, (8, 1)))  # every row appears 8x
    qk2 = jnp.asarray(rng.standard_normal((16, ck)).astype(np.float32))
    ref_w, ref_i = memory_affinity_topk(mk2, qk2, 12)
    w, i = pallas_memory_topk(mk2, qk2, 12, block_q=16, block_m=128,
                              interpret=True, method="chunked")
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))

    mk3 = jnp.asarray(rng.standard_normal((512, ck)).astype(np.float32))
    qk3 = jnp.asarray(rng.standard_normal((n, ck)).astype(np.float32))
    for valid in (100, 256, 300):
        ref_w, ref_i = memory_affinity_topk(mk3, qk3, top_k,
                                            valid_tokens=valid)
        w, i = pallas_memory_topk(mk3, qk3, top_k, valid_tokens=valid,
                                  block_q=16, block_m=128, interpret=True,
                                  method="chunked")
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
        np.testing.assert_allclose(np.asarray(w), np.asarray(ref_w),
                                   rtol=1e-5, atol=1e-6)


def test_chunked_bf16_inputs(rng):
    """bf16 keys (the engine's bank dtype) through the chunked kernel."""
    m, n, ck, top_k = 512, 32, 16, 8
    mk = jnp.asarray(rng.standard_normal((m, ck)), jnp.bfloat16)
    qk = jnp.asarray(rng.standard_normal((n, ck)), jnp.bfloat16)
    ref_w, ref_i = memory_affinity_topk(mk, qk, top_k)
    w, i = pallas_memory_topk(mk, qk, top_k, block_q=32, block_m=128,
                              interpret=True, method="chunked")
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref_w),
                               rtol=2e-2, atol=1e-3)


@pytest.mark.slow
def test_chunked_multi_superblock(rng):
    """Several superblocks per bank (the reversed scalar-prefetch order
    map) with a partial fill whose live prefix ends mid-superblock."""
    import math

    from eva_vos_tpu.kernels.memory_topk import chunked_topk_t

    m, n, ck, top_k = 1024, 32, 16, 8
    mk = jnp.asarray(rng.standard_normal((m, ck)).astype(np.float32))
    qk = jnp.asarray(rng.standard_normal((n, ck)).astype(np.float32))
    msq = jnp.sum(mk.astype(jnp.float32) ** 2, axis=-1)
    for valid in (m, 700, 150):
        ref_w, ref_i = memory_affinity_topk(mk, qk, top_k,
                                            valid_tokens=valid)
        vals_t, idx_t = chunked_topk_t(
            qk, mk, msq, jnp.asarray([valid], jnp.int32), top_k=top_k,
            block_q=32, block_m=128, super_m=256, scale=math.sqrt(ck),
            interpret=True)
        np.testing.assert_array_equal(np.asarray(idx_t.T),
                                      np.asarray(ref_i))


def test_valid_tokens(rng):
    m, n, ck, top_k = 256, 16, 8, 5
    mk = jnp.asarray(rng.standard_normal((m, ck)).astype(np.float32))
    qk = jnp.asarray(rng.standard_normal((n, ck)).astype(np.float32))
    ref_w, ref_i = memory_affinity_topk(mk, qk, top_k, valid_tokens=100)
    w, i = pallas_memory_topk(mk, qk, top_k, valid_tokens=100,
                              block_q=16, block_m=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref_w),
                               rtol=1e-5, atol=1e-6)


def test_padding_of_n(rng):
    """N not divisible by block_q: padded queries must not leak."""
    m, n, ck, top_k = 128, 37, 8, 4
    mk = jnp.asarray(rng.standard_normal((m, ck)).astype(np.float32))
    qk = jnp.asarray(rng.standard_normal((n, ck)).astype(np.float32))
    ref_w, ref_i = memory_affinity_topk(mk, qk, top_k)
    w, i = pallas_memory_topk(mk, qk, top_k, block_q=16, block_m=64,
                              interpret=True)
    assert w.shape == (n, top_k)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))


def test_block_geometry_validation():
    """Oversized block geometries raise a descriptive ValueError instead of
    an opaque backend JaxRuntimeError (ADVICE r2).  Calibrated on the
    r2_dyngrid_sweep crash cases at the v5e 96 MiB scoped budget."""
    import os
    from eva_vos_tpu.kernels.memory_topk import validate_block_geometry

    os.environ["EVAVOS_VMEM_LIMIT_MB"] = "96"
    try:
        # production geometries pass
        validate_block_geometry(block_q=128, block_m=4096, ck=64, top_k=50)
        validate_block_geometry(block_q=128, block_m=2048, ck=64, top_k=50,
                                cv=512, n_obj=1, kernel="readout")
        # the r2 crash cases reject with a readable message
        for kw in (dict(block_q=512, block_m=4096, ck=64, top_k=50),
                   dict(block_q=128, block_m=8192, ck=64, top_k=50),
                   dict(block_q=256, block_m=4096, ck=64, top_k=50,
                        cv=512, n_obj=1, kernel="readout")):
            with pytest.raises(ValueError, match="scoped-VMEM"):
                validate_block_geometry(**kw)
        # tighter devices reject the production geometry too
        os.environ["EVAVOS_VMEM_LIMIT_MB"] = "12"
        with pytest.raises(ValueError, match="scoped-VMEM"):
            validate_block_geometry(block_q=128, block_m=4096, ck=64,
                                    top_k=50)
    finally:
        del os.environ["EVAVOS_VMEM_LIMIT_MB"]


@pytest.mark.parametrize("defer_s", [0, 2, 8])
def test_tournament_deferred_merge_exact(rng, defer_s):
    """Deferred-merge tournament (r4): candidates buffered across
    ``defer_s`` blocks with one merge per window, residual-max safe check
    routing dense blocks to the per-block verify/escalate path.  Mixed
    bank: mostly uniform blocks (safe path) plus two dominant clusters in
    different windows (unsafe path + escalation), a partial final window,
    and a valid-prefix cutoff mid-window."""
    from eva_vos_tpu.kernels.memory_topk import tournament_topk_t

    m, n, ck, top_k = 4096, 64, 16, 16
    block_q, block_m = 32, 256          # 16 blocks -> 2 full defer windows
    mk = rng.standard_normal((m, ck)).astype(np.float32)
    mk[800:820] *= 30.0                 # cluster in block 3 (window 0)
    mk[3100:3120] *= 30.0               # cluster in block 12 (window 1)
    mk = jnp.asarray(mk)
    qk = jnp.asarray(rng.standard_normal((n, ck)).astype(np.float32))
    valid = 3500                        # cuts block 13 mid-window

    ref_w, ref_i = memory_affinity_topk(mk, qk, top_k, valid_tokens=valid)
    import math
    msq = jnp.sum(mk.astype(jnp.float32) ** 2, axis=-1)
    vals_t, idx_t = tournament_topk_t(
        qk, mk, msq, jnp.asarray([valid], jnp.int32), top_k=top_k,
        block_q=block_q, block_m=block_m, scale=math.sqrt(ck),
        interpret=True, defer_s=defer_s)
    w = jnp.exp(vals_t.T - vals_t.T[:, :1])
    w = w / jnp.sum(w, axis=1, keepdims=True)
    np.testing.assert_array_equal(np.asarray(idx_t.T), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref_w),
                               rtol=1e-4, atol=1e-6)

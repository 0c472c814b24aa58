"""Compiled-kernel correctness on real TPU hardware.

The CPU suite exercises the Pallas kernels in interpret mode with STATIC
grids; the production path compiles with DYNAMIC live-prefix grids
(``kernels.memory_topk.live_blocks``).  These tests validate the compiled
kernels against the XLA oracle at several bank-fill levels on the actual
backend.  They only run under ``EVAVOS_TEST_TPU=1`` (the conftest pins the
default suite to the virtual CPU mesh, where Mosaic is unavailable);
``experiments/r2_dyngrid_check.py`` is the larger-geometry version.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.environ.get("EVAVOS_TEST_TPU")
        or jax.default_backend() == "cpu",
        reason="compiled-kernel test needs EVAVOS_TEST_TPU=1 + a TPU"),
]

HW = 256
CK, CV, TOP_K = 64, 128, 20


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    m, q = 24 * HW, 2 * HW
    return (jnp.asarray(rng.standard_normal((m, CK)), jnp.bfloat16),
            jnp.asarray(rng.standard_normal((q, CK)), jnp.bfloat16),
            jnp.asarray(rng.standard_normal((1, m, CV)), jnp.bfloat16))


@pytest.mark.parametrize("slots", [2, 7, 24])
def test_tournament_selection_exact(data, slots):
    from eva_vos_tpu.kernels.memory_topk import pallas_memory_topk
    from eva_vos_tpu.ops.memory_attention import memory_affinity_topk

    mk, qk, _ = data
    valid = slots * HW
    w, i = pallas_memory_topk(mk, qk, TOP_K, valid, block_q=128,
                              block_m=2048, method="tournament")
    rw, ri = memory_affinity_topk(mk, qk, TOP_K, valid)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(w), np.asarray(rw),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("slots", [2, 7, 24])
def test_resident_selection_exact(data, slots):
    from eva_vos_tpu.kernels.memory_topk import pallas_memory_topk
    from eva_vos_tpu.ops.memory_attention import memory_affinity_topk

    mk, qk, _ = data
    valid = slots * HW
    w, i = pallas_memory_topk(mk, qk, TOP_K, valid, block_q=128,
                              block_m=2048, method="resident")
    rw, ri = memory_affinity_topk(mk, qk, TOP_K, valid)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(w), np.asarray(rw),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("slots", [2, 7, 24])
@pytest.mark.parametrize("defer_s", [4, 8])
def test_tournament_deferred_dynamic_grid(data, slots, defer_s):
    """Deferred merges under the COMPILED dynamic grid (ADVICE r4): the
    interpret suite always sees the static full grid, so window_end firing
    at j == num_programs-1 MID-window (valid cuts the last defer window
    short) is exercised only here.  slots=7 at block_m=1024 ends on block
    1 (mid-window for both defer sizes); slots=24 ends on block 5."""
    from eva_vos_tpu.kernels.memory_topk import tournament_topk_t
    from eva_vos_tpu.ops.memory_attention import memory_affinity_topk

    mk, qk, _ = data
    valid = slots * HW
    n, ck = qk.shape
    msq = jnp.sum(mk.astype(jnp.float32) ** 2, axis=-1)
    vals_t, idx_t = tournament_topk_t(
        qk, mk, msq, jnp.asarray([valid], jnp.int32), top_k=TOP_K,
        block_q=128, block_m=1024, scale=float(np.sqrt(ck)),
        defer_s=defer_s)
    _, ri = memory_affinity_topk(mk, qk, TOP_K, valid)
    np.testing.assert_array_equal(np.asarray(idx_t.T[:n]), np.asarray(ri))


@pytest.mark.parametrize("slots", [2, 7, 24])
def test_chunked_selection_exact(data, slots):
    """Chunked newest-first tournament (production default): compiled
    scalar-prefetch reversed order + in-kernel sub-block loop + >= tau
    skip must stay exact at partial fills."""
    from eva_vos_tpu.kernels.memory_topk import pallas_memory_topk
    from eva_vos_tpu.ops.memory_attention import memory_affinity_topk

    mk, qk, _ = data
    valid = slots * HW
    w, i = pallas_memory_topk(mk, qk, TOP_K, valid, block_q=128,
                              block_m=1024, method="chunked")
    rw, ri = memory_affinity_topk(mk, qk, TOP_K, valid)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(w), np.asarray(rw),
                               rtol=1e-4, atol=1e-5)


def test_chunked_escalation_exact(data):
    """Dominant tokens packed into one lane group: the compiled chunked
    kernel's verify ladder must escalate and stay exact."""
    from eva_vos_tpu.kernels.memory_topk import pallas_memory_topk
    from eva_vos_tpu.ops.memory_attention import memory_affinity_topk

    rng = np.random.default_rng(11)
    m, q = 24 * HW, 2 * HW
    mk = rng.standard_normal((m, CK)).astype(np.float32)
    mk[40:80] *= 30.0
    mk = jnp.asarray(mk, jnp.bfloat16)
    qk = jnp.asarray(5.0 * rng.standard_normal((q, CK)), jnp.bfloat16)
    w, i = pallas_memory_topk(mk, qk, TOP_K, m, block_q=128,
                              block_m=1024, method="chunked")
    rw, ri = memory_affinity_topk(mk, qk, TOP_K, m)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_resident_escalation_exact(data):
    """Dominant tokens packed into one lane group: the compiled verify
    sweep must escalate and stay exact."""
    from eva_vos_tpu.kernels.memory_topk import pallas_memory_topk
    from eva_vos_tpu.ops.memory_attention import memory_affinity_topk

    rng = np.random.default_rng(7)
    m, q = 24 * HW, 2 * HW
    mk = rng.standard_normal((m, CK)).astype(np.float32)
    mk[40:80] *= 30.0
    mk = jnp.asarray(mk, jnp.bfloat16)
    qk = jnp.asarray(5.0 * rng.standard_normal((q, CK)), jnp.bfloat16)
    w, i = pallas_memory_topk(mk, qk, TOP_K, m, block_q=128,
                              block_m=2048, method="resident")
    rw, ri = memory_affinity_topk(mk, qk, TOP_K, m)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


@pytest.mark.parametrize("slots", [2, 7, 24])
def test_fused_readout_matches_gather(data, slots):
    from eva_vos_tpu.kernels.memory_readout import pallas_fused_readout
    from eva_vos_tpu.ops.memory_attention import memory_readout

    mk, qk, mv = data
    valid = slots * HW
    out = pallas_fused_readout(mk, qk, mv, TOP_K, valid, block_q=128,
                               block_m=2048)
    ref = memory_readout(mk, qk, mv, top_k=TOP_K, valid_tokens=valid,
                         strategy="gather")
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)  # bf16 accumulation


@pytest.mark.parametrize("slots", [2, 24])
def test_fused_readout_production_topk(data, slots):
    """top_k=50 (production): pad_k=56 exercises the 8-aligned dynamic
    window start, the sentinel rows past top_k, and the full-build
    fallback for wide id spreads — the exact paths whose Mosaic lowering
    broke in r3 (int32 argmin; unprovable window alignment) while the
    top_k=20 case and the interpret suite stayed green."""
    from eva_vos_tpu.kernels.memory_readout import pallas_fused_readout
    from eva_vos_tpu.ops.memory_attention import memory_readout

    mk, qk, mv = data
    valid = slots * HW
    out = pallas_fused_readout(mk, qk, mv, 50, valid, block_q=128,
                               block_m=2048)
    ref = memory_readout(mk, qk, mv, top_k=50, valid_tokens=valid,
                         strategy="gather")
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)

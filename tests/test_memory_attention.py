"""Memory attention vs. a direct numpy re-derivation of the reference math.

The numpy oracle mirrors ``prop_net.py:46-115``: full (-a+b-c)/sqrt(CK)
affinity including the per-query constant, torch-style top-k + scatter-back,
then the bmm readout — verifying that dropping the per-query constant in the
TPU op is output-invariant.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from eva_vos_tpu.ops import memory_readout, memory_affinity_topk, full_softmax_affinity

pytestmark = pytest.mark.smoke


def numpy_reference_readout(mk, qk, mv, top_k):
    """mk [M,CK], qk [N,CK], mv [K,M,CV] -> [K,N,CV] via the torch formula."""
    ck = mk.shape[1]
    a = (mk ** 2).sum(1)[:, None]          # [M, 1]
    b = 2 * (mk @ qk.T)                    # [M, N]
    c = (qk ** 2).sum(1)[None, :]          # [1, N]
    affinity = (-a + b - c) / np.sqrt(ck)  # [M, N] — memory axis first, like THWxHW

    out = np.zeros((mv.shape[0], qk.shape[0], mv.shape[2]), dtype=np.float64)
    for n in range(qk.shape[0]):
        col = affinity[:, n]
        top_idx = np.argsort(-col, kind="stable")[:top_k]
        vals = col[top_idx]
        e = np.exp(vals - vals[0])
        w = e / e.sum()
        for k in range(mv.shape[0]):
            out[k, n] = (w[:, None] * mv[k, top_idx]).sum(0)
    return out


@pytest.mark.parametrize("strategy", ["gather", "scatter"])
@pytest.mark.parametrize("m,n,ck,cv,top_k", [(64, 32, 16, 24, 8), (200, 50, 64, 32, 50)])
def test_matches_numpy_oracle(rng, strategy, m, n, ck, cv, top_k):
    mk = rng.standard_normal((m, ck)).astype(np.float32)
    qk = rng.standard_normal((n, ck)).astype(np.float32)
    mv = rng.standard_normal((2, m, cv)).astype(np.float32)

    expected = numpy_reference_readout(mk.astype(np.float64), qk.astype(np.float64),
                                       mv.astype(np.float64), top_k)
    out = memory_readout(jnp.asarray(mk), jnp.asarray(qk), jnp.asarray(mv),
                         top_k=top_k, strategy=strategy)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("chunk", [16, 64, 100])
def test_chunked_matches_full(rng, chunk):
    m, n, ck, top_k = 200, 24, 8, 13
    mk = jnp.asarray(rng.standard_normal((m, ck)).astype(np.float32))
    qk = jnp.asarray(rng.standard_normal((n, ck)).astype(np.float32))
    w_full, i_full = memory_affinity_topk(mk, qk, top_k)
    w_ch, i_ch = memory_affinity_topk(mk, qk, top_k, chunk=chunk)
    np.testing.assert_array_equal(np.asarray(i_full), np.asarray(i_ch))
    np.testing.assert_allclose(np.asarray(w_full), np.asarray(w_ch),
                               rtol=1e-6, atol=1e-7)


def test_chunked_with_valid_tokens(rng):
    m, n, ck, top_k = 96, 8, 8, 7
    mk = jnp.asarray(rng.standard_normal((m, ck)).astype(np.float32))
    qk = jnp.asarray(rng.standard_normal((n, ck)).astype(np.float32))
    w_full, i_full = memory_affinity_topk(mk, qk, top_k, valid_tokens=50)
    w_ch, i_ch = memory_affinity_topk(mk, qk, top_k, valid_tokens=50, chunk=32)
    np.testing.assert_array_equal(np.asarray(i_full), np.asarray(i_ch))
    np.testing.assert_allclose(np.asarray(w_full), np.asarray(w_ch),
                               rtol=1e-6, atol=1e-7)


def test_valid_tokens_masking(rng):
    """Tokens beyond valid_tokens must never be selected."""
    m, n, ck = 40, 8, 8
    mk = rng.standard_normal((m, ck)).astype(np.float32)
    qk = rng.standard_normal((n, ck)).astype(np.float32)
    # Make the tail tokens extremely attractive; masking must exclude them.
    mk[30:] = qk[0] * 10
    w, idx = memory_affinity_topk(jnp.asarray(mk), jnp.asarray(qk), top_k=5,
                                  valid_tokens=30)
    assert np.asarray(idx).max() < 30
    np.testing.assert_allclose(np.asarray(w.sum(1)), 1.0, rtol=1e-5)


def test_masked_equals_sliced(rng):
    """Masked fixed-size bank == computing on the valid slice only."""
    m, valid, n, ck, cv, top_k = 64, 37, 16, 8, 12, 9
    mk = rng.standard_normal((m, ck)).astype(np.float32)
    qk = rng.standard_normal((n, ck)).astype(np.float32)
    mv = rng.standard_normal((1, m, cv)).astype(np.float32)

    masked = memory_readout(jnp.asarray(mk), jnp.asarray(qk), jnp.asarray(mv),
                            top_k=top_k, valid_tokens=valid)
    sliced = memory_readout(jnp.asarray(mk[:valid]), jnp.asarray(qk),
                            jnp.asarray(mv[:, :valid]), top_k=top_k)
    np.testing.assert_allclose(np.asarray(masked), np.asarray(sliced), rtol=1e-5, atol=1e-6)


def test_gaussian_locality_matches_reference_formula(rng):
    """Numpy oracle of softmax_w_g_top with gauss (prop_net.py:46-57)."""
    from eva_vos_tpu.ops.memory_attention import memory_affinity_topk_gauss

    h, w, ck, top_k, sigma = 4, 6, 8, 5, 2.0
    n = h * w
    m = 2 * n
    mk = rng.standard_normal((m, ck)).astype(np.float32)
    qk = rng.standard_normal((n, ck)).astype(np.float32)

    # oracle: full torch formula including the per-query constant
    a = (mk ** 2).sum(1)[:, None]
    b = 2 * (mk @ qk.T)
    c = (qk ** 2).sum(1)[None, :]
    aff = ((-a + b - c) / np.sqrt(ck))            # [M, N]
    best_q = np.argmax(aff, axis=1)                # per memory token
    cy, cx = best_q // w, best_q % w
    qy, qx = np.arange(n) // w, np.arange(n) % w
    g = np.exp(-((qy[None, :] - cy[:, None]) ** 2
                 + (qx[None, :] - cx[:, None]) ** 2) / (2 * sigma ** 2))
    x_exp = np.exp(aff - aff.max(0, keepdims=True)) * g  # [M, N]
    expected_w = np.zeros((n, top_k))
    expected_i = np.zeros((n, top_k), int)
    for q in range(n):
        col = x_exp[:, q]
        top = np.argsort(-col, kind="stable")[:top_k]
        vals = col[top]
        expected_w[q] = vals / vals.sum()
        expected_i[q] = top

    got_w, got_i = memory_affinity_topk_gauss(
        jnp.asarray(mk), jnp.asarray(qk), top_k, (h, w), sigma)
    np.testing.assert_array_equal(np.asarray(got_i), expected_i)
    np.testing.assert_allclose(np.asarray(got_w), expected_w,
                               rtol=1e-4, atol=1e-6)


def test_full_softmax_affinity(rng):
    m, n, ck = 30, 10, 8
    mk = rng.standard_normal((m, ck)).astype(np.float32)
    qk = rng.standard_normal((n, ck)).astype(np.float32)
    aff = np.asarray(full_softmax_affinity(jnp.asarray(mk), jnp.asarray(qk)))
    assert aff.shape == (n, m)
    np.testing.assert_allclose(aff.sum(-1), 1.0, rtol=1e-5)

    # against numpy including the per-query constant (softmax-invariant)
    a = (mk ** 2).sum(1)[None, :]
    b = 2 * (qk @ mk.T)
    c = (qk ** 2).sum(1)[:, None]
    scores = (-a + b - c) / np.sqrt(ck)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    expected = e / e.sum(-1, keepdims=True)
    np.testing.assert_allclose(aff, expected, rtol=1e-4, atol=1e-6)

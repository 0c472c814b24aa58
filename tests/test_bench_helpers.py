"""Tests for bench.py helpers that carry correctness weight.

The quality-parity protocol hands BIT-IDENTICAL bf16-representable
weights to both stacks (STATUS.md round-4 second pass); since r5 the
rounding happens on host (``_round_to_dtype_host``) instead of a device
round-trip, so host rounding must equal XLA's cast exactly.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke


def test_host_rounding_matches_jax_cast():
    import jax.numpy as jnp

    import bench

    rng = np.random.default_rng(0)
    # include denormals, large values, negatives, exact ties
    x = np.concatenate([
        rng.standard_normal(4096).astype(np.float32),
        np.float32([0.0, -0.0, 1e-38, -1e-38, 3.4e38, -3.4e38]),
        # bf16 tie cases: values exactly between two bf16 neighbours
        np.float32([1.00390625, 1.01171875, -1.00390625]),
    ])
    for dtype in (jnp.bfloat16, jnp.float32):
        host = bench._round_to_dtype_host(x, dtype)
        via_jax = np.asarray(jnp.asarray(x, dtype), np.float32)
        assert host.dtype == np.float32
        np.testing.assert_array_equal(host, via_jax)


def test_host_rounding_tree_shapes():
    import jax
    import jax.numpy as jnp

    import bench

    tree = {"a": np.ones((3, 5), np.float32),
            "b": [np.zeros((2,), np.float32)]}
    out = jax.tree.map(
        lambda v: bench._round_to_dtype_host(v, jnp.bfloat16), tree)
    assert out["a"].shape == (3, 5)
    assert out["b"][0].dtype == np.float32

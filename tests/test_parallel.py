"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eva_vos_tpu.parallel import (make_mesh, shard_batch, data_sharding,
                                  sharded_memory_readout)
from eva_vos_tpu.ops import memory_readout


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    return make_mesh(8)


class TestShardedReadout:
    @pytest.mark.parametrize("valid", [None, 96])
    def test_matches_single_device(self, rng, mesh, valid):
        m, n, ck, cv, top_k = 128, 32, 16, 24, 10  # m divisible by 8
        mk = rng.standard_normal((m, ck)).astype(np.float32)
        qk = rng.standard_normal((n, ck)).astype(np.float32)
        mv = rng.standard_normal((2, m, cv)).astype(np.float32)

        ref = memory_readout(jnp.asarray(mk), jnp.asarray(qk), jnp.asarray(mv),
                             top_k=top_k, valid_tokens=valid)
        out = sharded_memory_readout(jnp.asarray(mk), jnp.asarray(qk),
                                     jnp.asarray(mv), top_k=top_k, mesh=mesh,
                                     valid_tokens=valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_top_k_larger_than_shard(self, rng, mesh):
        # top_k = 12 > m_local = 8: the merge must still find the global set
        m, n, ck, cv, top_k = 64, 8, 8, 16, 12
        mk = rng.standard_normal((m, ck)).astype(np.float32)
        qk = rng.standard_normal((n, ck)).astype(np.float32)
        mv = rng.standard_normal((1, m, cv)).astype(np.float32)
        ref = memory_readout(jnp.asarray(mk), jnp.asarray(qk), jnp.asarray(mv),
                             top_k=top_k)
        out = sharded_memory_readout(jnp.asarray(mk), jnp.asarray(qk),
                                     jnp.asarray(mv), top_k=top_k, mesh=mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


class TestBatchSharding:
    def test_shard_batch_places_on_mesh(self, rng, mesh):
        batch = {"x": rng.standard_normal((16, 4)).astype(np.float32)}
        out = shard_batch(batch, mesh)
        assert out["x"].sharding == data_sharding(mesh)
        np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])

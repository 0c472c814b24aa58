"""Orbax checkpoint round-trips (reference: torch.save/.load + resume)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eva_vos_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint


class TestCheckpoint:
    def test_roundtrip_tree(self, tmp_path, rng):
        tree = {
            "params": {"w": jnp.asarray(rng.standard_normal((4, 4)),
                                        jnp.float32),
                       "b": jnp.zeros((4,))},
            "iters": jnp.asarray(123),
            "max_reward": jnp.asarray(0.5),
        }
        path = tmp_path / "ckpt"
        save_checkpoint(path, tree)
        restored = restore_checkpoint(path)
        np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                                   np.asarray(tree["params"]["w"]))
        assert int(restored["iters"]) == 123

    def test_overwrite(self, tmp_path):
        path = tmp_path / "ckpt"
        save_checkpoint(path, {"x": jnp.ones((2,))})
        save_checkpoint(path, {"x": jnp.zeros((2,))})
        out = restore_checkpoint(path)
        np.testing.assert_allclose(np.asarray(out["x"]), 0.0)

    @pytest.mark.slow
    def test_trainer_state_resume(self, tmp_path):
        """PPO-style resume: params + counters survive the round trip."""
        from eva_vos_tpu.models import ActorCritic

        net = ActorCritic(out_dim=2, arch="resnet18")
        variables = net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 64, 256)),
                             jnp.zeros((1, 64, 64, 3)))
        path = tmp_path / "rl"
        save_checkpoint(path, {"params": variables["params"],
                               "batch_stats": variables["batch_stats"],
                               "iters": jnp.asarray(7),
                               "max_reward": jnp.asarray(-1.5)})
        back = restore_checkpoint(path)
        flat_a = jax.tree.leaves(variables["params"])
        flat_b = jax.tree.leaves(back["params"])
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

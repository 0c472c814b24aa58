"""Trainer tests: data-parallel QNet step and the PPO stack with FakeSAM."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eva_vos_tpu.train import QNetTrainer
from eva_vos_tpu.train.ppo import (AnnotationEnv, RolloutStorage, rollout,
                                   compute_returns, calculate_gaes,
                                   PPOTrainer, PPOAgent)
from eva_vos_tpu.annotator import FakeSAMController
from eva_vos_tpu.parallel import make_mesh
from eva_vos_tpu.ops.normalize import IMAGENET_MEAN, IMAGENET_STD


class TestQNetTrainer:
    @pytest.fixture(scope="class")
    def trainer(self):
        return QNetTrainer(arch="resnet18", lr=1e-3, optim="SGD",
                           mesh=make_mesh(8))

    @pytest.mark.slow
    def test_train_step_runs_and_learns(self, trainer, rng):
        state = trainer.init(jax.random.PRNGKey(0), image_size=64)
        # a trivially separable batch: label 0 = dark images, 1 = bright
        n = 16
        labels = np.tile(np.array([0, 1]), n // 2).astype(np.int32)
        imgs = np.where(labels[:, None, None, None] == 0, 0.1, 0.9)
        imgs = np.broadcast_to(imgs, (n, 64, 64, 3)).astype(np.float32)
        masks = rng.uniform(size=(n, 64, 64)).astype(np.float32)
        batch = {"img": imgs, "mask": masks, "label": labels}

        losses = []
        key = jax.random.PRNGKey(1)
        for i in range(8):
            key, sub = jax.random.split(key)
            state, metrics = trainer.train_step(state, batch, sub)
            losses.append(float(metrics["loss"]))
        assert int(state.step) == 8
        assert losses[-1] < losses[0]

    def test_eval_step(self, trainer, rng):
        state = trainer.init(jax.random.PRNGKey(0), image_size=64)
        batch = {
            "img": rng.uniform(size=(8, 64, 64, 3)).astype(np.float32),
            "mask": rng.uniform(size=(8, 64, 64)).astype(np.float32),
            "label": np.zeros((8,), np.int32),
        }
        metrics = trainer.eval_step(state, batch)
        assert np.isfinite(float(metrics["loss"]))

    def test_extract_fn(self, trainer):
        state = trainer.init(jax.random.PRNGKey(0), image_size=64)
        x = jnp.zeros((2, 64, 64, 3))
        feats = trainer.extract_fn(state)(x, x)
        assert feats.shape == (2, 1024)


class TestReturnsAndGAE:
    def test_discounted_returns(self):
        r = compute_returns([1.0, 1.0, 1.0], gamma=0.5)
        np.testing.assert_allclose(r, [1.75, 1.5, 1.0])

    def test_gae_terminal(self):
        g = calculate_gaes([1.0], [0.5])
        np.testing.assert_allclose(g, [0.5])  # delta = 1 + 0 - 0.5

    def test_gae_recursion(self):
        # deltas = [r0 + v1 - v0, r1 - v1] = [0, 1]; gae0 = d0 + gae1 = 1
        g = calculate_gaes([0.0, 1.0], [0.0, 0.0], gamma=1.0, decay=1.0)
        np.testing.assert_allclose(g, [1.0, 1.0])


def _normed(img01):
    return (img01 - IMAGENET_MEAN) / IMAGENET_STD


class TestAnnotationEnv:
    def _make(self, max_steps=3):
        rng = np.random.default_rng(0)
        img = _normed(rng.uniform(0, 1, (64, 80, 3)).astype(np.float32))
        gt = np.zeros((64, 80), np.float32)
        gt[20:50, 20:60] = 1
        init = np.zeros_like(gt)
        init[22:48, 24:56] = 1
        return AnnotationEnv(FakeSAMController(), img, gt, init, max_steps)

    def test_reset_state_shapes(self):
        env = self._make()
        emb, mask224 = env.state
        assert emb.shape == (1, 64, 64, 256)
        assert mask224.shape == (1, 224, 224, 3)

    def test_mask_action_terminates_with_iou_one(self):
        env = self._make()
        reward, state, done = env.step(1)  # 'mask'
        assert done and env.iou == 1.0
        assert reward == (1.0 - env.init_iou) / env.annotation_cost

    def test_click_steps_until_max(self):
        env = self._make(max_steps=2)
        r1, _, d1 = env.step(0)
        assert not d1 or len(env.annotation_actions) == 2
        r2, _, d2 = env.step(0)
        assert d2  # max_steps reached
        # terminal click path charges the click overhead
        assert env.annotation_cost == pytest.approx(2 * 1.5 + 1.0)

    def test_stop_action(self):
        env = self._make()
        reward, _, done = env.step(2)
        assert done


class TestPPO:
    @pytest.fixture(scope="class")
    def trainer(self):
        return PPOTrainer(
            action_space=2, ppo_epochs=2, clip_param=0.2,
            value_loss_coef=0.5, entropy_coef=1e-4, target_kl_div=0.02,
            lr=1e-4, optim_str="Adam", arch="resnet18", dropout=0.0)

    @pytest.mark.slow
    def test_rollout_and_optimize(self, trainer):
        rng = np.random.default_rng(3)
        storage = RolloutStorage(num_envs=4, num_steps=3, num_mini_batch=2)
        sam = FakeSAMController()
        for e in range(4):
            img = _normed(rng.uniform(0, 1, (64, 80, 3)).astype(np.float32))
            gt = np.zeros((64, 80), np.float32)
            gt[10:40, 10:50] = 1
            init = np.roll(gt, 4, axis=0)
            steps = rollout(trainer, sam, img, gt, init, e, storage,
                            num_steps=3, gamma=0.95, advantages="gae",
                            rng=rng)
            assert 1 <= steps <= 3

        assert np.isfinite(storage.mean_valid_reward())
        loss = trainer.optimize(storage, rng)
        assert np.isfinite(loss)

    def test_agent_act(self, trainer):
        agent = PPOAgent(2, "resnet18",
                         {"params": trainer.state.params,
                          "batch_stats": trainer.state.batch_stats})
        emb = np.zeros((1, 64, 64, 256), np.float32)
        mask = np.zeros((1, 224, 224, 3), np.float32)
        action, value = agent.act(emb, mask)
        assert action in (0, 1)
        assert np.isfinite(value)

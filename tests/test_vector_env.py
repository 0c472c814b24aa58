"""Vectorized PPO envs vs the sequential reference-semantics env."""

import numpy as np
import pytest

from eva_vos_tpu.annotator import FakeSAMController
from eva_vos_tpu.train.ppo import (AnnotationEnv, VectorizedAnnotationEnvs,
                                   RolloutStorage, batched_rollouts,
                                   PPOTrainer)
from eva_vos_tpu.ops.normalize import IMAGENET_MEAN, IMAGENET_STD

H, W = 64, 80


def make_items(n, seed=0):
    rng = np.random.default_rng(seed)
    images, gts, inits = [], [], []
    for i in range(n):
        img = (rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
               - IMAGENET_MEAN) / IMAGENET_STD
        gt = np.zeros((H, W), np.float32)
        y, x = 10 + 4 * i, 12 + 3 * i
        gt[y:y + 28, x:x + 36] = 1
        init = np.roll(gt, 3, axis=0)
        images.append(img)
        gts.append(gt)
        inits.append(init)
    return images, gts, inits


class TestVectorMatchesSequential:
    @pytest.mark.parametrize("actions_per_step", [
        [[0, 0], [0, 0], [0, 0]],     # all clicks to max steps
        [[1, 0], [2, 0], [2, 1]],     # mask/stop mixes
    ])
    def test_lockstep_equivalence(self, actions_per_step):
        images, gts, inits = make_items(2)
        vec = VectorizedAnnotationEnvs(FakeSAMController(), images, gts,
                                       inits, max_steps=3)
        seq = [AnnotationEnv(FakeSAMController(), images[e], gts[e],
                             inits[e], max_steps=3) for e in range(2)]

        seq_rewards = [[], []]
        seq_done = [False, False]
        vec_rewards = [[], []]
        for step_actions in actions_per_step:
            r, d = vec.step(np.asarray(step_actions))
            for e in range(2):
                if not seq_done[e]:
                    vec_rewards[e].append(r[e])
                    sr, _, sd = seq[e].step(step_actions[e])
                    seq_rewards[e].append(sr)
                    seq_done[e] = sd
            if all(seq_done):
                break

        for e in range(2):
            np.testing.assert_allclose(vec_rewards[e], seq_rewards[e],
                                       rtol=1e-6, atol=1e-8,
                                       err_msg=f"env {e} rewards diverge")
            assert vec.env_state[e]["cost"] == seq[e].annotation_cost
            assert vec.env_state[e]["iou"] == pytest.approx(seq[e].iou)

    def test_warm_start_matches(self):
        images, gts, inits = make_items(3, seed=4)
        vec = VectorizedAnnotationEnvs(FakeSAMController(), images, gts,
                                       inits, max_steps=3)
        for e in range(3):
            env = AnnotationEnv(FakeSAMController(), images[e], gts[e],
                                inits[e], max_steps=3)
            np.testing.assert_array_equal(vec.env_state[e]["sam_mask"],
                                          env.sam_mask)
            assert vec.env_state[e]["init_iou"] == pytest.approx(env.init_iou)


class TestBatchedRollouts:
    @pytest.mark.slow
    def test_fills_storage(self):
        trainer = PPOTrainer(
            action_space=2, ppo_epochs=1, clip_param=0.2,
            value_loss_coef=0.5, entropy_coef=1e-4, target_kl_div=None,
            lr=1e-4, optim_str="Adam", arch="resnet18", dropout=0.0)
        images, gts, inits = make_items(4, seed=7)
        storage = RolloutStorage(num_envs=4, num_steps=3, num_mini_batch=2)
        rng = np.random.default_rng(0)
        batched_rollouts(trainer, FakeSAMController(), images, gts, inits,
                         storage, num_steps=3, gamma=0.95, advantages="gae",
                         rng=rng)
        assert (~storage.paddings).any(axis=1).all()  # every env has steps
        loss = trainer.optimize(storage, rng)
        assert np.isfinite(loss)


class TestBatchedSamDecodeParity:
    @pytest.mark.slow
    def test_predict_batch_matches_sequential(self, rng):
        from eva_vos_tpu.models.sam import build_sam, SamPredictor

        sam, params = build_sam("tiny")
        pred = SamPredictor(sam, params, max_points=16)
        imgs = [(rng.uniform(0, 1, (48, 60, 3)) * 255).astype(np.uint8)
                for _ in range(3)]
        feats = pred.encode_images(imgs)

        prompts = [
            {"point_coords": np.array([[30, 20]]),
             "point_labels": np.array([1])},
            {"point_coords": np.array([[10, 10], [40, 30]]),
             "point_labels": np.array([1, 0])},
            {"box": np.array([5, 5, 40, 40])},
        ]
        batch_out = pred.predict_batch(feats, (48, 60), prompts)

        for i, pr in enumerate(prompts):
            pred.set_image(imgs[i])
            masks, iou, low = pred.predict(
                point_coords=pr.get("point_coords"),
                point_labels=pr.get("point_labels"),
                box=pr.get("box"))
            np.testing.assert_allclose(batch_out[i][2], low, rtol=2e-4,
                                       atol=2e-4)
            np.testing.assert_array_equal(batch_out[i][0], masks)

"""Rollout storage with fixed-shape minibatches.

Behavior parity target: ``ppo/storage.py`` — per-env episode buffers with
padding flags and a shuffled minibatch generator.

TPU twist: the reference emits variable-length minibatches (only valid
steps are concatenated), which would retrace the jitted update for every
distinct size.  Here every minibatch is a FIXED [envs_per_batch * num_steps]
block: padding slots repeat a valid sample and carry weight 0, so gradients
are identical to the reference's variable-length math while the update
compiles exactly once.
"""

from __future__ import annotations

import numpy as np


class RolloutStorage:
    def __init__(self, num_envs, num_steps, obs_hw=(224, 224),
                 embed_shape=(64, 64, 256), num_mini_batch=4):
        assert num_envs >= num_mini_batch
        self.num_envs = num_envs
        self.num_steps = num_steps
        self.num_mini_batch = num_mini_batch

        self.masks = np.zeros((num_envs, num_steps, *obs_hw, 3), np.float32)
        self.img_embeddings = np.zeros((num_envs, *embed_shape), np.float32)
        self.rewards = np.zeros((num_envs, num_steps), np.float32)
        self.value_preds = np.zeros((num_envs, num_steps), np.float32)
        self.returns = np.zeros((num_envs, num_steps), np.float32)
        self.action_log_probs = np.zeros((num_envs, num_steps), np.float32)
        self.actions = np.zeros((num_envs, num_steps), np.int32)
        self.paddings = np.ones((num_envs, num_steps), bool)
        self.advantages = np.zeros((num_envs, num_steps), np.float32)

    def insert(self, env_num, masks, img_embedding, actions, log_probs,
               values, rewards, returns, paddings, advantages):
        """Episode tensors are only filled up to the episode length; the
        rest stays padding."""
        steps = len(actions)
        self.masks[env_num, :steps] = masks
        self.img_embeddings[env_num] = img_embedding
        self.actions[env_num, :steps] = actions
        self.action_log_probs[env_num, :steps] = log_probs
        self.value_preds[env_num, :steps] = values
        self.rewards[env_num, :steps] = rewards
        self.returns[env_num, :steps] = returns
        self.paddings[env_num] = True
        self.paddings[env_num, :steps] = np.asarray(paddings[:steps])
        self.advantages[env_num, :steps] = advantages

    def mean_valid_reward(self) -> float:
        valid = ~self.paddings
        return float(self.rewards[valid].mean()) if valid.any() else 0.0

    def data_generator(self, rng: np.random.Generator):
        """Yields fixed-shape minibatches:
        dict(masks, embeddings, actions, values, returns, old_log_probs,
             advantages, weights) with leading dim envs_per_batch*num_steps.
        """
        envs_per_batch = self.num_envs // self.num_mini_batch
        perm = rng.permutation(self.num_envs)

        for start in range(0, self.num_envs, envs_per_batch):
            env_ids = perm[start:start + envs_per_batch]
            size = envs_per_batch * self.num_steps

            out = {
                "masks": np.zeros((size, *self.masks.shape[2:]), np.float32),
                "embeddings": np.zeros(
                    (size, *self.img_embeddings.shape[1:]), np.float32),
                "actions": np.zeros((size,), np.int32),
                "values": np.zeros((size,), np.float32),
                "returns": np.zeros((size,), np.float32),
                "old_log_probs": np.zeros((size,), np.float32),
                "advantages": np.zeros((size,), np.float32),
                "weights": np.zeros((size,), np.float32),
            }

            cursor = 0
            for e in env_ids:
                valid = np.where(~self.paddings[e])[0]
                for t in valid:
                    out["masks"][cursor] = self.masks[e, t]
                    out["embeddings"][cursor] = self.img_embeddings[e]
                    out["actions"][cursor] = self.actions[e, t]
                    out["values"][cursor] = self.value_preds[e, t]
                    out["returns"][cursor] = self.returns[e, t]
                    out["old_log_probs"][cursor] = self.action_log_probs[e, t]
                    out["advantages"][cursor] = self.advantages[e, t]
                    out["weights"][cursor] = 1.0
                    cursor += 1

            if cursor == 0:
                continue
            # fill padding slots by cycling valid samples (weight 0) so
            # batch statistics stay finite and shapes stay fixed
            for j in range(cursor, size):
                src = j % cursor
                for k in out:
                    if k != "weights":
                        out[k][j] = out[k][src]
            yield out

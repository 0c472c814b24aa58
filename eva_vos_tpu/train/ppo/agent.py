"""Inference-time PPO agent (reference ``ppo/ppo_agent.py``)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...models.rl_agent import ActorCritic


class PPOAgent:
    """Loads ActorCritic variables; ``act`` samples from the categorical
    policy and returns (action, value)."""

    def __init__(self, action_space, arch, variables, return_logits=False,
                 seed: int = 0, dtype=jnp.float32):
        self.net = ActorCritic(out_dim=action_space, arch=arch, dropout=0.0,
                               dtype=dtype)
        self.variables = variables
        self.return_logits = return_logits
        self._key = jax.random.PRNGKey(seed)
        self._fwd = jax.jit(lambda v, e, m: self.net.apply(v, e, m))

    def act(self, x_img, x_mask, x_cost=None):
        logits, value = self._fwd(self.variables, jnp.asarray(x_img),
                                  jnp.asarray(x_mask))
        logits = logits.astype(jnp.float32)
        if self.return_logits:
            return np.asarray(logits), np.asarray(value)
        self._key, sub = jax.random.split(self._key)
        action = int(jax.random.categorical(sub, logits[0]))
        return action, float(jnp.squeeze(value))

    def act_fn(self):
        """Adapter matching ``rl_agent_annotate``'s expected callable."""

        def fn(emb, mask224):
            return self.act(emb, mask224)

        return fn

"""Clipped-surrogate PPO trainer.

Behavior parity target: ``ppo/ppo_trainer.py`` — ratio clip 0.2, MSE value
loss x 0.5, entropy bonus, per-epoch KL early stop, AdamW/SGD at lr 1e-5.

TPU-first: ``act`` and the minibatch update are each one jitted program;
minibatches arrive fixed-shape with per-sample weights (see storage.py), so
the whole optimization runs without a single retrace.  BatchNorm runs on
batch statistics inside the update (the reference trains in ``.train()``
mode); weighted masking keeps padded slots out of the loss.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ...models.rl_agent import ActorCritic


class PPOTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any


class PPOTrainer:
    """``mesh``: optional ``jax.sharding.Mesh`` — the minibatch update then
    runs data-parallel (batch axis sharded, params replicated, XLA inserts
    the gradient all-reduce over ICI; BatchNorm statistics reduce over the
    global batch).  The reference trains PPO on one GPU
    (``config/rl_agent.yaml``); this is the TPU scale-out path."""

    def __init__(self, action_space, ppo_epochs, clip_param, value_loss_coef,
                 entropy_coef, target_kl_div, lr, optim_str, arch, dropout,
                 dtype=jnp.float32, seed: int = 0, mesh=None):
        assert optim_str in {"Adam", "SGD"}
        self.action_space = action_space
        self.ppo_epochs = ppo_epochs
        self.clip_param = clip_param
        self.value_loss_coef = value_loss_coef
        self.entropy_coef = entropy_coef
        self.target_kl_div = target_kl_div

        self.net = ActorCritic(out_dim=action_space, arch=arch,
                               dropout=dropout, dtype=dtype)
        self.tx = optax.adamw(lr) if optim_str == "Adam" else \
            optax.sgd(lr, momentum=0.9)

        emb = jnp.zeros((1, 64, 64, 256))
        mask = jnp.zeros((1, 224, 224, 3))
        variables = self.net.init(jax.random.PRNGKey(seed), emb, mask)
        self.state = PPOTrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]))
        self._act_key = jax.random.PRNGKey(seed + 1)

        self._fwd = jax.jit(self._fwd_impl)
        if mesh is not None:
            from ...parallel.mesh import data_sharding, replicated_sharding

            repl = replicated_sharding(mesh)
            data = data_sharding(mesh)
            self._update = jax.jit(
                self._update_impl, donate_argnums=(0,),
                in_shardings=(repl, data, repl),
                out_shardings=(repl, repl, repl))
        else:
            self._update = jax.jit(self._update_impl, donate_argnums=(0,))

        n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
        print(f"Trainable parameters: {n_params / 1e6:.2f}M")

    # ------------------------------------------------------------------
    def _fwd_impl(self, state: PPOTrainState, emb, mask):
        logits, value = self.net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            emb, mask)
        return logits.astype(jnp.float32), value.astype(jnp.float32)

    def act(self, x_img, x_mask, x_cost=None, rng=None):
        """Sample an action; returns (action, log_prob, value)."""
        logits, value = self._fwd(self.state, jnp.asarray(x_img),
                                  jnp.asarray(x_mask))
        self._act_key, sub = jax.random.split(self._act_key)
        action = jax.random.categorical(sub, logits[0])
        log_prob = jax.nn.log_softmax(logits[0])[action]
        return int(action), float(log_prob), float(value.squeeze())

    def act_batch(self, x_imgs, x_masks):
        """Vectorized act over N envs: one forward, N categorical samples.
        Returns (actions [N], log_probs [N], values [N]) as numpy."""
        logits, values = self._fwd(self.state, jnp.asarray(x_imgs),
                                   jnp.asarray(x_masks))
        self._act_key, sub = jax.random.split(self._act_key)
        actions = jax.random.categorical(sub, logits, axis=-1)
        lp = jnp.take_along_axis(jax.nn.log_softmax(logits),
                                 actions[:, None], axis=1)[:, 0]
        return (np.asarray(actions), np.asarray(lp),
                np.asarray(values[:, 0]))

    # ------------------------------------------------------------------
    def _update_impl(self, state: PPOTrainState, batch, dropout_rng):
        def loss_fn(params):
            (logits, values), mutated = self.net.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["embeddings"], batch["masks"], train=True,
                rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
            logits = logits.astype(jnp.float32)
            values = values.astype(jnp.float32)

            log_probs = jax.nn.log_softmax(logits)
            act_lp = jnp.take_along_axis(
                log_probs, batch["actions"][:, None], axis=1)[:, 0]
            entropy = -jnp.sum(jnp.exp(log_probs) * log_probs, axis=1)

            w = batch["weights"]
            wsum = jnp.maximum(w.sum(), 1.0)

            ratios = jnp.exp(act_lp - batch["old_log_probs"])
            surr1 = ratios * batch["advantages"]
            surr2 = jnp.clip(ratios, 1 - self.clip_param,
                             1 + self.clip_param) * batch["advantages"]
            policy_loss = -(jnp.minimum(surr1, surr2) * w).sum() / wsum
            critic_loss = (((values[:, 0] - batch["returns"]) ** 2) * w
                           ).sum() / wsum
            ent = (entropy * w).sum() / wsum
            loss = policy_loss + self.value_loss_coef * critic_loss \
                - self.entropy_coef * ent

            kl = ((batch["old_log_probs"] - act_lp) * w).sum() / wsum
            return loss, (mutated["batch_stats"], kl)

        (loss, (new_stats, kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return PPOTrainState(params, new_stats, opt_state), loss, kl

    def optimize(self, rollouts, rng: np.random.Generator) -> float:
        total_loss = 0.0
        steps = 0
        for _ in range(self.ppo_epochs):
            for batch in rollouts.data_generator(rng):
                jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
                self._act_key, sub = jax.random.split(self._act_key)
                self.state, loss, kl = self._update(self.state, jbatch, sub)
                total_loss += float(loss)
                steps += 1
                if (self.target_kl_div is not None
                        and float(kl) >= self.target_kl_div):
                    break
        return total_loss / max(steps, 1)

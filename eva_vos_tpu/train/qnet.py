"""Data-parallel QNet trainer.

Behavior parity target: ``train_qnet.py`` in the reference — 20-bin CE over
(frame, mask) pairs, SGD(momentum 0.9) or AdamW at lr 1e-5, 30 epochs.

TPU-first: the reference's one-process-per-GPU NCCL DDP
(``train_qnet.py:130-138``, ``util/dist.py:18-45``) becomes a single jitted
train step over a named mesh: the batch axis is sharded, parameters are
replicated, and XLA inserts the gradient all-reduce over ICI.  BatchNorm
statistics reduce over the *global* batch (sync-BN — strictly better than
the reference's per-replica stats with ``broadcast_buffers=False``).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.qnet import QualityNet
from ..parallel.mesh import make_mesh, data_sharding, replicated_sharding

Dtype = Any


class QNetTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def _mask_to_3ch(mask):
    return jnp.repeat(mask[..., None], 3, axis=-1)


class QNetTrainer:
    def __init__(self, arch: str = "resnet18", n_labels: int = 20,
                 lr: float = 1e-5, optim: str = "SGD",
                 merge_strategy: str = "cat", mesh=None, dtype=jnp.float32):
        assert optim in {"Adam", "SGD"}
        self.net = QualityNet(arch=arch, n_labels=n_labels,
                              merge_strategy=merge_strategy, dtype=dtype)
        if optim == "Adam":
            self.tx = optax.adamw(lr)
        else:
            self.tx = optax.sgd(lr, momentum=0.9)
        self.mesh = mesh if mesh is not None else make_mesh()

        repl = replicated_sharding(self.mesh)
        data = data_sharding(self.mesh)
        self._train_step = jax.jit(
            self._train_step_impl,
            in_shardings=(repl, (data, data, data), repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            self._eval_step_impl,
            in_shardings=(repl, (data, data, data)),
            out_shardings=repl,
        )

    # ------------------------------------------------------------------
    def init(self, rng, image_size: int = 224) -> QNetTrainState:
        x = jnp.zeros((1, image_size, image_size, 3))
        variables = self.net.init(rng, x, x)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return QNetTrainState(
            params=params, batch_stats=batch_stats,
            opt_state=self.tx.init(params), step=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------
    def _loss(self, params, batch_stats, imgs, masks3, labels, dropout_rng):
        out, mutated = self.net.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs, masks3, True,
            rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
        loss = optax.softmax_cross_entropy_with_integer_labels(
            out.astype(jnp.float32), labels).mean()
        acc = (jnp.argmax(out, -1) == labels).mean()
        return loss, (mutated["batch_stats"], acc)

    def _train_step_impl(self, state: QNetTrainState, batch, dropout_rng):
        imgs, masks, labels = batch
        masks3 = _mask_to_3ch(masks)
        grad_fn = jax.value_and_grad(self._loss, has_aux=True)
        (loss, (new_stats, acc)), grads = grad_fn(
            state.params, state.batch_stats, imgs, masks3, labels, dropout_rng)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = QNetTrainState(params=params, batch_stats=new_stats,
                                   opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss, "acc": acc}

    def _eval_step_impl(self, state: QNetTrainState, batch):
        imgs, masks, labels = batch
        out = self.net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            imgs, _mask_to_3ch(masks))
        loss = optax.softmax_cross_entropy_with_integer_labels(
            out.astype(jnp.float32), labels).mean()
        acc = (jnp.argmax(out, -1) == labels).mean()
        return {"loss": loss, "acc": acc}

    # ------------------------------------------------------------------
    def train_step(self, state, batch, dropout_rng):
        """batch: dict with 'img' [B,S,S,3], 'mask' [B,S,S], 'label' [B]."""
        arrays = (jnp.asarray(batch["img"]), jnp.asarray(batch["mask"]),
                  jnp.asarray(batch["label"]))
        return self._train_step(state, arrays, dropout_rng)

    def eval_step(self, state, batch):
        arrays = (jnp.asarray(batch["img"]), jnp.asarray(batch["mask"]),
                  jnp.asarray(batch["label"]))
        return self._eval_step(state, arrays)

    def extract_fn(self, state):
        """jitted feature extractor for frame-selection policies."""

        @jax.jit
        def extract(imgs, masks):
            return self.net.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                imgs, masks, method="extract_features")

        return extract

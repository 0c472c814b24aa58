"""Multi-object soft aggregation.

Combines K independent per-object sigmoid probabilities into a (K+1)-way
distribution including background.  Parity target: ``mivos/model/aggregate.py``
(background prob is the product of per-object complements, probabilities are
clamped, converted to logits, and softmaxed over the object axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7


def _logits_softmax(new_prob: jnp.ndarray, keep_bg: bool, hard: bool, axis: int):
    new_prob = jnp.clip(new_prob, _EPS, 1.0 - _EPS)
    logits = jnp.log(new_prob / (1.0 - new_prob))
    if hard:
        logits = logits * 1000.0
    out = jax.nn.softmax(logits, axis=axis)
    if keep_bg:
        return out
    return jax.lax.slice_in_dim(out, 1, out.shape[axis], axis=axis)


def aggregate_wbg(prob: jnp.ndarray, keep_bg: bool = False, hard: bool = False) -> jnp.ndarray:
    """prob: [K, ...spatial] per-object probabilities -> [K(+1), ...spatial]."""
    bg = jnp.prod(1.0 - prob, axis=0, keepdims=True)
    new_prob = jnp.concatenate([bg, prob], axis=0)
    return _logits_softmax(new_prob, keep_bg, hard, axis=0)


def aggregate_sbg(prob: jnp.ndarray, keep_bg: bool = False, hard: bool = False) -> jnp.ndarray:
    """Background fixed at 0.5 instead of the product-of-complements."""
    bg = jnp.full_like(prob[:1], 0.5)
    new_prob = jnp.concatenate([bg, prob], axis=0)
    return _logits_softmax(new_prob, keep_bg, hard, axis=0)


def aggregate_wbg_channel(prob: jnp.ndarray, keep_bg: bool = False, hard: bool = False):
    """Batched variant over axis 1: prob [B, K, ...] -> (logits, softmax)."""
    bg = jnp.prod(1.0 - prob, axis=1, keepdims=True)
    new_prob = jnp.clip(jnp.concatenate([bg, prob], axis=1), _EPS, 1.0 - _EPS)
    logits = jnp.log(new_prob / (1.0 - new_prob))
    if hard:
        logits = logits * 1000.0
    out = jax.nn.softmax(logits, axis=1)
    if keep_bg:
        return logits, out
    return logits, out[:, 1:]

"""Resize helpers (channel-last).

Wraps ``jax.image.resize`` with the interpolation modes the pipeline needs:
* bilinear, align_corners=False (decoder upsampling, attention maps) — jax's
  half-pixel convention matches torch ``F.interpolate(align_corners=False)``.
* nearest (mask resizing to 224 for QNet / the RL agent).
* bicubic (image resizing to 224).
* area (16x downsample of mask diffs for the fusion attention,
  reference ``prop_net.py:205-206``) — implemented as average pooling since
  inputs are exact multiples of the target.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, out_hw, h_axis: int = -3, w_axis: int = -2):
    shape = list(x.shape)
    shape[h_axis % x.ndim] = out_hw[0]
    shape[w_axis % x.ndim] = out_hw[1]
    return jax.image.resize(x, tuple(shape), method="bilinear").astype(x.dtype)


def upsample2x(x: jnp.ndarray):
    """[..., H, W, C] -> [..., 2H, 2W, C] bilinear."""
    h, w = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, (2 * h, 2 * w))


def resize_nearest(x: jnp.ndarray, out_hw, h_axis: int = -2, w_axis: int = -1):
    shape = list(x.shape)
    shape[h_axis % x.ndim] = out_hw[0]
    shape[w_axis % x.ndim] = out_hw[1]
    return jax.image.resize(x, tuple(shape), method="nearest")


def resize_bicubic(x: jnp.ndarray, out_hw, h_axis: int = -3, w_axis: int = -2):
    shape = list(x.shape)
    shape[h_axis % x.ndim] = out_hw[0]
    shape[w_axis % x.ndim] = out_hw[1]
    return jax.image.resize(x, tuple(shape), method="bicubic").astype(x.dtype)


def area_downsample(x: jnp.ndarray, factor: int):
    """Average-pool [..., H, W] by an integer factor (torch ``mode='area'``)."""
    *lead, h, w = x.shape
    x = x.reshape(*lead, h // factor, factor, w // factor, factor)
    return x.mean(axis=(-3, -1))

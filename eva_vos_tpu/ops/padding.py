"""Pad-to-multiple helpers.

The propagation network downsamples by 16, so every frame/mask entering the
engine is symmetrically zero-padded until H and W are multiples of 16 and the
padding is stripped again before metrics are computed.  Parity target:
``mivos/tensor_util.py:62-94`` in the reference (pad amounts split low/high
exactly the same way, pad tuple ordered ``(lw, uw, lh, uh)``).
"""

from __future__ import annotations

import jax.numpy as jnp

Pad = tuple[int, int, int, int]  # (left_w, right_w, top_h, bottom_h)


def compute_pad(h: int, w: int, d: int = 16) -> Pad:
    """Padding needed to bring (h, w) to multiples of d, split evenly.

    The low side gets ``floor(extra / 2)`` and the high side the remainder,
    matching the reference's asymmetric split for odd pad amounts.
    """
    new_h = h if h % d == 0 else h + d - h % d
    new_w = w if w % d == 0 else w + d - w % d
    lh = (new_h - h) // 2
    uh = (new_h - h) - lh
    lw = (new_w - w) // 2
    uw = (new_w - w) - lw
    return (lw, uw, lh, uh)


def pad_hw(x: jnp.ndarray, pad: Pad, h_axis: int = -2, w_axis: int = -1) -> jnp.ndarray:
    """Zero-pad the H and W axes of ``x`` with a precomputed pad tuple."""
    lw, uw, lh, uh = pad
    widths = [(0, 0)] * x.ndim
    widths[h_axis % x.ndim] = (lh, uh)
    widths[w_axis % x.ndim] = (lw, uw)
    return jnp.pad(x, widths)


def pad_divide_by(x: jnp.ndarray, d: int = 16, h_axis: int = -2, w_axis: int = -1):
    """Pad ``x`` so its H/W axes are multiples of ``d``; returns (padded, pad)."""
    h = x.shape[h_axis % x.ndim]
    w = x.shape[w_axis % x.ndim]
    pad = compute_pad(h, w, d)
    return pad_hw(x, pad, h_axis, w_axis), pad


def unpad_hw(x: jnp.ndarray, pad: Pad, h_axis: int = -2, w_axis: int = -1) -> jnp.ndarray:
    """Strip padding applied by :func:`pad_hw`."""
    lw, uw, lh, uh = pad
    h_axis %= x.ndim
    w_axis %= x.ndim
    idx = [slice(None)] * x.ndim
    if lh + uh > 0:
        idx[h_axis] = slice(lh, x.shape[h_axis] - uh)
    if lw + uw > 0:
        idx[w_axis] = slice(lw, x.shape[w_axis] - uw)
    return x[tuple(idx)]

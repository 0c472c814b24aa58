"""Shared network blocks (channel-last, Flax linen).

Structural parity targets: ``mivos/model/propagation/modules.py`` and
``mivos/model/propagation/cbam.py`` in the reference.  Parameters are stored
fp32; compute dtype is configurable (bf16 on TPU).  Convolutions carry biases
exactly where the reference does (mod_resnet convs have biases, torchvision
ones do not) so converted checkpoints map 1:1.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..ops.resize import upsample2x

Dtype = Any


class ResBlock(nn.Module):
    """Pre-activation residual block with 3x3 convs (``modules.py:15-35``)."""

    outdim: int
    downsample: bool = False  # 3x3 conv on the skip when indim != outdim
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = nn.Conv(self.outdim, (3, 3), padding=1, dtype=self.dtype, name="conv1")(nn.relu(x))
        r = nn.Conv(self.outdim, (3, 3), padding=1, dtype=self.dtype, name="conv2")(nn.relu(r))
        if self.downsample or x.shape[-1] != self.outdim:
            x = nn.Conv(self.outdim, (3, 3), padding=1, dtype=self.dtype, name="downsample")(x)
        return x + r


class ChannelGate(nn.Module):
    """CBAM channel attention: shared MLP over avg- and max-pooled stats."""

    gate_channels: int
    reduction_ratio: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = self.gate_channels // self.reduction_ratio
        dense1 = nn.Dense(hidden, dtype=self.dtype, name="mlp_1")
        dense2 = nn.Dense(self.gate_channels, dtype=self.dtype, name="mlp_2")

        avg = jnp.mean(x, axis=(-3, -2))
        mx = jnp.max(x, axis=(-3, -2))
        att = dense2(nn.relu(dense1(avg))) + dense2(nn.relu(dense1(mx)))
        scale = nn.sigmoid(att)[..., None, None, :]
        return x * scale


class SpatialGate(nn.Module):
    """CBAM spatial attention: 7x7 conv over [max, mean] channel pool."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pooled = jnp.concatenate(
            [jnp.max(x, axis=-1, keepdims=True), jnp.mean(x, axis=-1, keepdims=True)],
            axis=-1,
        )
        att = nn.Conv(1, (7, 7), padding=3, dtype=self.dtype, name="spatial")(pooled)
        return x * nn.sigmoid(att)


class CBAM(nn.Module):
    gate_channels: int
    reduction_ratio: int = 16
    no_spatial: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ChannelGate(self.gate_channels, self.reduction_ratio, dtype=self.dtype,
                        name="channel_gate")(x)
        if not self.no_spatial:
            x = SpatialGate(dtype=self.dtype, name="spatial_gate")(x)
        return x


class FeatureFusionBlock(nn.Module):
    """ResBlock -> CBAM (residual) -> ResBlock over concatenated features."""

    outdim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, f16):
        x = jnp.concatenate([x, f16], axis=-1)
        x = ResBlock(self.outdim, dtype=self.dtype, name="block1")(x)
        r = CBAM(self.outdim, dtype=self.dtype, name="attention")(x)
        x = ResBlock(self.outdim, dtype=self.dtype, name="block2")(x + r)
        return x


class UpsampleBlock(nn.Module):
    """skip_conv(skip) + 2x bilinear(up) -> ResBlock (``modules.py:152-163``).

    ``skip_is_conv=True`` means ``skip_f`` is already the skip_conv output
    (the engine hoists the per-frame skip convs into its once-per-video
    feature precompute — identical math, see ``Decoder.skips``).
    """

    up_c: int
    out_c: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.skip_conv = nn.Conv(self.up_c, (3, 3), padding=1,
                                 dtype=self.dtype)
        self.out_conv = ResBlock(self.out_c, dtype=self.dtype)

    def skip(self, skip_f):
        return self.skip_conv(skip_f)

    def __call__(self, skip_f, up_f, skip_is_conv: bool = False):
        x = skip_f if skip_is_conv else self.skip_conv(skip_f)
        x = x + upsample2x(up_f)
        return self.out_conv(x)


class KeyProjection(nn.Module):
    """1024 -> keydim 3x3 conv, orthogonally initialized (``modules.py:166-175``)."""

    keydim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.keydim, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=nn.initializers.orthogonal(), name="key_proj",
        )(x)

"""ResNet backbones in Flax (channel-last).

Two flavors, matching the two weight families the reference uses:

* ``conv_bias=False`` — torchvision-style (KeyEncoder R50 trunk,
  QNet/ActorCritic branches, feature extractors).
* ``conv_bias=True``  — the reference's ``mod_resnet`` variant with biased
  convs and an ``extra_chan``-widened stem (ValueEncoder R18 trunk),
  see ``mivos/model/propagation/mod_resnet.py``.

BatchNorm uses running statistics by default (inference); trainers flip
``train=True`` and carry ``batch_stats`` mutably.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

Dtype = Any

_EPS = 1e-5


class _BN(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    conv_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=self.conv_bias, dtype=self.dtype, name="conv1")(x)
        out = _BN(self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1,
                      use_bias=self.conv_bias, dtype=self.dtype, name="conv2")(out)
        out = _BN(self.dtype, name="bn2")(out, train)
        if self.has_downsample:
            residual = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=self.conv_bias, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = _BN(self.dtype, name="downsample_bn")(residual, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    conv_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=self.conv_bias,
                      dtype=self.dtype, name="conv1")(x)
        out = nn.relu(_BN(self.dtype, name="bn1")(out, train))
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=self.conv_bias, dtype=self.dtype, name="conv2")(out)
        out = nn.relu(_BN(self.dtype, name="bn2")(out, train))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=self.conv_bias,
                      dtype=self.dtype, name="conv3")(out)
        out = _BN(self.dtype, name="bn3")(out, train)
        if self.has_downsample:
            residual = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                               use_bias=self.conv_bias, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = _BN(self.dtype, name="downsample_bn")(residual, train)
        return nn.relu(out + residual)


_ARCHS = {
    # name: (block, layers, expansion)
    "resnet18": (BasicBlock, (2, 2, 2, 2), 1),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 1),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 4),
    "resnet101": (Bottleneck, (3, 4, 23, 3), 4),
}


class ResNetTrunk(nn.Module):
    """Stem + layer1..layerN of a ResNet, returning all stage features.

    ``num_stages`` controls how deep to build (3 = cut at layer3, as the
    KeyEncoder/ValueEncoder do; 4 = full trunk for QNet branches).
    """

    arch: str = "resnet50"
    num_stages: int = 4
    in_extra_chan: int = 0  # informational; channel-last convs infer input dim
    conv_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, layers, expansion = _ARCHS[self.arch]

        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=self.conv_bias,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(_BN(self.dtype, name="bn1")(x, train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        inplanes = 64
        for stage in range(self.num_stages):
            planes = 64 * (2 ** stage)
            stride = 1 if stage == 0 else 2
            blocks = layers[stage]
            for b in range(blocks):
                has_ds = b == 0 and (stride != 1 or inplanes != planes * expansion)
                x = block_cls(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    has_downsample=has_ds,
                    conv_bias=self.conv_bias,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
            inplanes = planes * expansion
            feats.append(x)
        return tuple(feats)


def feature_dims(arch: str, num_stages: int = 4) -> Sequence[int]:
    _, _, expansion = _ARCHS[arch]
    return [64 * (2 ** s) * expansion for s in range(num_stages)]

"""QualityNet (QNet): per-frame mask-quality scorer.

Parity target: ``models/qnet.py`` + ``models/modules.py`` in the reference —
two CNN branches (rgb + mask-as-3-channels), merged (cat/add), dropout,
linear head over 20 IoU bins.  ``extract_features`` returns the merged
pre-head features used for farthest-point frame selection.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from .resnet import ResNetTrunk

Dtype = Any

_BRANCH_DIMS = {"small": 1024, "resnet18": 512, "resnet50": 2048, "resnet101": 2048}


class CNNBranch(nn.Module):
    """ResNet trunk + global average pool -> feature vector.

    'small' = ResNet-50 cut at layer3 (1024-d); others use the full trunk.
    The reference pools with a fixed 7x7 (or 14x14) AvgPool on 224 inputs —
    global average pooling is equivalent at that resolution and
    resolution-independent.
    """

    arch: str = "resnet18"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_stages = 3 if self.arch == "small" else 4
        trunk_arch = "resnet50" if self.arch == "small" else self.arch
        feats = ResNetTrunk(
            arch=trunk_arch, num_stages=num_stages, conv_bias=False,
            dtype=self.dtype, name="trunk",
        )(x, train)
        return jnp.mean(feats[-1], axis=(-3, -2))

    @property
    def out_dim(self) -> int:
        return _BRANCH_DIMS[self.arch]


class QualityNet(nn.Module):
    merge_strategy: str = "cat"
    arch: str = "resnet18"
    n_labels: int = 20
    dropout: float = 0.5
    dtype: Dtype = jnp.float32

    def setup(self):
        assert self.merge_strategy in {"add", "cat", "attn"}
        assert self.arch in {"small", "resnet18", "resnet50", "resnet101"}
        self.rgb_branch = CNNBranch(arch=self.arch, dtype=self.dtype)
        self.mask_branch = CNNBranch(arch=self.arch, dtype=self.dtype)
        dim = _BRANCH_DIMS[self.arch]
        if self.merge_strategy == "cat":
            dim *= 2
        elif self.merge_strategy == "attn":
            # single-head attention with mask features querying rgb features
            # (reference qnet.py:25-30, modules.py:143-150)
            self.query_proj = nn.Dense(_BRANCH_DIMS[self.arch],
                                       dtype=self.dtype)
            self.key_proj = nn.Dense(_BRANCH_DIMS[self.arch],
                                     dtype=self.dtype)
            self.value_proj = nn.Dense(_BRANCH_DIMS[self.arch],
                                       dtype=self.dtype)
            self.attn_mod = nn.MultiHeadDotProductAttention(
                num_heads=1, dtype=self.dtype)
        self.out_layer = nn.Dense(1 if self.n_labels == 2 else self.n_labels,
                                  dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)
        self._feat_dim = dim

    def merge(self, rgb_out, mask_out):
        if self.merge_strategy == "add":
            return rgb_out + mask_out
        if self.merge_strategy == "attn":
            q = self.query_proj(mask_out)[:, None, :]
            k = self.key_proj(rgb_out)[:, None, :]
            v = self.value_proj(rgb_out)[:, None, :]
            return self.attn_mod(q, k, v)[:, 0, :]
        return jnp.concatenate([rgb_out, mask_out], axis=-1)

    def features(self, x_rgb, x_mask, train: bool = False):
        rgb_out = self.rgb_branch(x_rgb, train)
        mask_out = self.mask_branch(x_mask, train)
        return self.merge(rgb_out, mask_out)

    def __call__(self, x_rgb, x_mask, train: bool = False, rngs_dropout=None):
        """x_rgb/x_mask [B, 224, 224, 3] -> [B, n_labels] logits."""
        x = self.features(x_rgb, x_mask, train)
        x = self.drop(x, deterministic=not train)
        return self.out_layer(x)

    def extract_features(self, x_rgb, x_mask):
        """Merged pre-head features for frame selection (eval mode)."""
        return self.features(x_rgb, x_mask, train=False)

"""Plain ViT encoder (cls-token features).

Backs the ViT / DINOv2 feature extractors the reference pulls from
torchvision / torch.hub (``feature_extractors/vit.py``, ``dino.py``):
patchify -> [cls] + pos embed -> pre-LN transformer -> final LN -> cls.

``layerscale=True`` adds DINOv2's per-block LayerScale multipliers
(gamma1/gamma2 applied to the attention and MLP residual branches).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layerscale: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn")(y, y)
        if self.layerscale:
            g1 = self.param("gamma1", nn.initializers.ones, (self.dim,))
            y = y * g1.astype(y.dtype)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_lin1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_lin2")(y)
        if self.layerscale:
            g2 = self.param("gamma2", nn.initializers.ones, (self.dim,))
            y = y * g2.astype(y.dtype)
        return x + y


class ViTEncoder(nn.Module):
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    img_size: int = 224
    layerscale: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x [B, img, img, 3] -> (cls [B, dim], patches [B, N, dim])."""
        b = x.shape[0]
        grid = self.img_size // self.patch_size
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=self.patch_size, dtype=self.dtype,
                    name="patch_embed")(x)
        x = x.reshape(b, grid * grid, self.dim)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, grid * grid + 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype),
                                              (b, 1, self.dim)), x], axis=1)
        x = x + pos.astype(x.dtype)

        for i in range(self.depth):
            x = ViTBlock(self.dim, self.num_heads,
                         layerscale=self.layerscale, dtype=self.dtype,
                         name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x[:, 0], x[:, 1:]

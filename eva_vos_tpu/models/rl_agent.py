"""ActorCritic: annotation-type policy network.

Parity target: ``models/rl_agent.py`` — a mask branch (CNNBranch on the
224-resized mask repeated to 3 channels) plus a SAM-embedding branch
(global average pool over the 64x64 spatial grid + Linear(256 -> dim)),
concatenated, dropout, then policy/value linear heads.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from .qnet import CNNBranch, _BRANCH_DIMS

Dtype = Any

_VIT_DIMS = {"vit_b_16": 768, "vit_b_32": 768, "vit_l_32": 1024}


class ActorCritic(nn.Module):
    out_dim: int = 2
    arch: str = "resnet18"
    dropout: float = 0.5
    use_cost: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_img, x_mask, x_cost=None, train: bool = False):
        """x_img: SAM embedding [B, 64, 64, 256] (channel-last);
        x_mask: [B, 224, 224, 3]; returns (policy_logits [B, out_dim], value [B, 1]).
        """
        is_vit = "vit" in self.arch
        dim = _VIT_DIMS[self.arch] if is_vit else _BRANCH_DIMS[self.arch]

        embed = jnp.mean(x_img, axis=(-3, -2))  # AdaptiveAvgPool2d(1)
        embed = nn.Dense(dim, dtype=self.dtype, name="embed_proj")(embed)

        if is_vit:
            from .vit import ViTEncoder

            patch = 32 if self.arch.endswith("_32") else 16
            depth = 24 if self.arch.startswith("vit_l") else 12
            heads = 16 if self.arch.startswith("vit_l") else 12
            mask_out, _ = ViTEncoder(
                patch_size=patch, dim=dim, depth=depth, num_heads=heads,
                img_size=224, dtype=self.dtype, name="mask_branch")(x_mask)
        else:
            mask_out = CNNBranch(arch=self.arch, dtype=self.dtype,
                                 name="mask_branch")(x_mask, train)

        parts = [embed, mask_out]
        if self.use_cost:
            assert x_cost is not None
            cost = nn.relu(nn.Dense(dim, dtype=self.dtype, name="cost_proj")(x_cost))
            parts.append(cost)

        x = jnp.concatenate(parts, axis=-1)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        p = nn.Dense(self.out_dim, dtype=self.dtype, name="policy")(x)
        v = nn.Dense(1, dtype=self.dtype, name="value")(x)
        return p, v

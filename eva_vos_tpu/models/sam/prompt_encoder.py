"""SAM prompt encoder: points / boxes / mask logits -> embeddings.

Functional parity target: ``segment_anything``'s ``PromptEncoder`` as used
through ``sam/sam_controller.py`` in the reference.

TPU-first twist: prompts arrive as a FIXED-SIZE padded array of
(coord, label) pairs so every click count compiles to the same program.
Labels follow the official scheme plus one padding value:

    -2  padding slot      -> contributes nothing (masked out of attention)
    -1  not-a-point       -> not_a_point_embed (the official pad token)
     0  negative click    -> point_embeddings[0]
     1  positive click    -> point_embeddings[1]
     2  box corner (tl)   -> point_embeddings[2]
     3  box corner (br)   -> point_embeddings[3]

The decoder receives a validity mask (labels != -2) and masks those keys in
attention, which is mathematically identical to running the official
variable-length token list.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any

PAD_LABEL = -2
NOT_A_POINT = -1


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier positional encoding (official semantics)."""

    num_pos_feats: int = 128
    scale: float = 1.0

    @nn.compact
    def __call__(self, coords01: jnp.ndarray) -> jnp.ndarray:
        """coords01 [..., 2] in [0, 1] -> [..., 2 * num_pos_feats]."""
        gauss = self.param(
            "positional_encoding_gaussian_matrix",
            lambda key, shape: self.scale * jax.random.normal(key, shape),
            (2, self.num_pos_feats))
        c = 2.0 * coords01 - 1.0
        c = c @ gauss.astype(coords01.dtype)
        c = 2.0 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def grid_pe(self, size: Tuple[int, int]) -> jnp.ndarray:
        """Dense PE for an image grid: [H, W, C]."""
        h, w = size
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # [H, W, 2] (x, y)
        return self(grid)


class PromptEncoder(nn.Module):
    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    dtype: Dtype = jnp.float32

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        # 0: neg point, 1: pos point, 2: box tl, 3: box br
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0),
            (4, self.embed_dim))
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0),
            (1, self.embed_dim))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim))

        self.mask_conv1 = nn.Conv(self.mask_in_chans // 4, (2, 2), strides=2,
                                  dtype=self.dtype, name="mask_conv1")
        self.mask_ln1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.mask_conv2 = nn.Conv(self.mask_in_chans, (2, 2), strides=2,
                                  dtype=self.dtype, name="mask_conv2")
        self.mask_ln2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.mask_conv3 = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                                  name="mask_conv3")

    def get_dense_pe(self) -> jnp.ndarray:
        """[H, W, embed_dim] positional encoding of the embedding grid."""
        return self.pe_layer.grid_pe(self.image_embedding_size)

    def embed_points(self, coords: jnp.ndarray, labels: jnp.ndarray):
        """coords [N, 2] (x, y) in input-image pixels; labels [N] int.

        Returns (sparse_embeddings [N, C], valid [N] bool).
        """
        pts = coords + 0.5  # shift to pixel centers (official)
        pts = pts / jnp.asarray(
            [self.input_image_size[1], self.input_image_size[0]],
            dtype=pts.dtype)
        pe = self.pe_layer(pts)

        lab = labels[:, None]
        emb = jnp.where(lab == NOT_A_POINT, self.not_a_point_embed[0][None], 0.0)
        pe = jnp.where(lab == NOT_A_POINT, 0.0, pe)  # official zeroes PE there
        emb = emb + pe
        for li in range(4):
            emb = emb + jnp.where(lab == li, self.point_embeddings[li][None], 0.0)
        emb = jnp.where(lab == PAD_LABEL, 0.0, emb)
        valid = labels != PAD_LABEL
        return emb.astype(self.dtype), valid

    def embed_masks(self, mask_input: jnp.ndarray, has_mask) -> jnp.ndarray:
        """mask_input [256, 256] (4x grid) logits -> dense [H, W, C];
        falls back to no_mask_embed when has_mask is False (traced bool)."""
        x = mask_input[None, :, :, None].astype(self.dtype)
        x = nn.gelu(self.mask_ln1(self.mask_conv1(x)), approximate=False)
        x = nn.gelu(self.mask_ln2(self.mask_conv2(x)), approximate=False)
        x = self.mask_conv3(x)[0]
        h, w = self.image_embedding_size
        no_mask = jnp.broadcast_to(self.no_mask_embed[0].astype(self.dtype),
                                   (h, w, self.embed_dim))
        return jnp.where(has_mask, x, no_mask)

    def __call__(self, coords, labels, mask_input, has_mask):
        sparse, valid = self.embed_points(coords, labels)
        dense = self.embed_masks(mask_input, has_mask)
        return sparse, valid, dense, self.get_dense_pe()

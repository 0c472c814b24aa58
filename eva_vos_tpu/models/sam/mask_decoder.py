"""SAM mask decoder: two-way transformer + hypernetwork mask heads.

Functional parity target: ``segment_anything``'s ``MaskDecoder`` /
``TwoWayTransformer`` as consumed by the reference's predictor
(3 multimask outputs + IoU predictions + 256x256 low-res logits).

TPU-first: prompt tokens are fixed-shape with a validity mask; attention
masks invalid keys, which reproduces the official variable-length behavior
exactly under a single compiled program.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any

NEG_INF = -1e30


class DecoderAttention(nn.Module):
    """Multi-head attention with separate q/k/v projections and optional
    internal downsampling (official decoder ``Attention``)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, key_valid=None):
        internal = self.embedding_dim // self.downsample_rate
        head_dim = internal // self.num_heads

        q = nn.Dense(internal, dtype=self.dtype, name="q_proj")(q)
        k = nn.Dense(internal, dtype=self.dtype, name="k_proj")(k)
        v = nn.Dense(internal, dtype=self.dtype, name="v_proj")(v)

        def split(x):
            n = x.shape[0]
            return x.reshape(n, self.num_heads, head_dim).transpose(1, 0, 2)

        qh, kh, vh = split(q), split(k), split(v)  # [heads, N, hd]
        attn = jnp.einsum("hnc,hmc->hnm", qh, kh,
                          preferred_element_type=jnp.float32)
        attn = attn / (head_dim ** 0.5)
        if key_valid is not None:
            attn = jnp.where(key_valid[None, None, :], attn, NEG_INF)
        attn = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)
        out = jnp.einsum("hnm,hmc->hnc", attn, vh)
        out = out.transpose(1, 0, 2).reshape(-1, internal)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe, token_valid):
        # 1. token self-attention (mask padding keys)
        if self.skip_first_layer_pe:
            queries = DecoderAttention(self.embedding_dim, self.num_heads,
                                       dtype=self.dtype, name="self_attn")(
                queries, queries, queries, key_valid=token_valid)
        else:
            q = queries + query_pe
            attn_out = DecoderAttention(self.embedding_dim, self.num_heads,
                                        dtype=self.dtype, name="self_attn")(
                q, q, queries, key_valid=token_valid)
            queries = queries + attn_out
        queries = nn.LayerNorm(dtype=self.dtype, name="norm1")(queries)

        # 2. cross attention: tokens -> image
        q = queries + query_pe
        k = keys + key_pe
        attn_out = DecoderAttention(
            self.embedding_dim, self.num_heads,
            downsample_rate=self.attention_downsample_rate,
            dtype=self.dtype, name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(dtype=self.dtype, name="norm2")(queries + attn_out)

        # 3. MLP
        mlp_out = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_lin1")(queries)
        mlp_out = nn.relu(mlp_out)
        mlp_out = nn.Dense(self.embedding_dim, dtype=self.dtype,
                           name="mlp_lin2")(mlp_out)
        queries = nn.LayerNorm(dtype=self.dtype, name="norm3")(queries + mlp_out)

        # 4. cross attention: image -> tokens (mask padding token keys)
        q = queries + query_pe
        k = keys + key_pe
        attn_out = DecoderAttention(
            self.embedding_dim, self.num_heads,
            downsample_rate=self.attention_downsample_rate,
            dtype=self.dtype, name="cross_attn_image_to_token")(
            k, q, queries, key_valid=token_valid)
        keys = nn.LayerNorm(dtype=self.dtype, name="norm4")(keys + attn_out)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding, token_valid):
        """image_embedding/image_pe [H, W, C]; point_embedding [N, C]."""
        h, w, c = image_embedding.shape
        keys = image_embedding.reshape(h * w, c)
        key_pe = image_pe.reshape(h * w, c)
        queries = point_embedding

        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                embedding_dim=self.embedding_dim, num_heads=self.num_heads,
                mlp_dim=self.mlp_dim, skip_first_layer_pe=(i == 0),
                dtype=self.dtype, name=f"layer_{i}")(
                queries, keys, point_embedding, key_pe, token_valid)

        q = queries + point_embedding
        k = keys + key_pe
        attn_out = DecoderAttention(
            self.embedding_dim, self.num_heads, downsample_rate=2,
            dtype=self.dtype, name="final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(dtype=self.dtype,
                               name="norm_final_attn")(queries + attn_out)
        return queries, keys


class HyperMLP(nn.Module):
    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    sigmoid_output: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                                 name=f"layers_{i}")(x))
        x = nn.Dense(self.output_dim, dtype=self.dtype,
                     name=f"layers_{self.num_layers - 1}")(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


class MaskDecoder(nn.Module):
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    depth: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, sparse_prompt, token_valid,
                 dense_prompt):
        """Single-image forward.

        image_embedding [H, W, C]; dense_prompt [H, W, C];
        sparse_prompt [N, C] with token_valid [N].
        Returns (all_masks [1+M, 4H, 4W] logits, all_iou [1+M]) — callers
        slice [1:] for multimask or [0:1] for single-mask, like the official
        predictor.
        """
        num_tokens = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, self.transformer_dim))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (num_tokens, self.transformer_dim))

        out_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [out_tokens.astype(self.dtype), sparse_prompt], axis=0)
        valid = jnp.concatenate(
            [jnp.ones((1 + num_tokens,), bool), token_valid], axis=0)

        src = image_embedding + dense_prompt
        hs, src_out = TwoWayTransformer(
            depth=self.depth, embedding_dim=self.transformer_dim,
            num_heads=self.num_heads, mlp_dim=self.mlp_dim,
            dtype=self.dtype, name="transformer")(
            src, image_pe, tokens, valid)

        iou_token_out = hs[0]
        mask_tokens_out = hs[1:1 + num_tokens]

        h, w, c = image_embedding.shape
        src_img = src_out.reshape(h, w, c)
        x = nn.ConvTranspose(self.transformer_dim // 4, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="upscale_conv1")(src_img)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="upscale_ln")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.ConvTranspose(self.transformer_dim // 8, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="upscale_conv2")(x)
        upscaled = nn.gelu(x, approximate=False)  # [4H, 4W, C/8]

        hyper_in = jnp.stack([
            HyperMLP(self.transformer_dim, self.transformer_dim // 8,
                     dtype=self.dtype, name=f"output_hypernetworks_mlps_{i}")(
                mask_tokens_out[i])
            for i in range(num_tokens)
        ])  # [num_tokens, C/8]

        masks = jnp.einsum("tc,hwc->thw", hyper_in.astype(jnp.float32),
                           upscaled.astype(jnp.float32))
        iou_pred = HyperMLP(self.iou_head_hidden_dim, num_tokens,
                            num_layers=self.iou_head_depth, dtype=self.dtype,
                            name="iou_prediction_head")(iou_token_out)
        return masks, iou_pred.astype(jnp.float32)

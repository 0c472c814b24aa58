"""SAM image encoder: ViT with windowed attention and decomposed relative
position embeddings (ViT-Det style), plus a 256-channel conv neck.

Functional parity target: the ``segment_anything`` package's
``ImageEncoderViT`` as consumed via ``sam/sam_controller.py`` in the
reference (ViT-H: 1024x1024 input -> [64, 64, 256] embedding).

TPU notes: channel-last everywhere; attention logits accumulate in fp32;
window partitioning is static reshapes (no dynamic shapes under jit).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def window_partition(x: jnp.ndarray, ws: int):
    """[B, H, W, C] -> ([B*nW, ws, ws, C], padded (Hp, Wp))."""
    b, h, w, c = x.shape
    pad_h = (-h) % ws
    pad_w = (-w) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def window_unpartition(windows: jnp.ndarray, ws: int, padded_hw, hw):
    hp, wp = padded_hw
    h, w = hw
    b = windows.shape[0] // ((hp // ws) * (wp // ws))
    x = windows.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Select (and if needed interpolate) relative positional embeddings."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear")
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_hw, k_hw):
    """attn [B*nh, qh*qw, kh*kw] += decomposed relative position terms."""
    qh, qw = q_hw
    kh, kw = k_hw
    rh = get_rel_pos(qh, kh, rel_pos_h)  # [qh, kh, dim]
    rw = get_rel_pos(qw, kw, rel_pos_w)  # [qw, kw, dim]
    b = q.shape[0]
    r_q = q.reshape(b, qh, qw, -1)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw)
    attn = attn.reshape(b, qh, qw, kh, kw)
    attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
    return attn.reshape(b, qh * qw, kh * kw)


class VitAttention(nn.Module):
    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (14, 14)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5

        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, b * self.num_heads,
                                                   h * w, head_dim)
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum("bnc,bmc->bnm", q * scale, k,
                          preferred_element_type=jnp.float32)
        if self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros,
                (2 * self.input_size[0] - 1, head_dim))
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros,
                (2 * self.input_size[1] - 1, head_dim))
            # rel-pos terms use the UNSCALED q (matching segment_anything)
            attn = add_decomposed_rel_pos(
                attn, q.astype(jnp.float32), rel_pos_h, rel_pos_w,
                (h, w), (h, w))
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnm,bmc->bnc", attn, v)
        out = out.reshape(b, self.num_heads, h * w, head_dim)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class MLPBlock(nn.Module):
    mlp_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="lin2")(x)


class EncoderBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 0  # 0 = global attention
    input_size: Tuple[int, int] = (64, 64)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.window_size > 0:
            hw = x.shape[1:3]
            x, padded = window_partition(x, self.window_size)
            attn_size = (self.window_size, self.window_size)
        else:
            attn_size = self.input_size
        x = VitAttention(self.dim, self.num_heads, input_size=attn_size,
                         dtype=self.dtype, name="attn")(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, padded, hw)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        return x + MLPBlock(int(self.dim * self.mlp_ratio), self.dim,
                            dtype=self.dtype, name="mlp")(y)


class ImageEncoderViT(nn.Module):
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    use_abs_pos: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x [B, img_size, img_size, 3] -> [B, S, S, out_chans], S = size/16."""
        grid = self.img_size // self.patch_size
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=self.patch_size, dtype=self.dtype,
                    name="patch_embed")(x)
        if self.use_abs_pos:
            pos = self.param("pos_embed", nn.initializers.zeros,
                             (1, grid, grid, self.embed_dim))
            x = x + pos.astype(x.dtype)

        for i in range(self.depth):
            ws = 0 if i in self.global_attn_indexes else self.window_size
            x = EncoderBlock(
                dim=self.embed_dim, num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio, window_size=ws,
                input_size=(grid, grid), dtype=self.dtype,
                name=f"block_{i}")(x)

        # Neck: 1x1 conv -> LN -> 3x3 conv -> LN (channel-wise LN, eps 1e-6)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype,
                    name="neck_conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="neck_ln1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="neck_conv2")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="neck_ln2")(x)
        return x

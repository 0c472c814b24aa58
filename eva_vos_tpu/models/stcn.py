"""STCN space-time memory network (Flax, channel-last, bf16-friendly).

Structural parity target: ``mivos/model/propagation/prop_net.py`` +
``modules.py`` in the reference:

* KeyEncoder      — torchvision ResNet-50 trunk cut at layer3
                    (f16: 1024ch @1/16, f8: 512ch @1/8, f4: 256ch @1/4)
* KeyProjection   — 1024 -> 64 3x3 conv (the memory "key")
* key_comp        — 1024 -> 512 3x3 conv (the thin query value)
* ValueEncoder    — mod_resnet ResNet-18 trunk (5-channel input:
                    rgb + object mask + others-mask) fused with the key
                    feature through a FeatureFusionBlock -> 512ch memory value
* Decoder         — 1024 -> 512 compress ResBlock, two UpsampleBlocks
                    (1/16 -> 1/8 -> 1/4), 1-channel pred conv, 4x bilinear

The memory read itself (top-k affinity + readout) lives in
``eva_vos_tpu.ops.memory_attention`` / ``eva_vos_tpu.kernels`` and is invoked
by the propagation engine, not by this module — on TPU the engine owns the
token-major memory bank layout and the networks stay stateless.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
import flax.linen as nn

from .layers import ResBlock, UpsampleBlock, FeatureFusionBlock, KeyProjection
from .resnet import ResNetTrunk
from ..ops.resize import resize_bilinear, area_downsample
from ..ops.memory_attention import full_softmax_affinity

Dtype = Any


class STCNFeatures(NamedTuple):
    """Per-frame features produced by ``encode_key`` (all channel-last)."""

    k16: jnp.ndarray        # [.., H/16, W/16, keydim]   memory/query key
    f16_thin: jnp.ndarray   # [.., H/16, W/16, 512]      query value
    f16: jnp.ndarray        # [.., H/16, W/16, 1024]
    f8: jnp.ndarray         # [.., H/8,  W/8,  512]
    f4: jnp.ndarray         # [.., H/4,  W/4,  256]


class KeyEncoder(nn.Module):
    arch: str = "resnet50"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, frame, train: bool = False):
        f4, f8, f16 = ResNetTrunk(
            arch=self.arch, num_stages=3, conv_bias=False, dtype=self.dtype,
            name="trunk",
        )(frame, train)
        return f16, f8, f4


class ValueEncoder(nn.Module):
    """5-channel mod-ResNet18 trunk + fuser -> 512-channel memory value."""

    arch: str = "resnet18"
    value_dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, frame, key_f16, mask, other_masks, train: bool = False):
        x = jnp.concatenate(
            [frame, mask[..., None], other_masks[..., None]], axis=-1
        )
        _, _, f = ResNetTrunk(
            arch=self.arch, num_stages=3, conv_bias=True, dtype=self.dtype,
            name="trunk",
        )(x, train)
        return FeatureFusionBlock(self.value_dim, dtype=self.dtype, name="fuser")(f, key_f16)


class Decoder(nn.Module):
    dtype: Dtype = jnp.float32

    def setup(self):
        self.compress = ResBlock(512, dtype=self.dtype)
        self.up_16_8 = UpsampleBlock(512, 256, dtype=self.dtype)
        self.up_8_4 = UpsampleBlock(256, 256, dtype=self.dtype)
        self.pred = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype)

    def __call__(self, m16, f8, f4, skips_precomputed: bool = False):
        """``skips_precomputed=True``: f8/f4 are already the UpsampleBlocks'
        skip_conv outputs (see :meth:`skips`) — identical math, hoisted."""
        x = self.compress(m16)
        x = self.up_16_8(f8, x, skip_is_conv=skips_precomputed)
        x = self.up_8_4(f4, x, skip_is_conv=skips_precomputed)
        x = self.pred(nn.relu(x))
        # single 4x bilinear (two chained 2x passes have different phase
        # weights than the reference's F.interpolate(scale_factor=4),
        # prop_net.py:29)
        h, w = x.shape[-3], x.shape[-2]
        return resize_bilinear(x, (4 * h, 4 * w))

    def skips(self, f8, f4):
        """The two skip convolutions alone — per-frame, readout-independent,
        so the engine computes them once per video rather than once per
        decode (they are ~30% of the decoder's per-frame FLOPs)."""
        return self.up_16_8.skip(f8), self.up_8_4.skip(f4)


class PropagationNetwork(nn.Module):
    """Stateless STCN module bundle.

    Methods mirror the reference API surface (``encode_key``,
    ``encode_value``, ``decode_with_readout``, ``get_attention``); the
    stateful memory-bank logic lives in ``eva_vos_tpu.engine``.
    """

    keydim: int = 64
    value_dim: int = 512
    top_k: int = 50
    key_arch: str = "resnet50"
    value_arch: str = "resnet18"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.key_encoder = KeyEncoder(arch=self.key_arch, dtype=self.dtype)
        self.value_encoder = ValueEncoder(arch=self.value_arch,
                                          value_dim=self.value_dim, dtype=self.dtype)
        self.key_proj = KeyProjection(self.keydim, dtype=self.dtype)
        self.decoder = Decoder(dtype=self.dtype)
        self.key_comp = nn.Conv(self.value_dim, (3, 3), padding=1,
                                dtype=self.dtype, name="key_comp")

    def _key_comp(self, f16):
        return self.key_comp(f16)

    def encode_key(self, frame) -> STCNFeatures:
        """frame [..., H, W, 3] -> per-frame features (``prop_net.py:172-177``)."""
        f16, f8, f4 = self.key_encoder(frame)
        k16 = self.key_proj(f16)
        f16_thin = self._key_comp(f16)
        return STCNFeatures(k16=k16, f16_thin=f16_thin, f16=f16, f8=f8, f4=f4)

    def encode_value(self, frame, kf16, masks):
        """Memory value for one frame with K object masks.

        frame [H, W, 3], kf16 [H/16, W/16, 1024], masks [K, H, W].
        Returns [K, H/16, W/16, 512].  The "others" channel for object i is
        the sum of the other objects' masks (``prop_net.py:153-170``).
        """
        k = masks.shape[0]
        if k == 1:
            others = jnp.zeros_like(masks)
        else:
            total = jnp.sum(masks, axis=0, keepdims=True)
            others = total - masks
        frames = jnp.broadcast_to(frame[None], (k, *frame.shape))
        kf16s = jnp.broadcast_to(kf16[None], (k, *kf16.shape))
        return self.value_encoder(frames, kf16s, masks, others)

    def decode_with_readout(self, readout_value, qv16, qf8, qf4,
                            skips_precomputed: bool = False,
                            return_logits: bool = False):
        """[K, h, w, 512] memory readout + query features -> [K, H, W] probs.

        ``skips_precomputed``: qf8/qf4 are already the decoder's skip_conv
        outputs (``encode_skips``) — the engine hoists those per-frame convs
        into feature precompute.
        ``return_logits``: skip the sigmoid (training losses want logit
        space — sigmoid-then-BCE has zero gradient once saturated).
        """
        k = readout_value.shape[0]
        qv = jnp.broadcast_to(qv16[None], (k, *qv16.shape))
        m4 = jnp.concatenate([readout_value, qv], axis=-1)
        f8 = jnp.broadcast_to(qf8[None], (k, *qf8.shape))
        f4 = jnp.broadcast_to(qf4[None], (k, *qf4.shape))
        logits = self.decoder(m4, f8, f4,
                              skips_precomputed=skips_precomputed)
        if return_logits:
            return logits[..., 0]
        return nn.sigmoid(logits[..., 0])

    def encode_skips(self, f8, f4):
        """Per-frame decoder skip-conv outputs (readout-independent)."""
        return self.decoder.skips(f8, f4)

    def get_attention(self, mk16, pos_mask, neg_mask, qk16):
        """Fusion attention maps (``prop_net.py:198-210``).

        mk16 [h, w, keydim] key of the interacted frame,
        pos/neg_mask [K, H, W] mask diffs, qk16 [h, w, keydim] query key.
        Returns [K, H, W, 2].
        """
        h, w, _ = mk16.shape
        H, W = pos_mask.shape[-2:]
        mk = mk16.reshape(h * w, -1)
        qk = qk16.reshape(h * w, -1)
        # Reference softmaxes over the memory axis per query: W_aff [N=q, M=m]
        w_aff = full_softmax_affinity(mk, qk)  # [hw_q, hw_m]

        pos = area_downsample(pos_mask, H // h).reshape(pos_mask.shape[0], h * w)
        neg = area_downsample(neg_mask, H // h).reshape(neg_mask.shape[0], h * w)
        # reference: map = mask_vec [1, M] @ W [M, N] -> per query
        pos_map = pos.astype(jnp.float32) @ w_aff.T  # [K, hw_q]
        neg_map = neg.astype(jnp.float32) @ w_aff.T
        attn = jnp.stack([pos_map, neg_map], axis=-1).reshape(-1, h, w, 2)
        return resize_bilinear(attn.astype(self.dtype), (H, W))

    def __call__(self, frame):
        """Default apply: encode a frame (used for initialization)."""
        return self.encode_key(frame)

    def init_all(self, frame, masks):
        """Touch every submodule so ``module.init`` creates all params.

        frame [H, W, 3], masks [K, H, W].  H and W must be multiples of 16
        (the engine always runs at padded geometry; initializing on an
        unpadded frame would trace mismatched pyramid shapes).
        """
        assert frame.shape[0] % 16 == 0 and frame.shape[1] % 16 == 0, (
            f"init_all requires H, W multiples of 16, got {frame.shape[:2]}")
        feats = self.encode_key(frame[None])
        sq = STCNFeatures(*(f[0] for f in feats))
        value = self.encode_value(frame, sq.f16, masks)
        readout = jnp.zeros_like(value)
        prob = self.decode_with_readout(readout, sq.f16_thin, sq.f8, sq.f4)
        attn = self.get_attention(sq.k16, masks, masks, sq.k16)
        return feats, value, prob, attn

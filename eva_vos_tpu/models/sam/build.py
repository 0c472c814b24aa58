"""SAM model assembly and size presets.

Presets mirror the official vit_h / vit_l / vit_b checkpoints (the reference
loads ``sam_model_registry['vit_h']``, ``sam/sam_controller.py:18``); the
``tiny`` preset backs the test-suite (no checkpoint needed).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .image_encoder import ImageEncoderViT
from .prompt_encoder import PromptEncoder
from .mask_decoder import MaskDecoder

PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)


@dataclass(frozen=True)
class SamConfig:
    img_size: int = 1024
    patch_size: int = 16
    encoder_embed_dim: int = 1280
    encoder_depth: int = 32
    encoder_num_heads: int = 16
    encoder_global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    window_size: int = 14
    prompt_embed_dim: int = 256
    decoder_num_heads: int = 8
    decoder_mlp_dim: int = 2048
    mask_in_chans: int = 16

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def low_res(self) -> int:
        return self.img_size // 4


PRESETS = {
    "vit_h": SamConfig(),
    "vit_l": SamConfig(encoder_embed_dim=1024, encoder_depth=24,
                       encoder_num_heads=16,
                       encoder_global_attn_indexes=(5, 11, 17, 23)),
    "vit_b": SamConfig(encoder_embed_dim=768, encoder_depth=12,
                       encoder_num_heads=12,
                       encoder_global_attn_indexes=(2, 5, 8, 11)),
    # Tiny config for tests: 128px input, 8x8 embedding grid, 32-d decoder.
    "tiny": SamConfig(img_size=128, encoder_embed_dim=32, encoder_depth=2,
                      encoder_num_heads=2, encoder_global_attn_indexes=(1,),
                      window_size=4, prompt_embed_dim=32,
                      decoder_num_heads=2, decoder_mlp_dim=64,
                      mask_in_chans=4),
}


class Sam(nn.Module):
    """Bundled SAM: image encoder + prompt encoder + mask decoder."""

    config: SamConfig = SamConfig()
    dtype: Any = jnp.float32

    def setup(self):
        c = self.config
        self.image_encoder = ImageEncoderViT(
            img_size=c.img_size, patch_size=c.patch_size,
            embed_dim=c.encoder_embed_dim, depth=c.encoder_depth,
            num_heads=c.encoder_num_heads, out_chans=c.prompt_embed_dim,
            window_size=c.window_size,
            global_attn_indexes=c.encoder_global_attn_indexes,
            dtype=self.dtype)
        self.prompt_encoder = PromptEncoder(
            embed_dim=c.prompt_embed_dim,
            image_embedding_size=(c.grid, c.grid),
            input_image_size=(c.img_size, c.img_size),
            mask_in_chans=c.mask_in_chans, dtype=self.dtype)
        self.mask_decoder = MaskDecoder(
            transformer_dim=c.prompt_embed_dim,
            num_heads=c.decoder_num_heads, mlp_dim=c.decoder_mlp_dim,
            dtype=self.dtype)

    def encode_image(self, x):
        """x [B, img_size, img_size, 3] preprocessed -> [B, S, S, 256]."""
        return self.image_encoder(x)

    def decode(self, embedding, coords, labels, mask_input, has_mask):
        """embedding [S, S, 256]; coords [N, 2]; labels [N];
        mask_input [low_res, low_res]; has_mask scalar bool.
        Returns (masks [1 + M, 4S, 4S] logits, iou [1 + M])."""
        sparse, valid, dense, image_pe = self.prompt_encoder(
            coords, labels, mask_input, has_mask)
        return self.mask_decoder(embedding, image_pe, sparse, valid, dense)

    def __call__(self, x, coords, labels, mask_input, has_mask):
        emb = self.encode_image(x)
        return self.decode(emb[0], coords, labels, mask_input, has_mask)


def build_sam(preset: str = "vit_h", dtype=jnp.float32, seed: int = 0):
    """Returns (module, params) with randomly initialized weights.

    Production loads converted official weights over this tree via
    ``eva_vos_tpu.utils.weight_convert``.
    """
    cfg = PRESETS[preset]
    sam = Sam(config=cfg, dtype=dtype)
    x = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), dtype)
    coords = jnp.zeros((4, 2), jnp.float32)
    labels = jnp.full((4,), -2, jnp.int32)
    mask_input = jnp.zeros((cfg.low_res, cfg.low_res), dtype)
    params = sam.init(jax.random.PRNGKey(seed), x, coords, labels,
                      mask_input, False)
    return sam, params

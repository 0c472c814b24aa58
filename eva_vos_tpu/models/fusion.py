"""FusionNet: fuses forward- and backward-propagated masks.

Parity target: ``mivos/model/fusion_net.py`` — a tiny CNN over
cat[image(3), seg1(1), seg2(1), attention(2), time(2 broadcast)] = 9 channels
with two residual stages, emitting one logit map.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class FusionNet(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, im, seg1, seg2, attn, time):
        """im [..., H, W, 3]; seg1/seg2 [..., H, W]; attn [..., H, W, 2];
        time [..., 2] scalars broadcast over space.  Returns [..., H, W] logits.
        """
        h, w = im.shape[-3], im.shape[-2]
        t = jnp.broadcast_to(time[..., None, None, :], (*im.shape[:-3], h, w, 2))
        x = jnp.concatenate(
            [im, seg1[..., None], seg2[..., None], attn, t.astype(im.dtype)], axis=-1
        )

        x = nn.relu(nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x))

        r = nn.relu(nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name="conv2_0")(x))
        r = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name="conv2_1")(r)
        x = nn.relu(x + r)

        r = nn.relu(nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name="conv3_0")(x))
        r = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name="conv3_1")(r)
        x = nn.relu(x + r)

        x = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="final_conv")(x)
        return x[..., 0]

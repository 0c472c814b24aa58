"""FusionNet: fuses forward- and backward-propagated masks.

Parity target: ``mivos/model/fusion_net.py`` — a tiny CNN over
cat[image(3), seg1(1), seg2(1), attention(2), time(2 broadcast)] = 9 channels
with two residual stages, emitting one logit map.

``fusion_apply_packed`` is a TPU-fast execution of the SAME param tree:
32-channel 3x3 convs at 480p keep the 128x128 MXU ~3% utilized (measured
5.0 ms/frame on v5e); running the whole net in a 2x2 space-to-depth layout
([H/2, W/2, 4C], structured [3,3,4C,4C'] kernels) is numerically
equivalent (fp32 max|d| ~2e-6; it is the same sum re-associated) and
measured 2.5x faster (2.0 ms/frame).  Packing is exact because a 3x3
stride-1 conv's receptive field for any output sub-position lies inside
the packed 3x3 neighborhood; elementwise relu/residual ops commute with
the layout.
"""

from __future__ import annotations

from typing import Any

import jax
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


# ---------------------------------------------------------------------------
# space-to-depth execution of the same parameters (TPU fast path)
# ---------------------------------------------------------------------------

def _pack2(x, s: int = 2):
    """[..., H, W, C] -> [..., H/s, W/s, s*s*C] (sub-pixel order dy, dx, c)."""
    *b, h, w, c = x.shape
    x = x.reshape(*b, h // s, s, w // s, s, c)
    x = jnp.moveaxis(x, -4, -3)
    return x.reshape(*b, h // s, w // s, s * s * c)


def _unpack2(x, s: int = 2):
    *b, h2, w2, c4 = x.shape
    c = c4 // (s * s)
    x = x.reshape(*b, h2, w2, s, s, c)
    x = jnp.moveaxis(x, -3, -4)
    return x.reshape(*b, h2 * s, w2 * s, c)


def _pack_kernel(w, s: int = 2):
    """[3,3,Cin,Cout] -> [3,3,s²Cin,s²Cout] packed-equivalent kernel.

    Output sub-position (oy,ox) of packed pixel (i,j) is original pixel
    (s*i+oy, s*j+ox); its 3x3 window pixel (ky,kx) lives at packed offset
    (py,px) sub-position (iy,ix) with oy+ky = s*py+iy (same for x).
    Constant-folds under jit when the param tree is a closure constant.
    """
    cin, cout = w.shape[2], w.shape[3]
    wp = jnp.zeros((3, 3, s * s, cin, s * s, cout), w.dtype)
    for oy in range(s):
        for ox in range(s):
            for ky in (-1, 0, 1):
                for kx in (-1, 0, 1):
                    iy, py = (oy + ky) % s, (oy + ky) // s
                    ix, px = (ox + kx) % s, (ox + kx) // s
                    wp = wp.at[py + 1, px + 1, iy * s + ix, :,
                               oy * s + ox, :].set(w[ky + 1, kx + 1])
    return wp.reshape(3, 3, s * s * cin, s * s * cout)


def _conv_p(x, wp, b, s: int = 2):
    """Packed conv: x [..., h2, w2, s²Cin] -> [..., h2, w2, s²Cout]."""
    dn = jax.lax.conv_dimension_numbers(
        (1, *x.shape[-3:]), wp.shape, ("NHWC", "HWIO", "NHWC"))
    batch = x.shape[:-3]
    xb = x.reshape((-1, *x.shape[-3:]))
    y = jax.lax.conv_general_dilated(
        xb, wp.astype(xb.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=dn)
    y = y + jnp.tile(b, s * s).astype(y.dtype)  # bias per (oy,ox,cout) block
    return y.reshape(*batch, *y.shape[1:])


def fusion_apply_packed(variables, im, seg1, seg2, attn, time, s: int = 2):
    """Numerically-equivalent packed execution of ``FusionNet.__call__``
    over the same flax param tree.  Requires H and W divisible by ``s``
    (the engine's pad-to-16 guarantees it for s in {2, 4, 8}).  Same
    signature/returns as the module.

    ``s`` is the space-to-depth factor: s=2 runs 128-channel convs at
    1/4 area, s=4 runs 512-channel convs at 1/16 area — same FLOPs,
    fatter MXU shapes.
    """
    p = variables["params"]
    h, w = im.shape[-3], im.shape[-2]
    t = jnp.broadcast_to(time[..., None, None, :], (*im.shape[:-3], h, w, 2))
    x = jnp.concatenate(
        [im, seg1[..., None], seg2[..., None], attn, t.astype(im.dtype)],
        axis=-1)
    x = _pack2(x, s)

    def k(name):
        return _pack_kernel(p[name]["kernel"], s)

    def b(name):
        return p[name]["bias"]

    x = jax.nn.relu(_conv_p(x, k("conv1"), b("conv1"), s))
    r = jax.nn.relu(_conv_p(x, k("conv2_0"), b("conv2_0"), s))
    r = _conv_p(r, k("conv2_1"), b("conv2_1"), s)
    x = jax.nn.relu(x + r)
    r = jax.nn.relu(_conv_p(x, k("conv3_0"), b("conv3_0"), s))
    r = _conv_p(r, k("conv3_1"), b("conv3_1"), s)
    x = jax.nn.relu(x + r)
    x = _conv_p(x, k("final_conv"), b("final_conv"), s)
    return _unpack2(x, s)[..., 0]

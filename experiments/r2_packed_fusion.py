"""Prototype: space-to-depth FusionNet execution.

A 3x3 stride-1 conv over [H, W, C] is exactly a 3x3 stride-1 conv over the
2x2-packed layout [H/2, W/2, 4C] with a structured-sparse [3,3,4C,4C']
kernel: output sub-position (oy,ox) at packed pixel (i,j) is original pixel
(2i+oy, 2j+ox), whose 3x3 window lives inside the packed 3x3 neighborhood.
Packing turns the fusion net's 32-channel convs (MXU-starved at ~3% util)
into 128-channel convs.  Verifies numerical agreement against the unpacked
module and times both on the current backend.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from eva_vos_tpu.models import FusionNet


def pack2(x):
    """[..., H, W, C] -> [..., H/2, W/2, 4C] (order dy, dx, c)."""
    *b, h, w, c = x.shape
    x = x.reshape(*b, h // 2, 2, w // 2, 2, c)
    x = jnp.moveaxis(x, -4, -3)          # [..., h2, w2, 2, 2, c]
    return x.reshape(*b, h // 2, w // 2, 4 * c)


def unpack2(x):
    *b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(*b, h2, w2, 2, 2, c)
    x = jnp.moveaxis(x, -3, -4)          # [..., h2, 2, w2, 2, c]
    return x.reshape(*b, h2 * 2, w2 * 2, c)


def pack_kernel(w):
    """[3,3,Cin,Cout] -> [3,3,4Cin,4Cout] packed-equivalent kernel."""
    cin, cout = w.shape[2], w.shape[3]
    wp = jnp.zeros((3, 3, 4, cin, 4, cout), w.dtype)
    for oy in range(2):
        for ox in range(2):
            for ky in (-1, 0, 1):
                for kx in (-1, 0, 1):
                    # original input pixel (2i+oy+ky, 2j+ox+kx)
                    iy, py = (oy + ky) % 2, (oy + ky) // 2
                    ix, px = (ox + kx) % 2, (ox + kx) // 2
                    wp = wp.at[py + 1, px + 1, iy * 2 + ix, :,
                               oy * 2 + ox, :].set(w[ky + 1, kx + 1])
    return wp.reshape(3, 3, 4 * cin, 4 * cout)


def conv_p(x, wp, b):
    """Packed conv: x [..., h2, w2, 4Cin], wp [3,3,4Cin,4Cout], b [Cout]."""
    dn = jax.lax.conv_dimension_numbers(x.shape[-3:][None] if False else
                                        (1, *x.shape[-3:]),
                                        wp.shape, ("NHWC", "HWIO", "NHWC"))
    batch = x.shape[:-3]
    xb = x.reshape((-1, *x.shape[-3:]))
    y = jax.lax.conv_general_dilated(
        xb.astype(wp.dtype) if False else xb, wp.astype(xb.dtype),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=dn)
    y = y + jnp.tile(b, 4).astype(y.dtype)
    return y.reshape(*batch, *y.shape[1:])


def fusion_apply_packed(variables, im, seg1, seg2, attn, time_vec):
    """Bit-comparable packed execution of FusionNet.__call__ over the same
    param tree."""
    p = variables["params"]
    h, w = im.shape[-3], im.shape[-2]
    t = jnp.broadcast_to(time_vec[..., None, None, :],
                         (*im.shape[:-3], h, w, 2))
    x = jnp.concatenate([im, seg1[..., None], seg2[..., None], attn,
                         t.astype(im.dtype)], axis=-1)
    x = pack2(x)
    dt = x.dtype

    def k(name):
        return pack_kernel(p[name]["kernel"]).astype(dt)

    def b(name):
        return p[name]["bias"]

    x = jax.nn.relu(conv_p(x, k("conv1"), b("conv1")))
    r = jax.nn.relu(conv_p(x, k("conv2_0"), b("conv2_0")))
    r = conv_p(r, k("conv2_1"), b("conv2_1"))
    x = jax.nn.relu(x + r)
    r = jax.nn.relu(conv_p(x, k("conv3_0"), b("conv3_0")))
    r = conv_p(r, k("conv3_1"), b("conv3_1"))
    x = jax.nn.relu(x + r)
    x = conv_p(x, k("final_conv"), b("final_conv"))
    return unpack2(x)[..., 0]


def main():
    H, W, B = 480, 864, 5
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    fusion = FusionNet(dtype=dtype)
    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.standard_normal((B, H, W, 3)), dtype)
    s1 = jnp.asarray(rng.uniform(size=(B, H, W)), dtype)
    s2 = jnp.asarray(rng.uniform(size=(B, H, W)), dtype)
    at = jnp.asarray(rng.standard_normal((B, H, W, 2)), dtype)
    tv = jnp.asarray(rng.uniform(size=(B, 2)), dtype)
    fp = fusion.init(jax.random.PRNGKey(1), im[0], s1[0], s2[0], at[0], tv[0])

    ref_fn = jax.jit(lambda *a: fusion.apply(fp, *a))
    new_fn = jax.jit(lambda *a: fusion_apply_packed(fp, *a))

    ref = ref_fn(im, s1, s2, at, tv)
    new = new_fn(im, s1, s2, at, tv)
    jax.block_until_ready((ref, new))
    d = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                              - new.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print(f"max|d|={d:.6f} (scale {scale:.3f})", flush=True)

    for name, fn in (("unpacked", ref_fn), ("packed", new_fn)):
        t0 = time.perf_counter()
        n = 20
        for _ in range(n):
            out = fn(im, s1, s2, at, tv)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / n * 1000
        print(f"{name}: {ms:7.2f} ms ({ms / B:5.2f}/frame)", flush=True)


if __name__ == "__main__":
    main()

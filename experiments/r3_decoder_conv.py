"""Round-3 TPU experiment: decoder up_8_4 conv formulations.

STATUS r2: the decoder costs 2.0 ms/frame at ~30% MXU; the up_8_4
ResBlock (two 3x3 256->256 convs at 1/4 res) is the biggest item
(1.16 ms).  Compare XLA lowerings of the same math at the blocked-engine
geometry ([B=5, 120, 216, 256] bf16):

  conv       — lax.conv_general_dilated NHWC (what flax emits today)
  patches    — conv_general_dilated_patches -> one [BHW, 9C] x [9C, C]
               matmul (explicit im2col: 2304-deep contraction on the MXU)
  taps       — 9 shifted [BHW, C] x [C, C] matmuls accumulated in fp32
  resblock_* — the full pre-activation ResBlock in conv vs patches form

Chained fori_loop timing (single-op microbenches lie on the axon tunnel).

Run on TPU:  python experiments/r3_decoder_conv.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

B, H, W, C = 5, 120, 216, 256
DTYPE = jnp.bfloat16


def conv_ref(x, k, b):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn) + b


def conv_patches(x, k, b):
    pat = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, (3, 3, C, C), ("NHWC", "HWIO", "NHWC")))
    # patches emits channel-major taps [B, H, W, C*9]; kernel reshaped to
    # match: HWIO [3,3,C,O] -> [C,3,3,O] -> [9C, O]
    km = jnp.moveaxis(k, 2, 0).reshape(9 * C, -1)
    return jax.lax.dot_general(
        pat.reshape(-1, 9 * C), km,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(*x.shape[:-1], -1).astype(x.dtype) + b


def conv_taps(x, k, b):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            win = xp[:, dy:dy + H, dx:dx + W, :]
            t = jax.lax.dot_general(
                win.reshape(-1, C), k[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    return acc.reshape(*x.shape[:-1], -1).astype(x.dtype) + b


def resblock(conv, x, p):
    r = conv(jax.nn.relu(x), p["k1"], p["b1"])
    r = conv(jax.nn.relu(r), p["k2"], p["b2"])
    return x + r


def timed(fn, x, iters=30):
    @jax.jit
    def run(x):
        def body(_, x):
            out = fn(x)
            return (x.astype(jnp.float32)
                    + 1e-6 * out.astype(jnp.float32)).astype(x.dtype)

        return jax.lax.fori_loop(0, iters, body, x)

    jax.block_until_ready(run(x))
    t0 = time.perf_counter()
    jax.block_until_ready(run(x))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), DTYPE)
    k1 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, DTYPE)
    k2 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, DTYPE)
    b1 = jnp.asarray(rng.standard_normal((C,)) * 0.01, DTYPE)
    b2 = jnp.asarray(rng.standard_normal((C,)) * 0.01, DTYPE)
    p = {"k1": k1, "b1": b1, "k2": k2, "b2": b2}

    flops = 2 * B * H * W * 9 * C * C  # one conv
    out = {}
    variants = {
        "conv": lambda x: conv_ref(x, k1, b1),
        "patches": lambda x: conv_patches(x, k1, b1),
        "taps": lambda x: conv_taps(x, k1, b1),
        "resblock_conv": lambda x: resblock(conv_ref, x, p),
        "resblock_patches": lambda x: resblock(conv_patches, x, p),
        "resblock_taps": lambda x: resblock(conv_taps, x, p),
    }
    # correctness first
    ref = np.asarray(conv_ref(x, k1, b1), np.float32)
    for name in ("patches", "taps"):
        got = np.asarray(variants[name](x), np.float32)
        ok = np.allclose(got, ref, rtol=5e-2, atol=5e-2)
        out[f"{name}_ok"] = bool(ok)
        print(f"{name} vs conv: max|d|={np.abs(got - ref).max():.4f} ok={ok}",
              flush=True)
    for name, fn in variants.items():
        ms = timed(fn, x) * 1e3
        n_convs = 2 if name.startswith("resblock") else 1
        util = n_convs * flops / (ms / 1e3) / 197e12
        out[name] = {"ms": round(ms, 3), "mxu_util": round(util, 3)}
        print(f"{name:18s}: {ms:7.3f} ms  ({util * 100:.0f}% MXU)",
              flush=True)
    with open("experiments/r3_decoder_conv.json", "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()

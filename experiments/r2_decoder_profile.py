"""Stage-bisect the decoder cost on TPU at the blocked-engine geometry
(B=5 frames, K=1 object, 480x864, bf16): compress / up_16_8 / up_8_4 /
pred+resize, plus the full decode_with_readout, with chained deps."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from eva_vos_tpu.models import PropagationNetwork
from eva_vos_tpu.models.layers import ResBlock, UpsampleBlock
from eva_vos_tpu.ops.resize import resize_bilinear

DTYPE = jnp.bfloat16
H, W = 480, 864
H16, W16 = H // 16, W // 16
B = 5


def timeit(fn, args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    stcn = PropagationNetwork(dtype=DTYPE)
    sp = stcn.init(jax.random.PRNGKey(0), jnp.zeros((H, W, 3), DTYPE),
                   jnp.zeros((1, H, W), DTYPE), method="init_all")
    dparams = {"params": sp["params"]["decoder"]}
    rng = np.random.default_rng(0)

    ro = jnp.asarray(rng.standard_normal((B, 1, H16, W16, 512)), DTYPE)
    thin = jnp.asarray(rng.standard_normal((B, H16, W16, 512)), DTYPE)
    f8 = jnp.asarray(rng.standard_normal((B, H // 8, W // 8, 512)), DTYPE)
    f4 = jnp.asarray(rng.standard_normal((B, H // 4, W // 4, 256)), DTYPE)

    # full decode path (as the engine calls it, vmapped over frames)
    @jax.jit
    def full(ro, thin, f8, f4):
        def one(r, t, a, b):
            return stcn.apply(sp, r, t, a, b, method="decode_with_readout")
        return jax.vmap(one)(ro, thin, f8, f4)

    ms = timeit(full, (ro, thin, f8, f4))
    print(f"decode_with_readout x{B}: {ms:7.2f} ms ({ms / B:5.2f}/frame)",
          flush=True)

    # stages (flattened batch B*K=5)
    m4 = jnp.concatenate([ro[:, 0], thin], axis=-1)  # [B, h, w, 1024]

    compress = ResBlock(512, dtype=DTYPE, name="compress")
    cp = {"params": dparams["params"]["compress"]}

    @jax.jit
    def s_compress(x):
        return compress.apply(cp, x)

    ms = timeit(s_compress, (m4,))
    print(f"  compress: {ms:7.2f} ms ({ms / B:5.2f}/frame)", flush=True)
    x16 = s_compress(m4)

    up1 = UpsampleBlock(512, 256, dtype=DTYPE, name="up_16_8")
    u1p = {"params": dparams["params"]["up_16_8"]}

    @jax.jit
    def s_up1(f8, x):
        return up1.apply(u1p, f8, x)

    ms = timeit(s_up1, (f8, x16))
    print(f"  up_16_8: {ms:7.2f} ms ({ms / B:5.2f}/frame)", flush=True)
    x8 = s_up1(f8, x16)

    up2 = UpsampleBlock(256, 256, dtype=DTYPE, name="up_8_4")
    u2p = {"params": dparams["params"]["up_8_4"]}

    @jax.jit
    def s_up2(f4, x):
        return up2.apply(u2p, f4, x)

    ms = timeit(s_up2, (f4, x8))
    print(f"  up_8_4: {ms:7.2f} ms ({ms / B:5.2f}/frame)", flush=True)
    x4 = s_up2(f4, x8)

    pred = nn.Conv(1, (3, 3), padding=1, dtype=DTYPE, name="pred")
    pp = {"params": dparams["params"]["pred"]}

    @jax.jit
    def s_pred(x):
        y = pred.apply(pp, jax.nn.relu(x))
        h, w = y.shape[-3], y.shape[-2]
        return jax.nn.sigmoid(resize_bilinear(y, (4 * h, 4 * w))[..., 0])

    ms = timeit(s_pred, (x4,))
    print(f"  pred+resize+sigmoid: {ms:7.2f} ms ({ms / B:5.2f}/frame)",
          flush=True)


if __name__ == "__main__":
    main()

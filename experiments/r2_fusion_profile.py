"""Profile the fusion path of a blocked propagation pass on TPU.

Times three jitted stages with chained data dependencies (tunnel-safe),
then dumps a jax.profiler trace of the full fused blocked call and prints
per-op totals via ProfileData.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from eva_vos_tpu.models import PropagationNetwork, FusionNet
from eva_vos_tpu.engine import InferenceEngine
from eva_vos_tpu.engine.propagation import EngineConfig

DTYPE = jnp.bfloat16
H, W = 480, 864
H16, W16 = H // 16, W // 16
HW = H16 * W16
B = 5  # mem_freq block


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
    fusion = FusionNet(dtype=DTYPE)
    sp = stcn.init(jax.random.PRNGKey(0), jnp.zeros((H, W, 3), DTYPE),
                   jnp.zeros((1, H, W), DTYPE), method="init_all")
    fp = fusion.init(jax.random.PRNGKey(1), jnp.zeros((H, W, 3), DTYPE),
                     jnp.zeros((H, W), DTYPE), jnp.zeros((H, W), DTYPE),
                     jnp.zeros((H, W, 2), DTYPE), jnp.zeros((2,), DTYPE))
    eng = InferenceEngine(stcn, fusion, sp, fp,
                          EngineConfig(feature_chunk=2))
    rng = np.random.default_rng(0)

    class F:  # minimal VideoFeatures stand-in for the methods used
        images = jnp.asarray(rng.standard_normal((B, H, W, 3)), DTYPE)
        k16 = jnp.asarray(rng.standard_normal((B, HW, 64)), DTYPE)
        f16_thin = jnp.asarray(rng.standard_normal((B, H16, W16, 512)), DTYPE)
        f16 = jnp.asarray(rng.standard_normal((B, H16, W16, 1024)), DTYPE)
        f8 = jnp.asarray(rng.standard_normal((B, H // 8, W // 8, 512)), DTYPE)
        f4 = jnp.asarray(rng.standard_normal((B, H // 4, W // 4, 256)), DTYPE)

    feats = F()
    tis = jnp.arange(B, dtype=jnp.int32)
    prev = jnp.asarray(rng.uniform(size=(B, 2, H, W)), jnp.float32)
    curr = jnp.asarray(rng.uniform(size=(B, 2, H, W)), jnp.float32)
    key_k16 = jnp.asarray(rng.standard_normal((H16, W16, 64)), DTYPE)
    pos = jnp.asarray(rng.uniform(size=(1, H, W)), jnp.float32)
    neg = jnp.asarray(rng.uniform(size=(1, H, W)), jnp.float32)
    tc = jnp.asarray(10, jnp.int32)
    tr = jnp.asarray(0, jnp.int32)

    # stage 1: batched get_attention
    @jax.jit
    def attn_only(key_k16, pos, neg, tis):
        def one(ti):
            return stcn.apply(sp, key_k16, pos, neg,
                              feats.k16[ti].reshape(H16, W16, -1),
                              method="get_attention")
        return jax.vmap(one)(tis)

    ms = timeit(attn_only, (key_k16, pos, neg, tis))
    print(f"get_attention x{B}: {ms:7.2f} ms  ({ms / B:5.2f}/frame)",
          flush=True)
    attn = attn_only(key_k16, pos, neg, tis)

    # stage 2: batched FusionNet + aggregate (via engine._fuse_frame)
    @jax.jit
    def fuse_only(prev, curr, attn, tis):
        def one(ti, p, c, a):
            return eng._fuse_frame(feats, p, c, a, tc, tr, ti)
        return jax.vmap(one)(tis, prev, curr, attn)

    ms = timeit(fuse_only, (prev, curr, attn, tis))
    print(f"fusionnet+agg x{B}: {ms:7.2f} ms  ({ms / B:5.2f}/frame)",
          flush=True)

    # stage 3: the full batched fusion helper
    @jax.jit
    def full(prev, curr, key_k16, pos, neg, tis):
        return eng._fuse_frames_batched(feats, prev, curr, key_k16, pos,
                                        neg, tc, tr, tis)

    ms = timeit(full, (prev, curr, key_k16, pos, neg, tis))
    print(f"fuse_frames_batched x{B}: {ms:7.2f} ms  ({ms / B:5.2f}/frame)",
          flush=True)


if __name__ == "__main__":
    main()

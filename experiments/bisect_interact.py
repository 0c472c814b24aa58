"""Bisect the per-frame cost of the propagation loop on TPU.

Variants build up the do_pass body piece by piece inside the same
fori_loop/carry structure as the engine, so the measured deltas attribute
the 23 ms/frame observed in bench.py to specific components.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from eva_vos_tpu.models import PropagationNetwork
from eva_vos_tpu.ops import memory_readout, aggregate_wbg

DTYPE = jnp.bfloat16
T, H, W = 30, 480, 864
H16, W16 = H // 16, W // 16
HW = H16 * W16
MMAX = 10
CK, CV = 64, 512


def main():
    stcn = PropagationNetwork(dtype=DTYPE)
    params = stcn.init(jax.random.PRNGKey(0), jnp.zeros((H, W, 3), DTYPE),
                       jnp.zeros((1, H, W), DTYPE), method="init_all")
    rng = np.random.default_rng(0)

    feats = {
        "images": jnp.asarray(rng.standard_normal((T, H, W, 3)), DTYPE),
        "k16": jnp.asarray(rng.standard_normal((T, HW, CK)), DTYPE),
        "f16_thin": jnp.asarray(rng.standard_normal((T, H16, W16, CV)), DTYPE),
        "f16": jnp.asarray(rng.standard_normal((T, H16, W16, 1024)), DTYPE),
        "f8": jnp.asarray(rng.standard_normal((T, H // 8, W // 8, 512)), DTYPE),
        "f4": jnp.asarray(rng.standard_normal((T, H // 4, W // 4, 256)), DTYPE),
    }
    bank_k = jnp.asarray(rng.standard_normal((MMAX, HW, CK)), DTYPE)
    bank_v = jnp.asarray(rng.standard_normal((MMAX, 1, HW, CV)), DTYPE)
    prob0 = jnp.zeros((2, T, H, W), jnp.float32)

    def segment(bank_k, bank_v, front, ti):
        qk = feats["k16"][ti]
        mk = bank_k.reshape(MMAX * HW, CK)
        mv = jnp.transpose(bank_v, (1, 0, 2, 3)).reshape(1, MMAX * HW, CV)
        ro = memory_readout(mk, qk, mv, top_k=50, valid_tokens=front * HW,
                            strategy="scatter")
        return ro.reshape(1, H16, W16, CV)

    def decode(ro, ti):
        return stcn.apply(params, ro, feats["f16_thin"][ti], feats["f8"][ti],
                          feats["f4"][ti], method="decode_with_readout")

    def encode_value(ti, masks):
        v = stcn.apply(params, feats["images"][ti], feats["f16"][ti], masks,
                       method="encode_value")
        return v.reshape(1, HW, CV)

    def make_variant(level):
        def body(i, carry):
            prob, bk, bv, front, last = carry
            ti = 1 + i
            if level == 0:
                new_col = jax.lax.dynamic_index_in_dim(
                    prob, ti - 1, 1, keepdims=False) + 0.1
            else:
                ro = segment(bk, bv, front, ti)
                if level == 1:
                    new_col = jnp.zeros((2, H, W), jnp.float32) + \
                        jnp.mean(ro).astype(jnp.float32)
                else:
                    out = decode(ro, ti)
                    out = aggregate_wbg(out.astype(jnp.float32), keep_bg=True)
                    new_col = out
                    if level >= 3:
                        do_store = jnp.abs(ti - last) >= 5

                        def store(args):
                            bk, bv, front, last = args
                            val = encode_value(ti, out[1:].astype(DTYPE))
                            bk = jax.lax.dynamic_update_index_in_dim(
                                bk, feats["k16"][ti], front, 0)
                            bv = jax.lax.dynamic_update_index_in_dim(
                                bv, val[None][0][None], front, 0)
                            return bk, bv, front + 1, ti

                        bk, bv, front, last = jax.lax.cond(
                            do_store, store, lambda a: a,
                            (bk, bv, front, last))
            prob = jax.lax.dynamic_update_index_in_dim(prob, new_col, ti, 1)
            return prob, bk, bv, front, last

        @jax.jit
        def run(prob, bk, bv):
            out = jax.lax.fori_loop(
                0, T - 1, body,
                (prob, bk, bv, jnp.asarray(2, jnp.int32),
                 jnp.asarray(0, jnp.int32)))
            return out[0]

        return run

    for level, name in [(0, "loop+prob-update only"),
                        (1, "+ memory readout"),
                        (2, "+ decode+aggregate"),
                        (3, "+ cond encode_value/bank")]:
        run = make_variant(level)
        t0 = time.perf_counter()
        out = run(prob0, bank_k, bank_v)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            out = run(prob0, bank_k, bank_v)
        jax.block_until_ready(out)
        per_frame = (time.perf_counter() - t0) / n / (T - 1) * 1000
        print(f"L{level} {name:28s} compile {compile_s:6.1f}s   "
              f"{per_frame:7.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()

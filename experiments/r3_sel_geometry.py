"""Tournament-selection block-geometry sweep (v5e).

The selection kernel is VPU-latency-bound: per (live block, query tile)
it runs ~8 tournament passes + a k-pass extraction of serially-dependent
vector ops whose tiles underfill the pipeline.  Fatter query tiles
(block_q 256/512) halve/quarter the serial step count at constant total
work; smaller block_m keeps the score tile inside scoped VMEM
(validate_block_geometry caps block_m*block_q at 512k elements).

Run on TPU:  python experiments/r3_sel_geometry.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from eva_vos_tpu.kernels import pallas_memory_topk

HW = 1620
CK = 64
TOP_K = 50


def make_timed(fn, iters=30):
    @jax.jit
    def run(qk0, valid):
        def body(_, qk):
            w, _i = fn(qk, valid)
            delta = jnp.mean(w, axis=1)[:, None]
            return (qk.astype(jnp.float32)
                    + 1e-6 * delta).astype(qk.dtype)

        return jax.lax.fori_loop(0, iters, body, qk0)

    def timed(qk0, valid):
        jax.block_until_ready(run(qk0, valid))
        t0 = time.perf_counter()
        jax.block_until_ready(run(qk0, valid))
        return (time.perf_counter() - t0) / iters

    return timed


def main():
    rng = np.random.default_rng(0)
    mmax = 78
    cents = rng.standard_normal((mmax, CK)) * 1.5
    mk = (np.repeat(cents, HW, axis=0)
          + 0.7 * rng.standard_normal((mmax * HW, CK)))
    qk = (np.tile(cents[3], (HW, 1)) + 0.7 * rng.standard_normal((HW, CK)))
    mk = jnp.asarray(mk, jnp.bfloat16)
    qk0 = jnp.asarray(qk, jnp.bfloat16)

    from eva_vos_tpu.ops import memory_affinity_topk

    out = {}
    for bq, bm in [(128, 4096), (256, 2048), (512, 1024), (256, 4096)]:
        def sel(q, valid, bq=bq, bm=bm):
            return pallas_memory_topk(mk, q, TOP_K, valid, block_q=bq,
                                      block_m=bm, method="tournament")

        try:
            # exactness first — on clustered bf16 keys, score TIES resolve
            # to different (equal-valued) indices across implementations,
            # so compare the per-query sorted weight multisets, not indices
            rw = np.sort(np.asarray(
                memory_affinity_topk(mk, qk0, TOP_K, 13 * HW)[0],
                np.float32), axis=-1)
            w = np.sort(np.asarray(
                sel(qk0, jnp.asarray(13 * HW, jnp.int32))[0],
                np.float32), axis=-1)
            ok = bool(np.allclose(w, rw, rtol=1e-3, atol=1e-4))
            timer = make_timed(sel)
            row = {"exact_fill13": ok}
            for fill in (7, 13, 30):
                row[f"fill_{fill}"] = round(
                    timer(qk0, jnp.asarray(fill * HW, jnp.int32)) * 1e3, 3)
        except Exception as e:
            row = {"error": f"{type(e).__name__}: {e}"[:200]}
        out[f"bq{bq}_bm{bm}"] = row
        print(f"bq{bq}_bm{bm}: {row}", flush=True)

    with open("experiments/r3_sel_geometry.json", "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()

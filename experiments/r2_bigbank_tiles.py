"""Big-bank readout tile sweep: HBM traffic of the fused readout scales as
(N / block_q) * M * CV bytes — each query tile re-streams the whole value
bank.  At the interactive 72-slot bank (116k tokens) the default
block_q=128 fetches ~8 GB per call; larger query tiles divide that.
Measures selection + fused readout standalone at the engine's blocked
geometry (5 frames x 1620 queries), bf16, one object.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from eva_vos_tpu.kernels.memory_topk import pallas_memory_topk, tournament_topk_t
from eva_vos_tpu.kernels.memory_readout import pallas_fused_readout
from eva_vos_tpu.ops.memory_attention import memory_readout


def timeit(fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    hw = 1620
    q = 5 * hw          # blocked segmentation: 5 frames of queries
    mslots = 72
    m = mslots * hw     # 116,640 tokens
    ck, cv, top_k = 64, 512, 50
    rng = np.random.default_rng(0)
    mk = jnp.asarray(rng.standard_normal((m, ck)), jnp.bfloat16)
    qk = jnp.asarray(rng.standard_normal((q, ck)), jnp.bfloat16)
    mv = jnp.asarray(rng.standard_normal((1, m, cv)), jnp.bfloat16)
    valid = m  # fully-populated bank (worst case)

    ref = memory_readout(mk, qk, mv, top_k=top_k, valid_tokens=valid,
                         strategy="gather")
    ms = timeit(memory_readout, mk, qk, mv, top_k=top_k,
                valid_tokens=valid, strategy="gather", n=3)
    print(f"xla gather readout (selection incl.): {ms:8.2f} ms", flush=True)

    for bq in (128, 256, 512):
        try:
            ms = timeit(pallas_memory_topk, mk, qk, top_k, valid,
                        block_q=bq, block_m=4096, method="tournament")
            print(f"selection tournament block_q={bq}: {ms:8.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"selection tournament block_q={bq}: ERROR "
                  f"{type(e).__name__}", flush=True)

    for bq in (128, 256, 512, 1024):
        for rbm in (2048, 4096):
            try:
                out = pallas_fused_readout(mk, qk, mv, top_k, valid,
                                           block_q=bq, block_m=4096,
                                           readout_block_m=rbm)
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                            - ref.astype(jnp.float32))))
                ms = timeit(pallas_fused_readout, mk, qk, mv, top_k, valid,
                            block_q=bq, block_m=4096, readout_block_m=rbm)
                print(f"fused block_q={bq} rbm={rbm}: {ms:8.2f} ms  "
                      f"max|d|={err:.4f}", flush=True)
            except Exception as e:
                print(f"fused block_q={bq} rbm={rbm}: ERROR "
                      f"{type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()

"""Validate + time the dynamic-grid kernels on TPU: big mostly-empty bank,
several fill levels; correctness vs the XLA gather oracle and per-call
latency (expected ~linear in the fill level now that dead blocks are
never scheduled)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from eva_vos_tpu.kernels.memory_readout import pallas_fused_readout
from eva_vos_tpu.kernels.memory_topk import pallas_memory_topk
from eva_vos_tpu.ops.memory_attention import memory_readout


def timeit(fn, n=20):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    hw = 1620
    q, m = 5 * hw, 72 * hw
    ck, cv, top_k = 64, 512, 50
    rng = np.random.default_rng(0)
    mk = jnp.asarray(rng.standard_normal((m, ck)), jnp.bfloat16)
    qk = jnp.asarray(rng.standard_normal((q, ck)), jnp.bfloat16)
    mv = jnp.asarray(rng.standard_normal((1, m, cv)), jnp.bfloat16)

    from eva_vos_tpu.ops.memory_attention import memory_affinity_topk

    for slots in (4, 13, 36, 72):
        valid = slots * hw
        ref = memory_readout(mk, qk, mv, top_k=top_k, valid_tokens=valid,
                             strategy="gather")
        out = pallas_fused_readout(mk, qk, mv, top_k, valid)
        d = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                  - ref.astype(jnp.float32))))
        rw, ri = memory_affinity_topk(mk, qk, top_k, valid)
        line = f"slots={slots:3d}"
        ms_f = timeit(lambda: pallas_fused_readout(mk, qk, mv, top_k, valid))
        line += f" fused={ms_f:7.2f}ms max|d|={d:.4f}"
        for bq, rbm in ((256, 2048), (256, 4096), (512, 2048)):
            try:
                out2 = pallas_fused_readout(mk, qk, mv, top_k, valid,
                                            block_q=bq, block_m=4096,
                                            readout_block_m=rbm)
                d2 = float(jnp.max(jnp.abs(out2.astype(jnp.float32)
                                           - ref.astype(jnp.float32))))
                ms2 = timeit(lambda: pallas_fused_readout(
                    mk, qk, mv, top_k, valid, block_q=bq, block_m=4096,
                    readout_block_m=rbm))
                ok2 = "OK" if d2 < 0.01 else f"BAD{d2:.3f}"
                line += f" f{bq}/{rbm}={ms2:6.2f}ms({ok2})"
            except Exception as e:
                line += f" f{bq}/{rbm}=ERR:{type(e).__name__}"
        for bm in (4096, 8192):
            try:
                w, i = pallas_memory_topk(mk, qk, top_k, valid,
                                          block_m=bm, method="tournament")
                ok = bool((np.asarray(i) == np.asarray(ri)).all())
                ms_s = timeit(lambda: pallas_memory_topk(
                    mk, qk, top_k, valid, block_m=bm, method="tournament"))
                line += f" sel{bm}={ms_s:6.2f}ms({'OK' if ok else 'BAD'})"
            except Exception as e:
                line += f" sel{bm}=ERR:{type(e).__name__}"
        print(line, flush=True)


if __name__ == "__main__":
    main()

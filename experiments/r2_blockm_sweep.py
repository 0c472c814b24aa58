"""Sweep selection/readout block sizes at the HEADLINE geometry (fresh
~6-slot bank) and the mid-session bank, with the raised VMEM cap.  Larger
blocks mean fewer running-top-k merges (the serial VPU cost)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from eva_vos_tpu.kernels.memory_readout import pallas_fused_readout
from eva_vos_tpu.kernels.memory_topk import pallas_memory_topk
from eva_vos_tpu.ops.memory_attention import (memory_affinity_topk,
                                              memory_readout)


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
    q, mslots = 5 * hw, 72
    m = mslots * hw
    ck, cv, top_k = 64, 512, 50
    rng = np.random.default_rng(0)
    mk = jnp.asarray(rng.standard_normal((m, ck)), jnp.bfloat16)
    qk = jnp.asarray(rng.standard_normal((q, ck)), jnp.bfloat16)
    mv = jnp.asarray(rng.standard_normal((1, m, cv)), jnp.bfloat16)

    for slots in (6, 22):
        valid = slots * hw
        ref = memory_readout(mk, qk, mv, top_k=top_k, valid_tokens=valid,
                             strategy="gather")
        rw, ri = memory_affinity_topk(mk, qk, top_k, valid)
        for bm in (4096, 8192, 16384, 32768):
            line = f"slots={slots:2d} bm={bm:5d}"
            try:
                w, i = pallas_memory_topk(mk, qk, top_k, valid, block_m=bm,
                                          method="tournament")
                ok = bool((np.asarray(i) == np.asarray(ri)).all())
                ms = timeit(lambda: pallas_memory_topk(
                    mk, qk, top_k, valid, block_m=bm, method="tournament"))
                line += f" sel={ms:6.2f}ms({'OK' if ok else 'BAD'})"
            except Exception as e:
                line += f" sel=ERR:{type(e).__name__}"
            for rbm in (2048, 4096):
                try:
                    out = pallas_fused_readout(mk, qk, mv, top_k, valid,
                                               block_m=bm,
                                               readout_block_m=rbm)
                    d = float(jnp.max(jnp.abs(
                        out.astype(jnp.float32) - ref.astype(jnp.float32))))
                    ms = timeit(lambda: pallas_fused_readout(
                        mk, qk, mv, top_k, valid, block_m=bm,
                        readout_block_m=rbm))
                    flag = "OK" if d < 0.01 else f"BAD{d:.3f}"
                    line += f" fus/{rbm}={ms:6.2f}ms({flag})"
                except Exception as e:
                    line += f" fus/{rbm}=ERR:{type(e).__name__}"
            print(line, flush=True)


if __name__ == "__main__":
    main()

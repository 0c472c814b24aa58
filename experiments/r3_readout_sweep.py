"""Fused-readout block_m granularity sweep + bf16-matmul effect (v5e).

Two levers on the index-scattered value sweep:
  * matmul dtype: the contrib @ V matmul now runs in the value bank's
    native dtype (bf16 production banks -> one MXU pass instead of the
    fp32 HIGHEST multi-pass) — measured here against the committed
    r3_kernel_bench.json numbers (same geometry).
  * readout_block_m: finer value blocks skip more (the top-50 ids
    cluster in a few bank frames), at the cost of more grid steps.

Geometry = the engine's blocked production call: 5 query frames
(8100 queries), 78-slot bank, clustered keys, fills 13/30/50/72.

Run on TPU:  python experiments/r3_readout_sweep.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from eva_vos_tpu.kernels import pallas_fused_readout
from r3_kernel_bench import make_bank, make_timed, HW, CK, CV


def main():
    rng = np.random.default_rng(0)
    mmax, top_k = 78, 50
    mk, qk0 = make_bank(mmax, "clustered", rng, query_frames=5)
    mv = jnp.asarray(rng.standard_normal((1, mmax * HW, CV)), jnp.bfloat16)

    out = {}
    # (readout_block_m, sel_block_q, sel_block_m) — rb sweep at the default
    # selection geometry, then the fat-tile selection (r3_sel_geometry
    # winner: 512x1024 ~2x faster standalone) at the engine's 5-frame
    # query batch
    configs = [(512, None, None), (1024, None, None), (2048, None, None),
               (4096, None, None), (2048, 512, 1024), (1024, 512, 1024),
               (512, 512, 1024)]
    for rb, sbq, sbm in configs:
        def fused(qk, valid, rb=rb, sbq=sbq, sbm=sbm):
            return pallas_fused_readout(mk, qk, mv, top_k, valid,
                                        block_q=128, block_m=4096,
                                        readout_block_m=rb,
                                        sel_block_q=sbq, sel_block_m=sbm)

        timed = make_timed(fused)
        name = f"rb_{rb}" + (f"_sel{sbq}x{sbm}" if sbq else "")
        row = {}
        for fill in (13, 30, 50, 72):
            valid = jnp.asarray(fill * HW, jnp.int32)
            try:
                row[f"fill_{fill}"] = round(timed(qk0, valid) * 1e3, 3)
            except Exception as e:
                row[f"fill_{fill}"] = f"ERROR: {type(e).__name__}: {e}"
            print(f"{name} fill={fill}: {row[f'fill_{fill}']}", flush=True)
        # exactness vs the XLA oracle at fill 30 (bf16 tie-tolerant)
        try:
            got = np.asarray(fused(qk0, jnp.asarray(30 * HW, jnp.int32)),
                             np.float32)
            from eva_vos_tpu.ops import memory_readout
            ref = np.asarray(memory_readout(mk, qk0, mv, top_k=top_k,
                                            valid_tokens=30 * HW,
                                            strategy="scatter"), np.float32)
            row["oracle_maxd_fill30"] = float(np.abs(got - ref).max())
        except Exception as e:
            row["oracle_maxd_fill30"] = f"ERROR: {e}"
        out[name] = row

    with open(Path(__file__).parent / "r3_readout_sweep.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

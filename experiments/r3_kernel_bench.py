"""Round-3 TPU experiment: tau-skip selection + index-skip gated readout.

The round-2 kernels do work proportional to the live bank per query tile:
the tournament runs its k-pass extraction for every live block, and the
gated readout runs the K dense value matmuls for every live block.  The
round-3 kernels skip blocks that provably cannot contribute (selection:
no score above the running tau; readout: no selected token id in the
block), so warm-bank cost tracks the top-k SPREAD, not the bank size.

The skip rate depends on query/memory correlation.  Random keys spread
the top-50 uniformly over the bank (worst case, near-zero readout skips);
real STCN keys cluster by frame — a query frame's top-50 lives in a few
temporally-near bank frames.  Bench both:
  * random:    iid normal keys (worst case)
  * clustered: per-frame centroids + per-token noise (realistic locality)

The bank-fill sweep reuses ONE compiled kernel per variant (``valid`` is
a traced argument; recompiling the chained timing loop per fill costs
minutes each through the axon tunnel).

Run on TPU:  python experiments/r3_kernel_bench.py
"""

import json
import sys
import time
from pathlib import Path

# repo-root import without PYTHONPATH (setting PYTHONPATH breaks the axon
# TPU plugin's interpreter-startup registration in this image)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from eva_vos_tpu.kernels import (pallas_supported, fused_readout_supported,
                                 pallas_memory_topk, pallas_fused_readout)
from eva_vos_tpu.ops import memory_readout

HW = 1620  # 480p token count per frame
CK, CV = 64, 512


def make_bank(n_slots, mode, rng, query_frames=1):
    if mode == "random":
        mk = rng.standard_normal((n_slots * HW, CK))
        qk = rng.standard_normal((query_frames * HW, CK))
    else:  # clustered: per-frame centroid + per-token noise (temporal
        # locality without the bf16 exact-tie degeneracy of tiny noise)
        cents = rng.standard_normal((n_slots, CK)) * 1.5
        mk = (np.repeat(cents, HW, axis=0)
              + 0.7 * rng.standard_normal((n_slots * HW, CK)))
        # match slot 3: inside EVERY fill level of the sweep (drawing from
        # all slots put the query's true frame outside the valid prefix
        # for small fills — a degenerate no-match regime, not locality)
        qc = cents[3]
        qk = (np.tile(qc, (query_frames * HW, 1))
              + 0.7 * rng.standard_normal((query_frames * HW, CK)))
    return (jnp.asarray(mk, jnp.bfloat16), jnp.asarray(qk, jnp.bfloat16))


def make_timed(fn, iters=30):
    """fn(qk, valid) -> [K, N, CV]; one jit reused across fills."""

    @jax.jit
    def run(qk0, valid):
        def body(_, qk):
            out = fn(qk, valid)
            delta = jnp.mean(out, axis=(0, 2))[:, None].astype(jnp.float32)
            return (qk.astype(jnp.float32) + 1e-6 * delta).astype(qk.dtype)

        return jax.lax.fori_loop(0, iters, body, qk0)

    def timed(qk0, valid):
        jax.block_until_ready(run(qk0, valid))
        t0 = time.perf_counter()
        jax.block_until_ready(run(qk0, valid))
        return (time.perf_counter() - t0) / iters

    return timed


def bench_fill(mode, fills, mmax=78, top_k=50, k_obj=1, queries=1):
    rng = np.random.default_rng(0)
    mk, qk0 = make_bank(mmax, mode, rng, query_frames=queries)
    mv = jnp.asarray(rng.standard_normal((k_obj, mmax * HW, CV)),
                     jnp.bfloat16)

    def sel(qk, valid):
        w, _ = pallas_memory_topk(mk, qk, top_k, valid, block_q=128,
                                  block_m=4096, method="tournament")
        return w[None]

    def sel_res(qk, valid):
        w, _ = pallas_memory_topk(mk, qk, top_k, valid, block_q=128,
                                  block_m=4096, method="resident")
        return w[None]

    def fused(qk, valid):
        return pallas_fused_readout(mk, qk, mv, top_k, valid,
                                    block_q=128, block_m=4096)

    timers = {"sel_tour": make_timed(sel), "sel_res": make_timed(sel_res),
              "fused": make_timed(fused)}
    out = {}
    for fill in fills:
        valid = jnp.asarray(fill * HW, jnp.int32)
        row = {}
        for name, timed in timers.items():
            try:
                row[name] = round(timed(qk0, valid) * 1e3, 3)
            except Exception as e:
                row[name] = f"ERROR: {type(e).__name__}: {e}"
        # exactness: (a) internal consistency — the fused readout must
        # reproduce the tournament selection's OWN candidate set exactly;
        # (b) XLA-oracle max delta (informational: score ties can resolve
        # differently between the kernel's [Bm,Qt] and the oracle's [N,M]
        # bf16 dot orientations)
        try:
            vals, idx = pallas_memory_topk(mk, qk0, top_k, int(valid),
                                           block_q=128, block_m=4096,
                                           method="tournament",
                                           return_raw=True)
            w = jnp.exp(vals - vals[:, :1])
            w = w / jnp.sum(w, axis=1, keepdims=True)
            sel_ref = np.asarray(
                jnp.einsum("nk,onkc->onc", w.astype(jnp.float32),
                           jnp.take(mv, idx, axis=1).astype(jnp.float32)),
                np.float32)
            got = np.asarray(fused(qk0, valid), np.float32)
            row["fused_vs_selection_ok"] = bool(
                np.allclose(got, sel_ref, rtol=2e-2, atol=2e-2))
            ref = np.asarray(memory_readout(mk, qk0, mv, top_k=top_k,
                                            valid_tokens=int(valid),
                                            strategy="scatter"), np.float32)
            row["fused_vs_oracle_maxd"] = float(np.abs(got - ref).max())
        except Exception as e:
            row["fused_vs_selection_ok"] = f"ERROR: {e}"
        out[f"fill_{fill}"] = row
        print(f"[{mode}] fill={fill:3d}: {row}", flush=True)
    return out


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    print(f"pallas_supported: {pallas_supported()}", flush=True)
    print(f"fused_readout_supported: {fused_readout_supported()}", flush=True)
    out = {}
    fills = [7, 13, 30, 50, 72]
    out["clustered"] = bench_fill("clustered", fills)
    out["random"] = bench_fill("random", fills)
    out["blocked_clustered"] = bench_fill("clustered", [7], mmax=10,
                                          queries=5)
    with open("experiments/r3_kernel_bench.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

"""Debug: clustered-data fused-readout mismatch on TPU (r3 kernel bench).

Bisect with the ablation env flags:
  EVAVOS_SEL_NOTAU=1        disable the selection tau-skip
  EVAVOS_READOUT_NOSKIP=1   disable the readout in-block skip

Checks, at clustered geometry:
  A. tournament selection idx vs the XLA oracle (tie-aware)
  B. fused readout vs a gather built from the selection's OWN vals/idx
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from eva_vos_tpu.kernels import pallas_memory_topk, pallas_fused_readout
from eva_vos_tpu.ops.memory_attention import memory_affinity_topk

HW, CK, CV = 1620, 64, 512


def main(mmax=20, fill=7, top_k=50):
    rng = np.random.default_rng(0)
    cents = rng.standard_normal((mmax, CK)) * 1.5
    mk = (np.repeat(cents, HW, axis=0)
          + 0.7 * rng.standard_normal((mmax * HW, CK)))
    qc = cents[rng.integers(mmax)]
    qk = np.tile(qc, (HW, 1)) + 0.7 * rng.standard_normal((HW, CK))
    mk = jnp.asarray(mk, jnp.bfloat16)
    qk = jnp.asarray(qk, jnp.bfloat16)
    mv = jnp.asarray(rng.standard_normal((1, mmax * HW, CV)), jnp.bfloat16)
    valid = fill * HW

    print("flags:", {k: os.environ.get(k) for k in
                     ("EVAVOS_SEL_NOTAU", "EVAVOS_READOUT_NOSKIP")},
          flush=True)

    # A: selection vs oracle
    vals, idx = pallas_memory_topk(mk, qk, top_k, valid, block_q=128,
                                   block_m=4096, method="tournament",
                                   return_raw=True)
    rw, ri = memory_affinity_topk(mk, qk, top_k, valid_tokens=valid)
    idx_n, ri_n = np.asarray(idx), np.asarray(ri)
    mism = (idx_n != ri_n).any(axis=1)
    print(f"A: selection idx mismatch rows: {mism.sum()}/{len(mism)}",
          flush=True)
    if mism.any():
        r = int(np.where(mism)[0][0])
        print("  row", r)
        print("  got idx ", idx_n[r][:12], "... vals", np.asarray(vals)[r][:6])
        print("  want idx", ri_n[r][:12])
        # oracle raw scores for both sets
        sv = np.asarray(rw)[r][:6]
        print("  oracle weights", sv)

    # B: fused vs selection-gather
    w = jnp.exp(vals - vals[:, :1])
    w = w / jnp.sum(w, axis=1, keepdims=True)
    sel_ref = np.asarray(
        jnp.einsum("nk,onkc->onc", w.astype(jnp.float32),
                   jnp.take(mv, idx, axis=1).astype(jnp.float32)),
        np.float32)
    got = np.asarray(pallas_fused_readout(mk, qk, mv, top_k, valid,
                                          block_q=128, block_m=4096),
                     np.float32)
    d = np.abs(got - sel_ref)
    print(f"B: fused vs selection-gather max|d| {d.max():.4f} "
          f"(bad queries: {(d.max(axis=(0, 2)) > 0.05).sum()})", flush=True)
    if d.max() > 0.05:
        q_bad = int(np.argmax(d.max(axis=(0, 2))))
        print("  worst query", q_bad, "sel vals:",
              np.asarray(vals)[q_bad][:6], "tau:",
              float(np.asarray(vals)[q_bad][-1]))


if __name__ == "__main__":
    main()

"""Interpret-mode exactness check for the resident-bank selection kernel.

Cases: random, clustered (temporal locality), adversarial (one group holds
the entire top-k -> forces verify/escalate), partial fill, fp32 + bf16.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from eva_vos_tpu.kernels.memory_topk import pallas_memory_topk
from eva_vos_tpu.ops.memory_attention import memory_affinity_topk


def check(name, mk, qk, top_k, valid):
    w, i = pallas_memory_topk(jnp.asarray(mk), jnp.asarray(qk), top_k,
                              valid, block_q=64, block_m=256,
                              method="resident", interpret=True)
    rw, ri = memory_affinity_topk(jnp.asarray(mk), jnp.asarray(qk), top_k,
                                  valid)
    idx_ok = bool((np.asarray(i) == np.asarray(ri)).all())
    w_ok = bool(np.allclose(np.asarray(w), np.asarray(rw), atol=1e-5))
    print(f"{name}: idx_ok={idx_ok} w_ok={w_ok}")
    if not idx_ok:
        bad = np.where(np.asarray(i) != np.asarray(ri))
        print("  first mismatches:", bad[0][:5], bad[1][:5])
        print("  got ", np.asarray(i)[bad[0][0]][:10])
        print("  want", np.asarray(ri)[bad[0][0]][:10])
    return idx_ok and w_ok


def main():
    rng = np.random.default_rng(0)
    ok = True
    m, n, ck, k = 1024, 128, 32, 20

    mk = rng.standard_normal((m, ck)).astype(np.float32)
    qk = rng.standard_normal((n, ck)).astype(np.float32)
    ok &= check("random_f32", mk, qk, k, None)
    ok &= check("random_f32_fill", mk, qk, k, 700)

    # clustered: queries match one memory neighborhood
    cent = rng.standard_normal(ck).astype(np.float32)
    mk2 = 0.3 * rng.standard_normal((m, ck)).astype(np.float32)
    mk2[300:428] += cent  # one 128-token group-aligned region dominates
    qk2 = cent + 0.05 * rng.standard_normal((n, ck)).astype(np.float32)
    ok &= check("clustered_escalate_f32", mk2, qk2, k, None)

    # all top-k inside ONE group (max escalation pressure)
    mk3 = np.full((m, ck), -5.0, np.float32)
    mk3[256:288] = qk2[:32, :]  # 32 near-perfect matches in one group
    ok &= check("onegroup_f32", mk3, qk2, k, None)

    ok &= check("random_bf16", mk.astype(jnp.bfloat16),
                qk.astype(jnp.bfloat16), k, None)

    print("ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

"""Tournament rounds/group parameter sweep at engine geometry (v5e).

The selection kernel is near the VPU element-op roofline, so the lever is
op COUNT: per (query tile, live block) the kernel runs ``rounds``
tournament passes (3 full-tile ops each) plus a ``top_k``-pass extraction
over ``rounds * (block_m/group) + top_k`` candidate rows.  Fewer rounds
and/or fatter groups cut both terms; the verify/escalate chain keeps the
result exact, so the only risk is escalation frequency on clustered
scores (a group hiding more than ``rounds`` of a query's winners).

Geometry: 5 query frames (8100 q), 78-slot bank, fills 13/30/72,
clustered AND random keys.  Because the env knobs are read at TRACE
time, each config runs in a fresh subprocess.

Run on TPU:  python experiments/r3_tour_params.py
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
import numpy as np, jax, jax.numpy as jnp
from eva_vos_tpu.kernels import pallas_memory_topk
from experiments.r3_kernel_bench import make_bank, HW, CK

rng = np.random.default_rng(0)
mmax, top_k = 78, 50
out = {{}}
for mode in ("clustered", "random"):
    mk, qk0 = make_bank(mmax, mode, rng, query_frames=5)

    def sel(qk, valid):
        w, _ = pallas_memory_topk(mk, qk, top_k, valid, block_q=128,
                                  block_m=4096, method="tournament")
        return w

    @jax.jit
    def run(qk0, valid):
        def body(_, qk):
            w = sel(qk, valid)
            delta = jnp.mean(w, axis=1)[:, None]
            return (qk.astype(jnp.float32) + 1e-6 * delta).astype(qk.dtype)
        return jax.lax.fori_loop(0, 30, body, qk0)

    row = {{}}
    for fill in (13, 30, 72):
        valid = jnp.asarray(fill * HW, jnp.int32)
        jax.block_until_ready(run(qk0, valid))
        t0 = time.perf_counter()
        jax.block_until_ready(run(qk0, valid))
        row[f"fill_{{fill}}"] = round((time.perf_counter() - t0) / 30 * 1e3, 3)
    # exactness (sorted-weight multiset vs XLA oracle at fill 13)
    from eva_vos_tpu.ops import memory_affinity_topk
    rw = np.sort(np.asarray(memory_affinity_topk(
        mk, qk0, top_k, 13 * HW)[0], np.float32), axis=-1)
    w = np.sort(np.asarray(pallas_memory_topk(
        mk, qk0, top_k, jnp.asarray(13 * HW, jnp.int32), block_q=128,
        block_m=4096, method="tournament")[0], np.float32), axis=-1)
    row["weights_exact"] = bool(np.allclose(w, rw, rtol=1e-3, atol=1e-4))
    out[mode] = row
print("RESULT" + json.dumps(out))
"""


def main():
    results = {}
    for rounds, group in [(8, 128), (6, 128), (4, 128), (4, 256), (8, 256)]:
        env = dict(os.environ)
        env["EVAVOS_TOUR_ROUNDS"] = str(rounds)
        env["EVAVOS_TOUR_GROUP"] = str(group)
        name = f"r{rounds}_g{group}"
        proc = subprocess.run(
            [sys.executable, "-c", CHILD.format(repo=str(REPO))],
            env=env, capture_output=True, text=True, timeout=1800)
        tag = [ln for ln in proc.stdout.splitlines()
               if ln.startswith("RESULT")]
        if tag:
            results[name] = json.loads(tag[0][6:])
        else:
            results[name] = {"error": proc.stderr[-400:]}
        print(name, json.dumps(results[name]), flush=True)

    with open(REPO / "experiments" / "r3_tour_params.json", "w") as fh:
        json.dump(results, fh, indent=2)


if __name__ == "__main__":
    main()

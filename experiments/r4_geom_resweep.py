"""r4: selection tile-geometry re-sweep with WINDOW-CHAINED timing.

r3_sel_geometry picked 512x1024 with the per-round block_until_ready
timing that the r4 sync probe invalidated; r4_sel_attrib shows 512x2048
(blocked by the r2 VMEM validator calibration, never swept) beating it at
both fills, consistent with per-block data-dependent branch syncs being
the dominant non-tournament cost.  Honest re-sweep, exactness-checked.
Writes experiments/r4_geom_resweep.json."""
import json, math, os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("EVAVOS_JAX_CACHE", "/tmp/evavos_xla_cache")
os.environ["EVAVOS_SKIP_VALIDATE"] = "1"
import jax, jax.numpy as jnp, numpy as np
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["EVAVOS_JAX_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass
from eva_vos_tpu.kernels.memory_topk import tournament_topk_t
from eva_vos_tpu.ops.memory_attention import memory_affinity_topk

CK, K, N, TPS = 64, 50, 8100, 1620
GEOMS = [(512, 1024), (512, 2048), (256, 2048), (256, 4096),
         (1024, 1024), (1024, 2048)]

def inputs(fill, bq, bm, seed=0):
    rng = np.random.default_rng(seed)
    m = fill * TPS
    mp = m + (-m) % bm
    npad = N + (-N) % bq
    mk = jnp.asarray(rng.standard_normal((mp, CK)), jnp.bfloat16)
    qk = jnp.asarray(rng.standard_normal((npad, CK)), jnp.bfloat16)
    msq = jnp.sum(mk.astype(jnp.float32) ** 2, axis=-1)
    return qk, mk, msq, jnp.asarray([m], jnp.int32), m

res = {"device": jax.devices()[0].device_kind, "note": "defer_s=0"}
for fill in (13, 72):
    row = {}
    ref_i = None
    for bq, bm in GEOMS:
        qk, mk, msq, valid, m = inputs(fill, bq, bm)
        try:
            @jax.jit
            def step(q, mk=mk, msq=msq, valid=valid, bq=bq, bm=bm):
                v, i = tournament_topk_t(q, mk, msq, valid, top_k=K,
                                         block_q=bq, block_m=bm,
                                         scale=math.sqrt(CK), defer_s=0)
                return q + (v[0, 0] * 0).astype(q.dtype), (v, i)
            q = qk
            for _ in range(3):
                q, out = step(q)
            jax.device_get(out[0][0, 0])
            t0 = time.perf_counter()
            for _ in range(20):
                q, out = step(q)
            jax.device_get(out[0][0, 0])
            ms = (time.perf_counter() - t0) / 20 * 1e3
            it = np.asarray(out[1].T[:N])
            if ref_i is None:
                _, r = memory_affinity_topk(mk[:m], qk[:N], K)
                ref_i = np.asarray(r)
            ok = bool((it == ref_i).all())
            row[f"{bq}x{bm}"] = {"ms": round(ms, 3), "exact": ok}
            print(f"fill{fill} {bq}x{bm}: {ms:.3f} ms exact={ok}",
                  flush=True)
        except Exception as e:
            row[f"{bq}x{bm}"] = f"failed: {type(e).__name__}"[:120]
            print(f"fill{fill} {bq}x{bm}: FAILED {type(e).__name__}",
                  flush=True)
    res[f"fill{fill}"] = row
with open("/root/repo/experiments/r4_geom_resweep.json", "w") as f:
    json.dump(res, f, indent=1)
print(json.dumps(res))

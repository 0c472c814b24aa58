"""r4: deferred-merge tournament (defer_s) on-chip timing + compiled-mode
exactness vs the XLA oracle, at production geometry (512x1024, k=50,
CK=64, bf16), fills 13 and 72.  Writes experiments/r4_defer_timing.json."""
import json, math, os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("EVAVOS_JAX_CACHE", "/tmp/evavos_xla_cache")
import jax, jax.numpy as jnp, numpy as np
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["EVAVOS_JAX_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass
from eva_vos_tpu.kernels.memory_topk import tournament_topk_t
from eva_vos_tpu.ops.memory_attention import memory_affinity_topk

CK, K, BQ, BM, N, TPS = 64, 50, 512, 1024, 8100, 1620

def inputs(fill, seed=0):
    rng = np.random.default_rng(seed)
    m = fill * TPS
    mp = m + (-m) % BM
    npad = N + (-N) % BQ
    mk = jnp.asarray(rng.standard_normal((mp, CK)), jnp.bfloat16)
    qk = jnp.asarray(rng.standard_normal((npad, CK)), jnp.bfloat16)
    msq = jnp.sum(mk.astype(jnp.float32) ** 2, axis=-1)
    return qk, mk, msq, jnp.asarray([m], jnp.int32), m

def timed(defer, qk, mk, msq, valid, iters=20):
    @jax.jit
    def step(q):
        v, i = tournament_topk_t(q, mk, msq, valid, top_k=K, block_q=BQ,
                                 block_m=BM, scale=math.sqrt(CK),
                                 defer_s=defer)
        return q + (v[0, 0] * 0).astype(q.dtype), (v, i)
    q = qk
    for _ in range(3):
        q, out = step(q)
    jax.device_get(out[0][0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        q, out = step(q)
    jax.device_get(out[0][0, 0])
    ms = (time.perf_counter() - t0) / iters * 1e3
    return ms, out

res = {"device": jax.devices()[0].device_kind}
for fill in (13, 72):
    qk, mk, msq, valid, m = inputs(fill)
    row = {}
    ref_i = None
    for defer in (0, 4, 8, 16):
        ms, (v, i) = timed(defer, qk, mk, msq, valid)
        row[f"defer{defer}"] = round(ms, 3)
        # compiled-mode exactness: indices equal to the XLA oracle
        it = np.asarray(i.T[:N])
        if ref_i is None:
            _, ref_i = memory_affinity_topk(mk[:m], qk[:N], K)
            ref_i = np.asarray(ref_i)
        ok = bool((it == ref_i).all())
        row[f"defer{defer}_exact"] = ok
        print(f"fill{fill} defer{defer}: {ms:.3f} ms exact={ok}", flush=True)
    res[f"fill{fill}"] = row
with open("/root/repo/experiments/r4_defer_timing.json", "w") as f:
    json.dump(res, f, indent=1)
print(json.dumps(res))

"""Attribute the predict_select 112 ms (BENCH/r4): dispatch RTT, target
upload, fetch count, decode compute.  Runs on the real TPU chip.

Skips the ViT-H encoder entirely: fabricated features + size bookkeeping
via restore_embedding_state (the decode path is what's measured)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import bench

H, W = 480, 854
ITERS = 12


def med(fn, n=ITERS):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


controller = bench.build_jax_sam()
p = controller.predictor
cfg = p.cfg
rng = np.random.default_rng(0)

# fabricate an embedded state at 480p geometry
feats = jnp.asarray(rng.standard_normal((cfg.grid, cfg.grid,
                                         cfg.prompt_embed_dim)),
                    p.sam.dtype)
from eva_vos_tpu.models.sam.predictor import get_preprocess_shape

controller.restore_embedding_state(
    (feats, (H, W), get_preprocess_shape(H, W, cfg.img_size)))

gt = np.zeros((H, W), np.float32)
gt[100:260, 300:520] = 1.0
pt = np.array([[410.0, 180.0]])
lbl = np.ones((1,), np.int32)

out = {}

# (0) tunnel RTT: trivial jitted op + 4-byte fetch
one = jnp.ones((8, 128), jnp.float32)
f_triv = jax.jit(lambda x: x.sum())
jax.block_until_ready(f_triv(one))
out["rtt_trivial_dispatch_fetch_ms"] = med(
    lambda: float(f_triv(one)))

# (1) upload cost of the bool target mask
tgt_np = gt.astype(bool)
out["tgt_upload_ms"] = med(
    lambda: jax.block_until_ready(jnp.asarray(tgt_np)))

# (2) current full predict_select (compile first)
controller.predict_select(gt, pt, lbl)
out["predict_select_ms"] = med(lambda: controller.predict_select(gt, pt, lbl))

# (3) fused graph with PRE-UPLOADED device args, fetch everything once
entry = p._select_cache[(1, 3, p.original_size, p.input_size)]
fused = entry[0]
coords, labels = p._build_prompts(pt, lbl, None)
coords_d = jnp.asarray(coords)
labels_d = jnp.asarray(labels)
m_d = jnp.zeros((cfg.low_res, cfg.low_res), p.sam.dtype)
hm_d = jnp.asarray(False)
tgt_d = jnp.asarray(tgt_np)
jax.block_until_ready(tgt_d)


def fused_all_fetch():
    inter, union, packed, low = fused(p.params, feats, coords_d, labels_d,
                                      m_d, hm_d, tgt_d)
    jax.device_get((inter, union))
    np.asarray(packed[2])


out["fused_device_args_ms"] = med(fused_all_fetch)


# (4) dispatch + tiny fetch only (no packed fetch)
def fused_tiny_fetch():
    inter, union, packed, low = fused(p.params, feats, coords_d, labels_d,
                                      m_d, hm_d, tgt_d)
    jax.device_get((inter, union))


out["fused_no_packed_fetch_ms"] = med(fused_tiny_fetch)

# (5) packed mask fetch alone (pre-computed)
inter, union, packed, low = fused(p.params, feats, coords_d, labels_d,
                                  m_d, hm_d, tgt_d)
jax.block_until_ready(packed)
out["packed_fetch_ms"] = med(lambda: np.asarray(packed[2]))
out["low_fetch_ms"] = med(lambda: np.asarray(low[2]))

# (6) pure device decode time: chain N fused decodes through the logits
#     (real data dependency), one tiny fetch at the end
N = 10


def chain():
    mm = m_d
    hh = hm_d
    for _ in range(N):
        inter, union, packed, lw = fused(p.params, feats, coords_d,
                                         labels_d, mm, hh, tgt_d)
        mm = lw[2].astype(p.sam.dtype)
        hh = jnp.asarray(True)
    jax.device_get((inter, union))


chain()
out["decode_chain10_dep_ms"] = med(lambda: chain(), n=5)
out["decode_per_call_lower_bound_ms"] = round(
    out["decode_chain10_dep_ms"] / N, 2)

import json

print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                  for k, v in out.items()}, indent=1))
with open("/root/repo/experiments/r5_sam_profile.json", "w") as f:
    json.dump(out, f, indent=1)

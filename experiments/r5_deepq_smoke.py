"""Tiny-geometry CPU smoke of the round-5 deep_quality protocol:
K=2 episode, torch worker thread, per-interaction snapshots, fp32
cross-check.  Validates plumbing only (random weights, 48x64)."""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import bench
from eva_vos_tpu.models import PropagationNetwork, FusionNet
from eva_vos_tpu.engine import InferenceEngine
from eva_vos_tpu.engine.propagation import EngineConfig
from eva_vos_tpu.data import synthetic_video

t, h, w, top_k = 8, 48, 64, 8
images, masks = synthetic_video(t, h, w, num_objects=2, seed=3)

stcn = PropagationNetwork(top_k=top_k, dtype=jnp.float32)
fusion = FusionNet(dtype=jnp.float32)
frame0 = jnp.zeros((h, w, 3), jnp.float32)
mask0 = jnp.zeros((1, h, w), jnp.float32)
sp = stcn.init(jax.random.PRNGKey(0), frame0, mask0, method="init_all")
fp = fusion.init(jax.random.PRNGKey(1), frame0, jnp.zeros((h, w)),
                 jnp.zeros((h, w)), jnp.zeros((h, w, 2)), jnp.zeros((2,)))
sp_np = jax.tree.map(lambda x: np.asarray(x, np.float32), sp)
fp_np = jax.tree.map(lambda x: np.asarray(x, np.float32), fp)

cfg = EngineConfig(mem_freq=5, top_k=top_k, max_interactions=4,
                   feature_chunk=2)
engine = InferenceEngine(stcn, fusion, sp, fp, cfg)

out = bench.deep_quality(engine, images, masks, sp_np, fp_np,
                         interactions=(0, None, 3), top_k=top_k,
                         budget_s=600.0, fp32_xcheck=True)
print("deep_quality ->", out)
assert "deep_interactions" in out or "deep_quality_skipped" in out, out
assert out.get("deep_interactions") == 3, out
# random weights -> episode almost surely degenerate; plumbing fields only
print("OK")

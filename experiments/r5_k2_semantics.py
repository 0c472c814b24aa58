"""Diagnose K=2 semantics: my engine vs the imported reference
InferenceCore's scribble path, fp32, tiny geometry, probability-level."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch
import torchvision_stub

torchvision_stub.install()
sys.path.insert(0, "/root/reference")
import mivos.model.propagation.mod_resnet as mod_resnet

mod_resnet.model_zoo.load_url = lambda *a, **kw: {}
import contextlib

with contextlib.redirect_stdout(sys.stderr):
    import mivos.model.propagation.prop_net as prop_net
    import mivos.model.fusion_net as fusion_net
    import mivos.inference_core as inference_core

import jax.numpy as jnp

from eva_vos_tpu.models import PropagationNetwork, FusionNet
from eva_vos_tpu.engine import InferenceEngine
from eva_vos_tpu.engine.propagation import EngineConfig, pad_mask
from eva_vos_tpu.utils.weight_convert import convert_stcn, convert_fusion
from eva_vos_tpu.data import synthetic_video

t, h, w, top_k, K = 8, 48, 64, 8, 2
torch.manual_seed(0)
with contextlib.redirect_stdout(sys.stderr):
    tnet = prop_net.PropagationNetwork(top_k=top_k).eval()
tfuse = fusion_net.FusionNet().eval()


def sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


variables = jax.tree.map(jnp.asarray, convert_stcn(sd(tnet)))
fuse_vars = jax.tree.map(jnp.asarray, convert_fusion(sd(tfuse)))
stcn = PropagationNetwork(top_k=top_k, dtype=jnp.float32)
ffuse = FusionNet(dtype=jnp.float32)

images, gt = synthetic_video(t, h, w, num_objects=K, seed=3)
frames = jnp.asarray(images, jnp.float32)
images_t = torch.from_numpy(np.moveaxis(images, -1, 1).copy())[None]
core = inference_core.InferenceCore(tnet, tfuse, images_t,
                                    num_objects=K, device="cpu")

cfg = EngineConfig(mem_freq=5, top_k=top_k, max_interactions=4,
                   feature_chunk=2)
engine = InferenceEngine(stcn, ffuse, variables, fuse_vars, cfg)
feats = engine.precompute_features(frames)
state = engine.init_state(feats, K)

for idx in (0, t - 1, 3):
    m = gt[:, idx].astype(np.float32)  # [K, H, W]
    bg = np.clip(1.0 - m.sum(axis=0, keepdims=True), 0.0, 1.0)
    m_bg = np.concatenate([bg, m], axis=0)
    with torch.no_grad():
        core.interact(torch.from_numpy(m_bg)[:, None], idx, scribble=True)
    state = engine.interact(state, feats, pad_mask(m, (0, 0, 0, 0)), idx)
    ref_prob = core.prob.detach().numpy()[:, :, 0]   # [K+1, T, H, W]
    got_prob = np.asarray(state.prob)                # layout?
    print("idx", idx, "ref prob shape", ref_prob.shape,
          "engine prob shape", got_prob.shape)
    d = np.abs(got_prob - ref_prob)
    per_t = d.reshape(d.shape[0], d.shape[1], -1).max(axis=-1)
    print("  max|dprob| per (chan, frame):")
    for c in range(per_t.shape[0]):
        print("   chan", c, np.round(per_t[c], 4))

"""r5: diagnose the DEGENERATE K=2 deep-quality episode (bench run:
j_ref=0.0316 ~= |gt|/|frame| => torch side near-all-foreground;
j_jax=0.0 => jax side empty on every non-interacted frame; agreement
0.005).  Uses the disk-cached K=2 fitted weights and the warm compile
cache, prints per-interaction / per-side mask fill fractions and J.
"""
import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("EVAVOS_JAX_CACHE", "/root/repo/.jax_compile_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["EVAVOS_JAX_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np

import bench as bench_mod
from bench import _fit_cached, _round_to_dtype_host, fit_stcn_briefly, \
    fit_fusion_briefly
from eva_vos_tpu.models import PropagationNetwork, FusionNet
from eva_vos_tpu.engine import InferenceEngine
from eva_vos_tpu.engine.propagation import EngineConfig, prepare_video, \
    pad_mask
from eva_vos_tpu.data import synthetic_video
from eva_vos_tpu.ops.metrics import binary_jaccard

T, H, W = 60, 480, 854
DTYPE = jnp.bfloat16

images_q, masks_q = synthetic_video(T, H, W, num_objects=2, seed=0)
fit_key_q = (T, H, W, np.dtype(DTYPE).name, 2, 0)
stcn_q = jax.tree.map(
    lambda x: _round_to_dtype_host(x, DTYPE),
    _fit_cached("stcn", (*fit_key_q, fit_stcn_briefly),
                lambda: fit_stcn_briefly(images_q, masks_q)))
fusion_q = jax.tree.map(
    lambda x: _round_to_dtype_host(x, DTYPE),
    _fit_cached("fusion", (*fit_key_q, fit_fusion_briefly, fit_stcn_briefly),
                lambda: fit_fusion_briefly(images_q, masks_q, stcn_q)))
print("fitted K=2 weights loaded", flush=True)

images, gt = images_q[:30], masks_q[:, :30]
k_obj, t_frames = gt.shape[:2]
idxs = [0, 29, 10]

stcn = PropagationNetwork(key_arch="resnet50", value_arch="resnet18",
                          top_k=50, dtype=DTYPE)
fusion = FusionNet(dtype=DTYPE)
cfg = EngineConfig(mem_freq=5, top_k=50, max_interactions=60,
                   feature_chunk=2)
engine = InferenceEngine(
    stcn, fusion,
    jax.tree.map(lambda x: jnp.asarray(x, DTYPE), stcn_q),
    jax.tree.map(lambda x: jnp.asarray(x, DTYPE), fusion_q), cfg)

padded, pad = prepare_video(images, dtype=DTYPE)
feats = engine.precompute_features(padded)
state = engine.init_state(feats, k_obj)


def report(tag, masks_t):
    """masks_t [T, H, W] int labels."""
    fills = [float((masks_t[i] > 0).mean()) for i in range(t_frames)]
    js = []
    for i in range(t_frames):
        if i in idxs[:2]:
            continue
        for o in range(1, k_obj + 1):
            js.append(binary_jaccard(masks_t[i] == o, gt[o - 1, i] == 1))
    print(f"{tag}: J(rest)={np.mean(js):.4f} "
          f"fill min/med/max={min(fills):.4f}/"
          f"{sorted(fills)[len(fills)//2]:.4f}/{max(fills):.4f} "
          f"gt fill~{float((gt[0, 0] > 0).mean()) + float((gt[1, 0] > 0).mean()):.4f}",
          flush=True)


for n, idx in enumerate(idxs[:2]):
    m = gt[:, idx].astype(np.float32)
    state = engine.interact(state, feats, pad_mask(m, pad), idx)
    masks_t = engine.masks_from_prob(state.prob, pad)
    report(f"jax bf16 after interaction {n + 1} (frame {idx})",
           np.asarray(masks_t))

# ---- torch reference, 1 interaction, with per-frame fill ----
import threading


def torch_side():
    import contextlib

    import torch

    repo = os.path.dirname(os.path.abspath(bench_mod.__file__))
    for p in (os.path.join(repo, "tests"), repo):
        if p not in sys.path:
            sys.path.insert(0, p)
    import torchvision_stub

    torchvision_stub.install()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import mivos.model.propagation.mod_resnet as mod_resnet

    mod_resnet.model_zoo.load_url = lambda *a, **kw: {}
    import mivos.model.propagation.prop_net as prop_net
    import mivos.model.fusion_net as fusion_net
    import mivos.inference_core as inference_core

    from eva_vos_tpu.utils.weight_convert import invert_stcn, invert_fusion

    torch.set_num_threads(os.cpu_count() or 1)
    with contextlib.redirect_stdout(sys.stderr):
        tnet = prop_net.PropagationNetwork(top_k=50).eval()
    tfuse = fusion_net.FusionNet().eval()
    missing, _ = tnet.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in invert_stcn(stcn_q).items()}, strict=False)
    assert not missing, missing[:4]
    missing, _ = tfuse.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in invert_fusion(fusion_q).items()}, strict=False)
    assert not missing, missing[:4]

    images_t = torch.from_numpy(np.moveaxis(images, -1, 1).copy())[None]
    core = inference_core.InferenceCore(tnet, tfuse, images_t,
                                        num_objects=k_obj, device="cpu")
    for n, idx in enumerate(idxs[:1]):          # ONE interaction only
        m = gt[:, idx].astype(np.float32)
        bg = np.clip(1.0 - m.sum(axis=0, keepdims=True), 0.0, 1.0)
        m_bg = np.concatenate([bg, m], axis=0)
        t0 = time.perf_counter()
        with torch.no_grad():
            masks = core.interact(torch.from_numpy(m_bg)[:, None], idx,
                                  scribble=True)
        print(f"torch interaction {n + 1} took "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        report(f"torch fp32 after interaction {n + 1} (frame {idx})",
               np.asarray(masks))
        # raw prob inspection: what does the prob volume look like?
        prob = core.prob.cpu().numpy()  # [K+1?, T, 1, H, W]
        print(f"torch prob shape {prob.shape} "
              f"ch-means {[round(float(prob[c, 5].mean()), 4) for c in range(prob.shape[0])]}",
              flush=True)


torch_side()

"""Headline benchmark: STCN propagation throughput at 480p, single chip.

Matches BASELINE.md's flagship metric (config 2): space-time memory
propagation of a 480p single-object video — per-frame encode_key is
precomputed once per video (as the reference's key buffer amortizes it),
and the timed region is the full interact() pass: top-k memory attention,
decode, aggregation, and mem_freq memory admission over T-1 frames.

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
denominator is REFERENCE_GPU_FPS, a documented literature estimate for
STCN propagation on the reference's CUDA stack (~15 fps at 480p on a
V100-class GPU). Replace with a measured value when GPU hardware exists.

Usage:
    python bench.py           # full 480p benchmark on the default device
    python bench.py --quick   # tiny CPU smoke run (same code path)
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REFERENCE_GPU_FPS = 15.0


def quality_delta(dtype_name: str = "bf16"):
    """Matched-weights quality check tying the fps number to accuracy.

    Random-init the reference's torch PropagationNetwork+FusionNet
    (/root/reference, CPU fp32), convert the state dicts, and run the SAME
    multi-interaction episode through the reference InferenceCore and this
    engine at the benchmark's dtype + production readout strategy.  Reports
    the mean per-frame J (IoU vs synthetic gt) difference and the hard-mask
    agreement on non-interacted frames — the '10x at matched J&F' evidence
    at the bench's own numerics.  Returns {} when torch or /root/reference
    is unavailable.
    """
    try:
        import torch
    except ImportError:
        return {}
    if not Path("/root/reference").exists():
        return {}

    repo = Path(__file__).resolve().parent
    for p in (str(repo / "tests"), str(repo)):
        if p not in sys.path:
            sys.path.insert(0, p)
    import torchvision_stub

    torchvision_stub.install()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import contextlib

    import mivos.model.propagation.mod_resnet as mod_resnet

    mod_resnet.model_zoo.load_url = lambda *a, **kw: {}
    import mivos.model.propagation.prop_net as prop_net
    import mivos.model.fusion_net as fusion_net
    import mivos.inference_core as inference_core

    import jax
    import jax.numpy as jnp

    from eva_vos_tpu.models import PropagationNetwork, FusionNet
    from eva_vos_tpu.engine import InferenceEngine
    from eva_vos_tpu.engine.propagation import EngineConfig, pad_mask
    from eva_vos_tpu.utils.weight_convert import convert_stcn, convert_fusion
    from eva_vos_tpu.data import synthetic_video

    t_frames, h, w, top_k = 8, 48, 64, 8
    torch.manual_seed(0)
    with contextlib.redirect_stdout(sys.stderr):
        # the reference prints 'Not OK <key>' per pretrained key it cannot
        # fetch; keep stdout clean for the driver's JSON line
        tnet = prop_net.PropagationNetwork(top_k=top_k).eval()
    tfuse = fusion_net.FusionNet().eval()

    def sd(m):
        return {k: v.detach().numpy() for k, v in m.state_dict().items()}

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    variables = jax.tree.map(
        lambda x: jnp.asarray(x, dtype), convert_stcn(sd(tnet)))
    fuse_vars = jax.tree.map(
        lambda x: jnp.asarray(x, dtype), convert_fusion(sd(tfuse)))
    # batch stats stay fp32 (flax normalizes in param dtype internally)
    fnet = PropagationNetwork(top_k=top_k, dtype=dtype)
    ffuse = FusionNet(dtype=dtype)

    images, gt = synthetic_video(t_frames, h, w, num_objects=1, seed=3)
    frames = jnp.asarray(images, jnp.float32)

    images_t = torch.from_numpy(
        np.moveaxis(images, -1, 1).copy())[None]  # [1, T, 3, H, W]
    core = inference_core.InferenceCore(tnet, tfuse, images_t,
                                        num_objects=1, device="cpu")

    cfg = EngineConfig(mem_freq=5, top_k=top_k, max_interactions=4,
                       feature_chunk=2)
    engine = InferenceEngine(fnet, ffuse, variables, fuse_vars, cfg)
    feats = engine.precompute_features(frames.astype(dtype))
    state = engine.init_state(feats, 1)

    interacted = []
    for idx in (0, t_frames - 1, 3):
        m = gt[:, idx].astype(np.float32)  # [1, H, W]
        with torch.no_grad():
            ref_masks = core.interact(torch.from_numpy(m)[:, None], idx)
        state = engine.interact(state, feats,
                                pad_mask(m, (0, 0, 0, 0)), idx)
        interacted.append(idx)

    got_masks = engine.masks_from_prob(state.prob, (0, 0, 0, 0))
    rest = [t for t in range(t_frames) if t not in interacted]

    def mean_j(masks):
        js = []
        for t in rest:
            inter = np.logical_and(masks[t] == 1, gt[0, t] == 1).sum()
            union = np.logical_or(masks[t] == 1, gt[0, t] == 1).sum()
            js.append(inter / union if union else 1.0)
        return float(np.mean(js))

    j_ref = mean_j(ref_masks)
    j_got = mean_j(got_masks)
    agreement = float((got_masks[rest] == ref_masks[rest]).mean())
    return {
        "j_delta_vs_torch_reference": round(j_got - j_ref, 5),
        "j_torch_reference": round(j_ref, 5),
        "j_this_framework": round(j_got, 5),
        "mask_agreement_vs_torch": round(agreement, 5),
        "readout_strategy": engine.config.readout_strategy,
    }


def run(quick: bool = False):
    import jax
    import jax.numpy as jnp

    if quick:
        jax.config.update("jax_platforms", "cpu")

    from eva_vos_tpu.models import PropagationNetwork, FusionNet
    from eva_vos_tpu.engine import InferenceEngine
    from eva_vos_tpu.engine.propagation import (EngineConfig, prepare_video,
                                                pad_mask)
    from eva_vos_tpu.data import synthetic_video

    if quick:
        t, h, w = 4, 48, 64
        key_arch, value_arch, top_k = "resnet18", "resnet18", 8
        dtype = jnp.float32
        iters = 1
    else:
        t, h, w = 30, 480, 854
        key_arch, value_arch, top_k = "resnet50", "resnet18", 50
        dtype = jnp.bfloat16
        iters = 3

    stcn = PropagationNetwork(key_arch=key_arch, value_arch=value_arch,
                              top_k=top_k, dtype=dtype)
    fusion = FusionNet(dtype=dtype)
    # init at the padded (multiple-of-16) geometry the engine runs at
    ph = h + (-h) % 16
    pw = w + (-w) % 16
    frame0 = jnp.zeros((ph, pw, 3), dtype)
    mask0 = jnp.zeros((1, ph, pw), dtype)
    sp = stcn.init(jax.random.PRNGKey(0), frame0, mask0, method="init_all")
    fp = fusion.init(jax.random.PRNGKey(1), frame0, mask0[0], mask0[0],
                     jnp.zeros((ph, pw, 2), dtype), jnp.zeros((2,), dtype))

    cfg = EngineConfig(mem_freq=5, top_k=top_k, max_interactions=4,
                       feature_chunk=2)
    engine = InferenceEngine(stcn, fusion, sp, fp, cfg)
    import sys

    strat = engine.config.readout_strategy
    probe = "passed" if strat.startswith("pallas") else "not used"
    print(f"[bench] readout strategy: {strat} (pallas kernel probe {probe})",
          file=sys.stderr)

    images, masks = synthetic_video(t, h, w, num_objects=1, seed=0)
    padded, pad = prepare_video(images, dtype=dtype)
    feats = engine.precompute_features(padded)
    jax.block_until_ready(feats.k16)

    state0 = engine.init_state(feats, 1)
    m0 = pad_mask(masks[:, 0].astype(np.float32), pad).astype(jnp.float32)

    # warm-up (compile)
    out = engine.interact(state0, feats, m0, 0)
    jax.block_until_ready(out.prob)

    start = time.perf_counter()
    for _ in range(iters):
        out = engine.interact(state0, feats, m0, 0)
        jax.block_until_ready(out.prob)
    elapsed = time.perf_counter() - start

    frames = (t - 1) * iters
    fps = frames / elapsed
    result = {
        "metric": "stcn_propagation_fps_480p" if not quick
                  else "stcn_propagation_fps_quick",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / REFERENCE_GPU_FPS, 3),
    }
    # tie throughput to quality: matched-weights episode vs the imported
    # torch reference at this bench's dtype + readout strategy
    try:
        result.update(quality_delta("f32" if quick else "bf16"))
    except Exception as e:  # a missing oracle must never sink the bench
        print(f"[bench] quality_delta skipped: {e!r}", file=sys.stderr)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    run(quick=args.quick)

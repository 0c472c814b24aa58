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

# Perf-history regression gate (VERDICT r3 #7): every full run appends its
# headline numbers here; a headline >REGRESSION_TOL below the best recorded
# prints a loud warning so silent regressions (e.g. r2 186.0 -> r3 179.7)
# are caught and explained rather than discovered a round later.
BENCH_HISTORY = Path(__file__).resolve().parent / "BENCH_HISTORY.jsonl"
REGRESSION_TOL = 0.07


def _is_transient(e: Exception) -> bool:
    """The axon tunnel's remote-compile helper drops the pipe or reports
    UNAVAILABLE intermittently on big programs; both are retry-safe."""
    s = str(e)
    return "remote_compile" in s or "UNAVAILABLE" in s


def record_history(result: dict):
    """Append this run's headline to BENCH_HISTORY.jsonl and warn loudly if
    it regressed >REGRESSION_TOL below the best recorded value."""
    entry = {
        "ts": time.time(),
        "value": result.get("value"),
        "mfu": result.get("mfu"),
        "interactive_tail_fps_honest":
            result.get("interactive_tail_fps_honest"),
        "interactive_tail_fps_60round":
            result.get("interactive_tail_fps_60round"),
        "device": result.get("device"),
    }
    best = None
    try:
        if BENCH_HISTORY.exists():
            for line in BENCH_HISTORY.read_text().splitlines():
                if not line.strip():
                    continue
                try:
                    v = json.loads(line).get("value")
                except ValueError:
                    continue
                if v is not None and (best is None or v > best):
                    best = v
        with BENCH_HISTORY.open("a") as f:
            f.write(json.dumps(entry) + "\n")
    except OSError as e:
        print(f"[bench] history append failed: {e!r}", file=sys.stderr)
    if best is not None and entry["value"] is not None \
            and entry["value"] < best * (1 - REGRESSION_TOL):
        msg = (f"REGRESSION: headline {entry['value']} is "
               f"{(1 - entry['value'] / best) * 100:.1f}% below the best "
               f"recorded {best} (tolerance {REGRESSION_TOL * 100:.0f}%)")
        print(f"[bench] *** {msg} ***", file=sys.stderr)
        result["regression_warning"] = msg
    if best is not None:
        result["best_recorded_fps"] = best

# bf16 peak FLOP/s by device generation (for the aggregate MFU field);
# conservative public numbers, fp32 ~= peak/4 on these parts.
PEAK_BF16_FLOPS = {
    "TPU v2": 45e12, "TPU v3": 123e12, "TPU v4": 275e12,
    "TPU v5 lite": 197e12, "TPU v5": 459e12, "TPU v6": 918e12,
}


def device_peak_flops():
    import jax

    kind = jax.devices()[0].device_kind
    # match longest prefix first ('TPU v5 lite' before 'TPU v5')
    for prefix in sorted(PEAK_BF16_FLOPS, key=len, reverse=True):
        if kind.startswith(prefix):
            return PEAK_BF16_FLOPS[prefix], kind
    return None, kind


def executable_flops(jitted, *args, **kwargs):
    """Analytic FLOP count of a jitted fn via XLA cost analysis (None when
    the backend does not expose it)."""
    try:
        analysis = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis["flops"])
    except Exception:
        return None


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


def fit_stcn_briefly(steps: int = 150, t: int = 6, h: int = 160, w: int = 160,
                     seed: int = 5):
    """Briefly fit the flax PropagationNetwork on a synthetic video (fp32)
    so the quality check runs at a mid-range J (VERDICT r2: random init
    yields near-empty masks and a degenerate j_delta).

    The loss is one-shot propagation: memorize frame 0's gt mask, then
    decode every other frame from the memory readout and take BCE against
    its gt.  Convs are resolution-agnostic, so a fit at 160x160 transfers
    to the 480p evaluation.  Returns fp32 PropagationNetwork variables.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from eva_vos_tpu.models import PropagationNetwork
    from eva_vos_tpu.ops.memory_attention import memory_readout
    from eva_vos_tpu.ops.normalize import im_normalize
    from eva_vos_tpu.data import synthetic_video

    stcn = PropagationNetwork(top_k=50, dtype=jnp.float32)
    images, gt = synthetic_video(t, h, w, num_objects=1, seed=seed)
    frames = im_normalize(jnp.asarray(images, jnp.float32))  # [T, H, W, 3]
    gt = jnp.asarray(gt[0], jnp.float32)                     # [T, H, W]

    variables = stcn.init(jax.random.PRNGKey(0), frames[0], gt[0][None],
                          method="init_all")
    params, stats = variables["params"], variables.get("batch_stats", {})
    opt = optax.adam(3e-4)
    opt_state = opt.init(params)

    def loss_fn(params):
        v = {"params": params, "batch_stats": stats}
        feats = jax.lax.map(
            lambda fr: stcn.apply(v, fr, method="encode_key"), frames)
        hw16 = feats.k16.shape[1] * feats.k16.shape[2]
        k16 = feats.k16.reshape(t, hw16, -1)
        v0 = stcn.apply(v, frames[0], feats.f16[0], gt[0][None],
                        method="encode_value")         # [1, h16, w16, CV]
        mv = v0.reshape(1, hw16, -1)

        def seg(i):
            ro = memory_readout(k16[0], k16[i], mv, top_k=min(50, hw16),
                                strategy="scatter")
            ro = ro.reshape(1, *feats.f16_thin.shape[1:3], -1)
            prob = stcn.apply(v, ro, feats.f16_thin[i], feats.f8[i],
                              feats.f4[i], method="decode_with_readout")
            return prob[0]                             # [H, W]

        # lax.map: ONE traced seg branch regardless of t (unrolled branches
        # would multiply the tunnel compile time)
        probs = jax.lax.map(seg, jnp.arange(1, t))
        tgt = gt[1:]
        eps = 1e-6
        bce = -(tgt * jnp.log(probs + eps)
                + (1 - tgt) * jnp.log(1 - probs + eps))
        return jnp.mean(bce)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)
    print(f"[bench] stcn brief fit: final bce {float(loss):.4f}",
          file=sys.stderr)
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return jax.tree.map(lambda x: np.asarray(x, np.float32), out)


def deep_quality(engine, feats, images, gt, pad, stcn_fp32_vars,
                 fusion_fp32_vars, interactions=(0, None, 10),
                 top_k: int = 50):
    """Production-geometry quality parity: the SAME fitted weights through
    the torch reference InferenceCore (CPU fp32) and this engine (bf16 +
    production readout) on the SAME 480p episode; reports per-frame J and
    J&F deltas (VERDICT r2 #2).  Reuses the engine's already-compiled
    interact — no extra 480p compiles.

    Reference protocol: ``eval_annotation_method.py:30,49-64`` (480p,
    J&F), defaults ``prop_net.py:141`` (top_k=50, mem_freq=5).
    """
    try:
        import torch
    except ImportError:
        return {}
    if not Path("/root/reference").exists():
        return {}
    import contextlib

    repo = Path(__file__).resolve().parent
    for p in (str(repo / "tests"), str(repo)):
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

    import jax
    import jax.numpy as jnp

    from eva_vos_tpu.engine.propagation import pad_mask
    from eva_vos_tpu.ops.metrics import binary_jaccard, get_j_and_f
    from eva_vos_tpu.utils.weight_convert import invert_stcn, invert_fusion

    t_frames = images.shape[0]
    idxs = [t_frames - 1 if i is None else i for i in interactions]

    import os

    torch.set_num_threads(os.cpu_count() or 1)
    with contextlib.redirect_stdout(sys.stderr):
        tnet = prop_net.PropagationNetwork(top_k=top_k).eval()
    tfuse = fusion_net.FusionNet().eval()
    missing, _ = tnet.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in invert_stcn(stcn_fp32_vars).items()}, strict=False)
    assert not missing, f"inverse stcn export missed keys: {missing[:4]}"
    missing, _ = tfuse.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in invert_fusion(fusion_fp32_vars).items()}, strict=False)
    assert not missing, f"inverse fusion export missed keys: {missing[:4]}"

    images_t = torch.from_numpy(np.moveaxis(images, -1, 1).copy())[None]
    core = inference_core.InferenceCore(tnet, tfuse, images_t,
                                        num_objects=1, device="cpu")

    state = engine.init_state(feats, 1)
    ref_masks = None
    t0 = time.perf_counter()
    # wall-clock budget: the torch reference walks ~160 frame
    # segmentations on CPU (~1.6 s/frame encode alone on a 1-core box);
    # if the box is slow, keep whatever prefix of the episode completed —
    # one interaction is still full propagation parity at 480p
    budget = float(os.environ.get("EVAVOS_DEEP_BUDGET_S", "1500"))
    done = []
    for idx in idxs:
        m = gt[:, idx].astype(np.float32)          # [1, H, W]
        with torch.no_grad():
            ref_masks = core.interact(torch.from_numpy(m)[:, None], idx)
        state = engine.interact(state, feats, pad_mask(m, pad), idx)
        done.append(idx)
        if time.perf_counter() - t0 > budget and len(done) < len(idxs):
            print(f"[bench] deep-quality budget hit after {len(done)} "
                  f"interactions", file=sys.stderr)
            break
    idxs = done
    jax.block_until_ready(state.prob)
    print(f"[bench] deep-quality episode ({len(idxs)} interactions, "
          f"T={t_frames}) ran in {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)

    got_masks = engine.masks_from_prob(state.prob, pad)
    rest = [i for i in range(t_frames) if i not in idxs]

    def metrics(masks):
        js, jfs = [], []
        for i in rest:
            js.append(binary_jaccard(masks[i] == 1, gt[0, i] == 1))
            jfs.append(get_j_and_f(gt[0, i] == 1, masks[i] == 1))
        return float(np.mean(js)), float(np.mean(jfs))

    j_ref, jf_ref = metrics(np.asarray(ref_masks))
    j_got, jf_got = metrics(got_masks)
    agreement = float((got_masks[rest] == np.asarray(ref_masks)[rest]).mean())
    out = {
        "prod_geometry": f"{images.shape[1]}x{images.shape[2]}"
                         f"_T{t_frames}_topk50_memfreq5_bf16",
        "deep_interactions": len(idxs),
    }
    # Parity claims are only meaningful when the reference actually
    # segments the episode (VERDICT r3 #1: an all-empty-vs-all-empty match
    # is background agreement, not quality parity).  Gate on a mid-range
    # reference J before emitting the parity fields.
    if 0.2 <= j_ref <= 0.98:
        out.update({
            "quality_parity": "ok",
            "j_and_f_delta": round(jf_got - jf_ref, 5),
            "j_and_f_torch_reference": round(jf_ref, 5),
            "j_and_f_this_framework": round(jf_got, 5),
            "j_delta_prod": round(j_got - j_ref, 5),
            "j_torch_reference_prod": round(j_ref, 5),
            "mask_agreement_prod": round(agreement, 5),
        })
    else:
        print(f"[bench] *** DEGENERATE quality episode: reference "
              f"J={j_ref:.4f} outside [0.2, 0.98] — parity fields "
              f"withheld ***", file=sys.stderr)
        out.update({
            "quality_parity": f"DEGENERATE(j_ref={round(j_ref, 5)})",
            "degenerate_j_torch_reference": round(j_ref, 5),
            "degenerate_j_this_framework": round(j_got, 5),
            "degenerate_mask_agreement": round(agreement, 5),
        })
    return out


def run(quick: bool = False):
    import os

    import jax
    import jax.numpy as jnp

    if quick:
        jax.config.update("jax_platforms", "cpu")
    else:
        # persistent compile cache: the 480p interact graph takes tens of
        # minutes to compile through the axon tunnel; repeat bench runs on
        # the same box (including the driver's end-of-round run) reuse it
        cache_dir = os.environ.get("EVAVOS_JAX_CACHE",
                                   "/tmp/evavos_xla_cache")
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 10)
        except Exception:
            pass

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
        # ONE engine/geometry serves the fresh-bank headline, the 72-slot
        # interactive session, AND the deep-quality episode (one compile)
        t, h, w = 60, 480, 854
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
    fp32_stcn = None
    fp32_fusion = None
    if not quick:
        # briefly-fitted weights: the SAME weights drive the headline
        # timing, the engine's quality episode, and (exported through the
        # inverse converter) the torch reference episode — so the quality
        # tie-in is measured at a mid-range J, not a degenerate ~0
        try:
            fp32_stcn = fit_stcn_briefly()
            # cast to the bench dtype (matching r2's converted-checkpoint
            # treatment — the torch side keeps the fp32 originals)
            sp = jax.tree.map(lambda x: jnp.asarray(x, dtype), fp32_stcn)
        except Exception as e:
            print(f"[bench] brief fit failed ({e!r}); random init",
                  file=sys.stderr)
            fp32_stcn = None
    if fp32_stcn is None:
        sp = stcn.init(jax.random.PRNGKey(0), frame0, mask0,
                       method="init_all")
    fp32_fusion_init = FusionNet(dtype=jnp.float32).init(
        jax.random.PRNGKey(1), jnp.zeros((ph, pw, 3), jnp.float32),
        jnp.zeros((ph, pw), jnp.float32), jnp.zeros((ph, pw), jnp.float32),
        jnp.zeros((ph, pw, 2), jnp.float32), jnp.zeros((2,), jnp.float32))
    fp32_fusion = jax.tree.map(lambda x: np.asarray(x, np.float32),
                               fp32_fusion_init)
    fp = jax.tree.map(lambda x: jnp.asarray(x, dtype), fp32_fusion)

    cfg = EngineConfig(mem_freq=5, top_k=top_k,
                       max_interactions=4 if quick else 60,
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

    # warm-up (compile).  The axon tunnel's remote-compile helper drops the
    # pipe intermittently on big 480p programs — that is transient, so
    # retry the SAME config (the persistent cache makes retries cheap)
    # before concluding the production kernels cannot compile and falling
    # back to the XLA scatter readout.
    last_exc = None
    for attempt in range(4):
        try:
            out = engine.interact(state0, feats, m0, 0)
            jax.block_until_ready(out.prob)
            break
        except Exception as e:
            if quick:
                raise
            last_exc = e
            transient = _is_transient(e)
            print(f"[bench] interact compile attempt {attempt + 1} failed "
                  f"({type(e).__name__}{'/transient' if transient else ''})",
                  file=sys.stderr)
            if not transient and attempt >= 1:
                print("[bench] falling back to XLA scatter readout",
                      file=sys.stderr)
                cfg = cfg._replace(readout_strategy="scatter")
                engine = InferenceEngine(stcn, fusion, sp, fp, cfg)
                state0 = engine.init_state(feats, 1)
            time.sleep(20)
    else:
        raise last_exc

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

    if not quick:
        # aggregate MFU from XLA's own FLOP count of the compiled interact
        # (the .lower().compile() hits the persistent cache enabled above)
        try:
            peak, kind = device_peak_flops()
            flops = executable_flops(engine._interact_jit, state0, feats, m0,
                                     jnp.asarray(0, jnp.int32))
            if flops and peak:
                result["mfu"] = round(flops * iters / elapsed / peak, 4)
                result["interact_tflops"] = round(flops / 1e12, 3)
                result["device"] = kind
        except Exception as e:  # accounting must never sink the headline
            print(f"[bench] mfu accounting skipped: {e!r}", file=sys.stderr)
            result["mfu_skipped"] = repr(e)

    if not quick:
        # interactive big-bank session (the regime EVA-VOS actually runs):
        # spread interactions like an annotation session; honest metric =
        # frames the passes actually propagate / wall time
        rounds = 10
        order = [0, t - 1] + list(range(2, t - 1,
                                        max(1, t // rounds)))[:rounds - 2]
        try:
            state = engine.init_state(feats, 1)
            interacted = set()
            total_frames = 0
            tstart = None
            # device-resident masks: per-round host->device mask uploads
            # are not part of the propagation work being measured (real
            # sessions produce SAM masks on device)
            masks_dev = pad_mask(masks.astype(np.float32), pad)
            jax.block_until_ready(masks_dev)
            tail_frames = tail_time = 0.0
            for r, idx in enumerate(order[:rounds]):
                fwd = min((i for i in interacted if i > idx), default=t)
                bwd = max((i for i in interacted if i < idx), default=-1)
                n_frames = max(0, fwd - idx - 1) + max(0, idx - bwd - 1)
                interacted.add(idx)
                m = masks_dev[:, idx]
                rt0 = time.perf_counter()
                for attempt in range(3):
                    # the donated interact is a distinct executable; its
                    # first call can hit the same transient tunnel-compile
                    # failures as the headline (r3_engine_bisect logs)
                    try:
                        state2 = engine.interact(state, feats, m, idx,
                                                 donate=True)
                        jax.block_until_ready(state2.prob)
                        state = state2
                        break
                    except Exception as e:
                        if r > 0 or attempt == 2 or not _is_transient(e):
                            raise
                        print(f"[bench] interactive compile attempt "
                              f"{attempt + 1} failed (transient: {e!r}); "
                              f"retrying", file=sys.stderr)
                        # the failed call may have consumed the donated
                        # buffers — rebuild the round-0 inputs so the retry
                        # does not trip 'Array has been deleted'
                        state = engine.init_state(feats, 1)
                        time.sleep(20)
                        rt0 = time.perf_counter()
                if r == 0:
                    tstart = time.perf_counter()
                else:
                    total_frames += n_frames
                    if r >= rounds // 2:
                        tail_frames += n_frames
                        tail_time += time.perf_counter() - rt0
            ielapsed = time.perf_counter() - tstart
            result["interactive_fps_72slot_honest"] = round(
                total_frames / ielapsed, 2)
            result["interactive_rounds_per_sec"] = round(
                (rounds - 1) / ielapsed, 3)
            if tail_time:
                # steady-state: the session's second half (warmer bank,
                # fewer frames per round — the regime where fixed per-round
                # cost and bank-fill-dependent selection show up)
                result["interactive_tail_fps_honest"] = round(
                    tail_frames / tail_time, 2)
        except Exception as e:  # never sink the already-computed headline
            print(f"[bench] interactive session skipped: {e!r}",
                  file=sys.stderr)
            result["interactive_skipped"] = repr(e)

        # production-geometry quality: same fitted weights through the
        # torch reference (CPU fp32) and this engine (bf16 + production
        # readout) on this very episode geometry
        if fp32_stcn is not None:
            try:
                result.update(deep_quality(
                    engine, feats, images, masks, pad, fp32_stcn,
                    fp32_fusion, interactions=(0, None, 20)))
            except Exception as e:
                print(f"[bench] deep_quality skipped: {e!r}",
                      file=sys.stderr)
                result["deep_quality_skipped"] = repr(e)
    else:
        # tiny matched-weights episode vs the imported torch reference at
        # the quick profile's numerics
        try:
            result.update(quality_delta("f32"))
        except Exception as e:  # a missing oracle must never sink the bench
            print(f"[bench] quality_delta skipped: {e!r}", file=sys.stderr)
    if not quick:
        record_history(result)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    run(quick=args.quick)

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
        "interactive_tail_fps_60round_T120":
            result.get("interactive_tail_fps_60round_T120"),
        "eva_vos_rounds_per_sec": result.get("eva_vos_rounds_per_sec"),
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


def executable_flops(jitted, *args, errors: list = None, **kwargs):
    """Analytic FLOP count of a jitted fn via XLA cost analysis.

    Prefers ``Lowered.cost_analysis()`` (local, no remote compile — conv/
    matmul FLOPs are identical to the post-compile figure) so the MFU model
    does not pay, or transiently fail on, extra tunnel compiles (the r4
    full run lost its ``mfu`` field to exactly that, silently).  Failures
    are appended to ``errors`` so the caller can record WHY a field is
    missing instead of dropping it."""
    try:
        lowered = jitted.lower(*args, **kwargs)
    except Exception as e:
        if errors is not None:
            errors.append(f"lower: {e!r}")
        return None
    for attempt in range(3):
        for stage in ("lowered", "compiled"):
            try:
                analysis = (lowered.cost_analysis() if stage == "lowered"
                            else lowered.compile().cost_analysis())
                if isinstance(analysis, (list, tuple)):
                    analysis = analysis[0]
                return float(analysis["flops"])
            except Exception as e:
                if errors is not None:
                    errors.append(f"{stage}: {e!r}")
                transient = stage == "compiled" and _is_transient(e)
        if not transient:
            break
        time.sleep(15)  # tunnel-compile flake; the lowering is reusable
    return None


def executed_interact_flops(engine, feats, idx: int = 0):
    """Executed-FLOP model of one ``interact(state0, feats, mask, 0)``.

    XLA's ``cost_analysis`` counts a ``fori_loop`` body ONCE regardless of
    trip count (verified: a 10-iteration matmul loop reports 1 matmul), so
    dividing it by wall time — the r1-r3 ``mfu`` fields — undercounts the
    aggregate MFU ~3-4x at T=60 (the interact walks ~11 blocked + 4 tail
    steps).  This model counts what actually executes:

      n_blocks * F(block decode) + n_tail * F(frame decode)
      + n_admissions * F(encode_value)                 [cost_analysis, exact]
      + per-step attention work                        [analytic]

    where attention = 2*N*M_live*CK (affinity dot) + 2*N*top_k*CV (readout
    useful work) — added only on the pallas path (cost_analysis sees pallas
    custom calls as 0 FLOPs; the XLA scatter path is already counted).
    Escalation/tournament overhead and skipped-block savings are not
    modeled; the attention figure is the useful-work lower bound.
    """
    import jax
    import jax.numpy as jnp

    t, hw, ck = feats.k16.shape
    cfg = engine.config
    bsz = cfg.mem_freq
    n_steps = t - 1 - idx
    n_blocks = n_steps // bsz
    n_tail = n_steps - n_blocks * bsz
    cv = getattr(engine.stcn, "value_dim", 512)
    state = engine.init_state(feats, 1)
    front = jnp.asarray(1, jnp.int32)

    # feats MUST be a jit argument, not a closure: closed-over device arrays
    # are baked into the MLIR as literal constants, and the ~100 MB request
    # body overflows the remote-compile tunnel (r4_bench_full2: HTTP 413 +
    # broken pipes on exactly these sub-graphs)
    errors = []
    f_block = executable_flops(
        jax.jit(lambda fts, bk, bv, tis: engine._segment_frames_batched(
            fts, bk, bv, front, tis)),
        feats, state.bank_k, state.bank_v,
        jnp.arange(bsz, dtype=jnp.int32), errors=errors)
    f_tail = executable_flops(
        jax.jit(lambda fts, bk, bv, ti: engine._segment_frame(
            fts, bk, bv, front, ti)),
        feats, state.bank_k, state.bank_v, jnp.asarray(1, jnp.int32),
        errors=errors) if n_tail else 0.0
    f_ev = executable_flops(
        jax.jit(lambda fts, m: engine._encode_value(
            fts, jnp.asarray(0, jnp.int32), m)),
        feats, jnp.zeros((1, *feats.images.shape[1:3]), jnp.float32),
        errors=errors)
    if f_block is None or f_ev is None or f_tail is None:
        raise RuntimeError(f"sub-graph cost analysis failed: {errors}")

    # admission schedule: one per full block unless its last frame is the
    # pass end (idx=0 forward pass: end frame t-1 is never a block's last
    # frame unless t-1-idx is a block boundary)
    end = t - 1
    n_adm = sum(1 for b in range(n_blocks)
                if idx + 1 + b * bsz + (bsz - 1) != end)
    top_k = min(cfg.top_k, state.bank_k.shape[0] * hw)

    f_attn = 0.0
    if engine.config.readout_strategy.startswith("pallas"):
        for b in range(n_blocks):
            n_q = bsz * hw
            m_live = (1 + b) * hw   # certain slot + b admissions so far
            f_attn += 2.0 * n_q * m_live * ck + 2.0 * n_q * top_k * cv
        for _ in range(n_tail):
            m_live = (1 + n_adm) * hw
            f_attn += 2.0 * hw * m_live * ck + 2.0 * hw * top_k * cv

    total = (n_blocks * f_block + n_tail * f_tail + n_adm * f_ev + f_attn)
    return {
        "total": total,
        "detail": {
            "n_blocks": n_blocks, "n_tail": n_tail, "n_admissions": n_adm,
            "block_decode_tflops": round(n_blocks * f_block / 1e12, 3),
            "tail_decode_tflops": round(n_tail * f_tail / 1e12, 3),
            "encode_value_tflops": round(n_adm * f_ev / 1e12, 3),
            "attention_tflops": round(f_attn / 1e12, 3),
        },
    }


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


FIT_CACHE_VERSION = 1


def _fit_cache_file(tag: str, key_parts) -> Path:
    """Disk-cache path for briefly-fitted bench weights.

    The brief fits are deterministic in (synthetic video, hyperparams,
    fit-code version) but cost hundreds of seconds of 480p training +
    compiles per bench run — the single biggest reason BENCH_r04/r05
    captures ran out of driver budget before reaching the interactive /
    SAM / quality sections.  Caching the fitted fp32 weights on disk makes
    repeat runs (including the driver's end-of-round capture on this same
    box) skip the fit entirely.  The key hashes the fit function's source
    so a fit-code change invalidates stale weights automatically.
    """
    import hashlib
    import inspect

    h = hashlib.sha1()
    h.update(f"v{FIT_CACHE_VERSION}".encode())
    for part in key_parts:
        if callable(part):
            try:
                h.update(inspect.getsource(part).encode())
            except OSError:
                h.update(part.__qualname__.encode())
        else:
            h.update(repr(part).encode())
    d = Path(__file__).resolve().parent / ".bench_cache"
    try:
        d.mkdir(exist_ok=True)
    except OSError:
        d = Path("/tmp/evavos_fit_cache")
        d.mkdir(exist_ok=True)
    return d / f"{tag}_{h.hexdigest()[:16]}.pkl"


def _fit_cached(tag: str, key_parts, fit_fn):
    """Load fitted weights from the disk cache or run ``fit_fn`` and save."""
    import pickle

    path = _fit_cache_file(tag, key_parts)
    if path.exists():
        try:
            with path.open("rb") as f:
                out = pickle.load(f)
            print(f"[bench] {tag} fit loaded from cache {path.name}",
                  file=sys.stderr)
            return out
        except Exception as e:
            print(f"[bench] {tag} fit cache unreadable ({e!r}); refitting",
                  file=sys.stderr)
    out = fit_fn()
    try:
        with path.open("wb") as f:
            pickle.dump(out, f, protocol=4)
    except OSError as e:
        print(f"[bench] {tag} fit cache write failed: {e!r}",
              file=sys.stderr)
    return out


def _round_to_dtype_host(x, dtype):
    """Round an fp32 host array through ``dtype`` and back, on host.

    Bit-identical to ``np.asarray(jnp.asarray(x, dtype), np.float32)``
    (both are round-to-nearest-even) but never touches the device — the
    device round-trip cost ~800 s over the axon tunnel for the full STCN
    weight tree (r5 bench run3 "fit" section).
    """
    import ml_dtypes

    np_dtype = {"bfloat16": ml_dtypes.bfloat16,
                "float16": np.float16,
                "float32": np.float32}[np.dtype(dtype).name]
    return np.asarray(np.asarray(x, np.float32).astype(np_dtype),
                      np.float32)


def fit_stcn_briefly(images01, gt_masks, steps: int = 300, lr: float = 1e-3,
                     pos_w: float = 4.0, n_frames: int = 8,
                     j_target: float = 0.5):
    """Briefly fit the flax PropagationNetwork ON THE BENCH VIDEO at
    production geometry (fp32) so the quality check runs at a mid-range J.

    r3's fit (160x160, probability-space BCE) never actually converged —
    the decoder's sigmoid saturates and BCE-on-probabilities has zero
    gradient through a saturated sigmoid, freezing the loss
    (experiments/r4_fit_transfer*.py: BCE stuck at 1.92, J = 0.0 even on
    the fit geometry).  This fit (a) trains at the episode's own 480p
    geometry on a stride-8 frame subset of the bench video, (b) uses
    logit-space positive-weighted sigmoid BCE (gradient sigmoid(x) - y,
    never zero), and (c) EARLY-STOPS on the MEASURED one-shot J (an aux
    output of the loss, free) reaching ``j_target`` — the r4_bench_full1
    lesson: a bce threshold (0.02) can stop with positives sitting at
    p~=0.5, which thresholds to EMPTY masks (recorded J 0.0) even though
    the loss looks converged.  Stopping at J>=0.65 lands the reference
    episode mid-range, inside the [0.2, 0.98] degeneracy gate with margin
    (the earlier 0.75 target stopped at one-shot J 0.879 and the fused
    episode measured j_ref 0.976 — 0.004 under the gate ceiling,
    r4_bench_full4; full convergence measures one-shot J 0.978,
    r4_fit_transfer3.json).
    The weights are synthetic-video-specific by design: the deep-quality
    check measures ENGINE parity at a useful quality level, not model
    generality.  Returns fp32 PropagationNetwork variables.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from eva_vos_tpu.models import PropagationNetwork
    from eva_vos_tpu.ops.memory_attention import memory_readout
    from eva_vos_tpu.ops.normalize import im_normalize
    from eva_vos_tpu.ops.padding import compute_pad, pad_hw

    stcn = PropagationNetwork(top_k=50, dtype=jnp.float32)
    t_all, h, w = images01.shape[:3]
    stride = max(1, t_all // n_frames)
    sel = list(range(0, t_all, stride))[:n_frames]
    pad = compute_pad(h, w, 16)
    frames = pad_hw(im_normalize(jnp.asarray(images01[sel], jnp.float32)),
                    pad, h_axis=1, w_axis=2)
    gt = pad_hw(jnp.asarray(gt_masks[0][sel], jnp.float32), pad,
                h_axis=-2, w_axis=-1)
    t = len(sel)

    variables = stcn.init(jax.random.PRNGKey(0), frames[0], gt[0][None],
                          method="init_all")
    params, stats = variables["params"], variables.get("batch_stats", {})
    opt = optax.adam(lr)
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
            logit = stcn.apply(v, ro, feats.f16_thin[i], feats.f8[i],
                               feats.f4[i], method="decode_with_readout",
                               return_logits=True)
            return logit[0]                            # [H, W]

        # lax.map: ONE traced seg branch regardless of t (unrolled branches
        # would multiply the tunnel compile time)
        logits = jax.lax.map(seg, jnp.arange(1, t))
        tgt = gt[1:]
        bce = -(pos_w * tgt * jax.nn.log_sigmoid(logits)
                + (1 - tgt) * jax.nn.log_sigmoid(-logits))
        # aux: the MEASURED one-shot J at threshold (logit>0 == prob>0.5,
        # exactly how masks_from_prob binarizes a single object)
        pred = logits > 0
        pos = tgt > 0.5
        inter = jnp.sum(pred & pos, axis=(-2, -1)).astype(jnp.float32)
        union = jnp.sum(pred | pos, axis=(-2, -1)).astype(jnp.float32)
        j = jnp.mean(inter / jnp.maximum(union, 1.0))
        return jnp.mean(bce), j

    @jax.jit
    def step(params, opt_state):
        (loss, j), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, j

    loss = j = None
    for i in range(steps):
        params, opt_state, loss, j = step(params, opt_state)
        # early stop on the PREVIOUS step's metrics (device round-trip once
        # every 5 steps — a 10-step cadence overshot the target by ~0.2 J,
        # r4_bench_full4's j_ref landed 0.004 under the gate ceiling)
        if i % 5 == 4 and float(j) >= j_target:
            break
    print(f"[bench] stcn brief fit: {i + 1} steps, final bce "
          f"{float(loss):.4f}, one-shot J {float(j):.3f}", file=sys.stderr)
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return jax.tree.map(lambda x: np.asarray(x, np.float32), out)


def fit_fusion_briefly(images01, gt_masks, stcn_vars, steps: int = 300,
                       lr: float = 1e-3, pos_w: float = 4.0,
                       n_frames: int = 8, j_target: float = 0.8):
    """Briefly fit the FusionNet on REAL fusion tuples from the fitted STCN.

    A random-init FusionNet emits logits ~= -1 everywhere (sigmoid ~0.27),
    so the first multi-pass fuse wipes every in-between frame to empty —
    the r4_bench_full2 degeneracy: one-shot J 0.879 after the STCN fit, yet
    episode J 0.0 in BOTH stacks after the 2nd/3rd interaction (the fusion
    runs with the same exported weights on the torch side,
    ``inference_core.py:193-207``).

    Training tuples mirror the episode's second interaction: ``prev`` =
    one-shot propagation from frame 0, ``curr`` = from the last frame,
    attention maps from ``get_attention`` at the second interaction's mask
    diff, distance scalars per ``_fuse_frame``.  Only fusion params train;
    the STCN stays frozen.  Returns fp32 FusionNet variables.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from eva_vos_tpu.models import PropagationNetwork, FusionNet
    from eva_vos_tpu.ops.memory_attention import memory_readout
    from eva_vos_tpu.ops.normalize import im_normalize
    from eva_vos_tpu.ops.padding import compute_pad, pad_hw

    stcn = PropagationNetwork(top_k=50, dtype=jnp.float32)
    sv = jax.tree.map(jnp.asarray, stcn_vars)
    t_all, h, w = images01.shape[:3]
    stride = max(1, t_all // n_frames)
    sel = list(range(0, t_all, stride))[:n_frames]
    pad = compute_pad(h, w, 16)
    frames = pad_hw(im_normalize(jnp.asarray(images01[sel], jnp.float32)),
                    pad, h_axis=1, w_axis=2)
    gt = pad_hw(jnp.asarray(gt_masks[0][sel], jnp.float32), pad,
                h_axis=-2, w_axis=-1)
    t = len(sel)
    last = t - 1

    # sv/frames/gt must be jit ARGUMENTS: closed-over device arrays become
    # MLIR literal constants and the request body overflows the
    # remote-compile tunnel (HTTP 413, r4_bench_full3 first attempt)
    @jax.jit
    def gen_tuples(sv, frames, gt):
        feats = jax.lax.map(
            lambda fr: stcn.apply(sv, fr, method="encode_key"), frames)
        h16, w16 = feats.k16.shape[1:3]
        hw16 = h16 * w16
        k16 = feats.k16.reshape(t, hw16, -1)

        def one_shot(anchor):
            mv = stcn.apply(sv, frames[anchor], feats.f16[anchor],
                            gt[anchor][None],
                            method="encode_value").reshape(1, hw16, -1)

            def seg(i):
                ro = memory_readout(k16[anchor], k16[i], mv,
                                    top_k=min(50, hw16), strategy="scatter")
                ro = ro.reshape(1, h16, w16, -1)
                logit = stcn.apply(sv, ro, feats.f16_thin[i], feats.f8[i],
                                   feats.f4[i],
                                   method="decode_with_readout",
                                   return_logits=True)
                return jax.nn.sigmoid(logit[0])        # [H, W] prob

            return jax.lax.map(seg, jnp.arange(t))     # [t, H, W]

        prev = one_shot(0)                             # from frame 0
        curr = one_shot(last)                          # from the last frame

        # the second interaction's mask diff (inference_core.py:222-224)
        diff = gt[last] - prev[last]
        pos_diff = jnp.clip(diff, 0.0, 1.0)[None]
        neg_diff = jnp.clip(-diff, 0.0, 1.0)[None]

        def attn_of(i):
            return stcn.apply(sv, feats.k16[last], pos_diff, neg_diff,
                              feats.k16[i], method="get_attention")[0]

        attn = jax.lax.map(attn_of, jnp.arange(t))     # [t, H, W, 2]
        return prev, curr, attn

    prev, curr, attn = gen_tuples(sv, frames, gt)
    # distance scalars per _fuse_frame: tc = last interaction, tr = 0
    tc, tr = float(sel[last]), float(sel[0])
    tis = jnp.asarray([float(sel[i]) for i in range(t)], jnp.float32)
    denom = abs(tc - tr)
    dist = jnp.stack([jnp.abs(tc - tis) / denom,
                      jnp.abs(tr - tis) / denom], axis=-1)  # [t, 2]

    mid = jnp.asarray([i for i in range(t) if i not in (0, last)])
    fusion = FusionNet(dtype=jnp.float32)
    fv = fusion.init(jax.random.PRNGKey(2), frames[0], prev[0], curr[0],
                     attn[0], dist[0])
    pf = fv["params"]
    opt = optax.adam(lr)
    opt_state = opt.init(pf)

    def loss_fn(pf, batch):
        b_im, b_prev, b_curr, b_attn, b_dist, tgt = batch

        def fuse(i):
            return fusion.apply({"params": pf}, b_im[i], b_prev[i],
                                b_curr[i], b_attn[i], b_dist[i])

        logits = jax.lax.map(fuse, jnp.arange(b_im.shape[0]))
        bce = -(pos_w * tgt * jax.nn.log_sigmoid(logits)
                + (1 - tgt) * jax.nn.log_sigmoid(-logits))
        pred = logits > 0
        pos = tgt > 0.5
        inter = jnp.sum(pred & pos, axis=(-2, -1)).astype(jnp.float32)
        union = jnp.sum(pred | pos, axis=(-2, -1)).astype(jnp.float32)
        j = jnp.mean(inter / jnp.maximum(union, 1.0))
        return jnp.mean(bce), j

    @jax.jit
    def step(pf, opt_state, batch):
        (loss, j), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(pf, batch)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(pf, updates), opt_state, loss, j

    batch = (frames[mid], prev[mid], curr[mid], attn[mid], dist[mid],
             gt[mid])
    loss = j = None
    for i in range(steps):
        pf, opt_state, loss, j = step(pf, opt_state, batch)
        if i % 10 == 9 and float(j) >= j_target:
            break
    print(f"[bench] fusion brief fit: {i + 1} steps, final bce "
          f"{float(loss):.4f}, fused J {float(j):.3f}", file=sys.stderr)
    return jax.tree.map(lambda x: np.asarray(x, np.float32),
                        {"params": pf})


def deep_quality(engine, images, gt, stcn_fp32_vars, fusion_fp32_vars,
                 interactions=(0, None, 10), top_k: int = 50,
                 budget_s: float = 600.0, fp32_xcheck: bool = True):
    """Production-geometry quality parity: BIT-IDENTICAL fitted weights
    (bf16-rounded once in run()) through the torch reference InferenceCore
    (CPU, fp32 compute) and this engine on the SAME 480p episode.

    Round-5 protocol (VERDICT r4 #4): the episode runs at **K=2 objects**
    (fusion + aggregate exercised at production geometry, not just the
    48x64 unit test) on a T=30 slice of the bench video, and the JAX side
    is evaluated in BOTH precisions — the production bf16 engine AND an
    fp32 engine on the same bit-identical weights.  The fp32 delta is the
    direction control: the weights are fitted in JAX, so a systematic
    fit-side advantage would show up in fp32-vs-fp32 too; if
    ``j_and_f_delta_fp32`` ~ 0, the bf16 delta is precision numerics, not
    stack bias.

    The torch episode runs in a daemon worker thread so its CPU time
    overlaps the JAX engines' (tunnel-bound, host-idle) compiles; each
    side records per-interaction mask snapshots and the comparison uses
    the longest prefix both completed within ``budget_s``.

    Reference protocol: ``eval_annotation_method.py:30,49-64`` (480p,
    J&F), defaults ``prop_net.py:141`` (top_k=50, mem_freq=5); multi-pass
    fusion path ``inference_core.py:184-207``.
    """
    try:
        import torch
    except ImportError:
        return {}
    if not Path("/root/reference").exists():
        return {}
    import contextlib
    import os
    import threading

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

    from eva_vos_tpu.models import PropagationNetwork, FusionNet
    from eva_vos_tpu.engine import InferenceEngine
    from eva_vos_tpu.engine.propagation import pad_mask, prepare_video
    from eva_vos_tpu.ops.metrics import binary_jaccard, get_j_and_f
    from eva_vos_tpu.utils.weight_convert import invert_stcn, invert_fusion

    k_obj, t_frames = gt.shape[:2]
    idxs = [t_frames - 1 if i is None else i for i in interactions]
    t0 = time.perf_counter()

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
                                        num_objects=k_obj, device="cpu")

    # torch episode in a worker thread: the ~100 CPU frame segmentations
    # overlap the JAX engines' compiles below (remote through the tunnel —
    # the main thread mostly waits on the network).  Per-interaction mask
    # snapshots let the comparison use whatever prefix the budget allowed.
    ref = {"snaps": [], "error": None}

    def torch_episode():
        try:
            for n, idx in enumerate(idxs):
                m = gt[:, idx].astype(np.float32)      # [K, H, W]
                with torch.no_grad():
                    if k_obj == 1:
                        # the reference policy loops' own call shape
                        # (interactions/mask.py:26 — [k, 1, H, W], no
                        # background channel)
                        masks = core.interact(
                            torch.from_numpy(m)[:, None], idx)
                    else:
                        # multi-object: interact()'s non-scribble path is
                        # K=1-only (mask_diff [K] vs prob [K+1] broadcasts
                        # only when K==1; encode_value would bank K+1
                        # values vs K admissions).  The internally
                        # consistent multi-object entry is the scribble
                        # path — background-included mask, values encoded
                        # from mask[1:] (inference_core.py:209-240)
                        bg = np.clip(1.0 - m.sum(axis=0, keepdims=True),
                                     0.0, 1.0)
                        m_bg = np.concatenate([bg, m], axis=0)
                        masks = core.interact(
                            torch.from_numpy(m_bg)[:, None], idx,
                            scribble=True)
                ref["snaps"].append(np.asarray(masks))
                if (time.perf_counter() - t0 > budget_s
                        and n + 1 < len(idxs)):
                    print(f"[bench] deep-quality torch budget hit after "
                          f"{n + 1} interactions", file=sys.stderr)
                    return
        except Exception as e:  # surfaced by the main thread
            ref["error"] = repr(e)

    th = threading.Thread(target=torch_episode, daemon=True)
    th.start()

    def jax_episode(eng, feats, pad):
        snaps = []
        state = eng.init_state(feats, k_obj)
        for idx in idxs:
            m = gt[:, idx].astype(np.float32)
            state = eng.interact(state, feats, pad_mask(m, pad), idx)
            snaps.append(eng.masks_from_prob(state.prob, pad))
        return snaps

    dtype = engine.stcn.dtype
    dtype_str = jnp.dtype(dtype).name.replace("bfloat16", "bf16").replace(
        "float32", "fp32")
    padded, pad = prepare_video(images, dtype=dtype)
    feats = engine.precompute_features(padded)
    got_snaps = jax_episode(engine, feats, pad)
    print(f"[bench] deep-quality bf16 K={k_obj} episode done at "
          f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)

    fp32_snaps = None
    if fp32_xcheck:
        try:
            stcn32 = PropagationNetwork(
                key_arch=engine.stcn.key_arch,
                value_arch=engine.stcn.value_arch,
                top_k=top_k, dtype=jnp.float32)
            fuse32 = FusionNet(dtype=jnp.float32)
            sp32 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                                stcn_fp32_vars)
            fp32_vars = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                                     fusion_fp32_vars)
            eng32 = InferenceEngine(stcn32, fuse32, sp32, fp32_vars,
                                    engine.config)
            padded32, pad32 = prepare_video(images, dtype=jnp.float32)
            feats32 = eng32.precompute_features(padded32)
            fp32_snaps = jax_episode(eng32, feats32, pad32)
            print(f"[bench] deep-quality fp32 cross-check episode done at "
                  f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)
        except Exception as e:
            print(f"[bench] fp32 cross-check skipped: {e!r}",
                  file=sys.stderr)

    th.join(timeout=max(30.0, budget_s - (time.perf_counter() - t0)))
    if ref["error"]:
        print(f"[bench] torch episode failed: {ref['error']}",
              file=sys.stderr)
        return {"deep_quality_skipped": ref["error"]}
    n_done = len(ref["snaps"])
    if th.is_alive():
        print(f"[bench] torch episode still running at budget; comparing "
              f"the {n_done}-interaction prefix", file=sys.stderr)
    if n_done == 0:
        return {"deep_quality_skipped": "torch episode completed 0 "
                                        "interactions within budget"}
    done = idxs[:n_done]
    ref_masks = ref["snaps"][n_done - 1]
    got_masks = got_snaps[n_done - 1]
    print(f"[bench] deep-quality episode ({n_done} interactions, "
          f"T={t_frames}, K={k_obj}) ran in "
          f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)

    rest = [i for i in range(t_frames) if i not in done]

    def metrics(masks):
        js, jfs = [], []
        for i in rest:
            for o in range(1, k_obj + 1):
                js.append(binary_jaccard(masks[i] == o, gt[o - 1, i] == 1))
                jfs.append(get_j_and_f(gt[o - 1, i] == 1, masks[i] == o))
        return float(np.mean(js)), float(np.mean(jfs))

    j_ref, jf_ref = metrics(np.asarray(ref_masks))
    j_got, jf_got = metrics(got_masks)
    agreement = float(
        (got_masks[rest] == np.asarray(ref_masks)[rest]).mean())
    out = {
        "prod_geometry": f"{images.shape[1]}x{images.shape[2]}"
                         f"_T{t_frames}_K{k_obj}_topk{top_k}_memfreq5"
                         f"_{dtype_str}",
        "deep_interactions": n_done,
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
        if fp32_snaps is not None:
            j32, jf32 = metrics(fp32_snaps[n_done - 1])
            out["j_and_f_delta_fp32"] = round(jf32 - jf_ref, 5)
            out["j_delta_fp32"] = round(j32 - j_ref, 5)
            out["mask_agreement_fp32"] = round(float(
                (fp32_snaps[n_done - 1][rest]
                 == np.asarray(ref_masks)[rest]).mean()), 5)
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


def build_jax_sam(preset: str = "vit_h", dtype_name: str = "bf16"):
    """Random-weight JAX SAM predictor + controller (geometry is what the
    SAM bench measures; production loads converted official weights)."""
    import jax.numpy as jnp

    from eva_vos_tpu.models.sam import build_sam
    from eva_vos_tpu.models.sam.predictor import SamPredictor, SAMController

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    sam, params = build_sam(preset, dtype=dtype)
    predictor = SamPredictor(sam, params)
    return SAMController(predictor)


def sam_bench(controller, h: int = 480, w: int = 854, iters: int = 5):
    """SAM-path TPU timings (VERDICT r3 #2): (a) ViT-H 1024^2 image encode
    ms/frame, (b) the reference's warm-start decode chain — middle click +
    up to 20 refinement rounds (``annotator/annotator.py:60-107``) + a
    3-click annotation round — measured end-to-end through the Annotator.

    Random weights keep SAM's outputs below the warm-start IoU threshold,
    so the chain runs its full 21+ decode budget: the numbers are the
    WORST-CASE chain cost.  Returns {} on failure (the bench must never
    sink the headline)."""
    import jax

    import numpy as np

    from eva_vos_tpu.annotator import Annotator
    from eva_vos_tpu.data import synthetic_video
    from eva_vos_tpu.ops.normalize import im_normalize

    images, gt = synthetic_video(4, h, w, num_objects=1, seed=7)
    frame = np.asarray(im_normalize(images[1]))
    gt_mask = gt[0, 1].astype(np.float32)
    # a plausibly-wrong propagated mask: the same object shifted
    pred = np.roll(gt[0, 1], (12, 20), axis=(0, 1)).astype(np.float32)

    annotator = Annotator(controller)

    out = {}
    # (a) encode: first call compiles, then steady-state ms/frame
    t0 = time.perf_counter()
    annotator.set_image_to_sam(frame)
    print(f"[bench] sam encode first call (compile) "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(iters):
        controller.reset_image()
        t0 = time.perf_counter()
        annotator.set_image_to_sam(frame)
        jax.block_until_ready(controller.predictor.features)
        times.append(time.perf_counter() - t0)
    out["sam_encode_ms"] = round(float(np.median(times)) * 1e3, 2)

    # (b) decode chain: warm-start (middle click + <=20 refinements) + one
    # 3-click annotation round, exactly the per-round SAM work of a 'click'
    # action.  First full chain compiles the decode; time the second.
    for rep in range(2):
        annotator.clear_sam_cache()
        t0 = time.perf_counter()
        sam_mask, cost, iou, logits, clicks, labels, bbox = \
            annotator.get_mask(
                annotation_type="click", num_prompts=3, gt_mask=gt_mask,
                im=frame, mivos_mask=pred.astype(bool), cache_key=1)
        chain_s = time.perf_counter() - t0
        if rep == 0:
            print(f"[bench] sam decode chain first run (compile) "
                  f"{chain_s:.1f}s", file=sys.stderr)
    out["sam_decode_chain_ms"] = round(chain_s * 1e3, 2)

    # (b2) per-decode DEVICE cost: the fused warm start runs its worst-case
    # 21 sequential decodes (random weights never reach the IoU stop) in
    # ONE dispatch, so chain_time / 21 isolates decode compute from the
    # ~31 ms tunnel RTT that dominates any per-call number here
    # (experiments/r5_sam_profile.json rtt_trivial_dispatch_fetch_ms)
    try:
        pred_dev = controller.predictor
        controller.set_image(frame)
        for rep in range(2):
            t0 = time.perf_counter()
            pred_dev.warmstart_select(pred, threshold=0.8, max_tries=20)
            warm_s = time.perf_counter() - t0
        out["sam_warmstart_chain_ms"] = round(warm_s * 1e3, 2)
        out["sam_decode_device_ms"] = round(warm_s * 1e3 / 21, 2)
    except Exception as e:
        print(f"[bench] warmstart device timing skipped: {e!r}",
              file=sys.stderr)

    # (c) single fused decode+select call (the chain's unit step): the call
    # returns host ious + one bit-packed mask, so it is synced by
    # construction — per-call time = dispatch RTT + decode + upscale +
    # select + packed-mask fetch
    mid = np.argwhere(gt_mask > 0)
    pt = mid.mean(axis=0)[::-1][None, :]            # [1, 2] (x, y)
    lbl = np.ones((1,), np.int32)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        controller.predict_select(gt_mask, pt, lbl)
        times.append(time.perf_counter() - t0)
    out["sam_decode_ms"] = round(float(np.median(times)) * 1e3, 2)

    # (c2) the environment's host-sync floor: ONE trivial dispatch + 4-byte
    # fetch through the axon tunnel.  Any host-synced call — including (c)
    # — pays at least this; the production loops avoid it by chaining
    # decodes device-side (warmstart_select, single dispatch), which is
    # what (b2) measures.  Recorded so sam_decode_ms is read as
    # "RTT floor + decode", not as decode compute.
    import jax.numpy as jnp
    one = jnp.zeros((), jnp.int32)
    add = jax.jit(lambda x: x + 1)
    jax.block_until_ready(add(one))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.device_get(add(one))
        times.append(time.perf_counter() - t0)
    out["sam_host_rtt_floor_ms"] = round(float(np.median(times)) * 1e3, 2)
    return out


def eva_vos_round_rate(engine, images01, gt, controller, rounds: int = 6):
    """(c) of VERDICT r3 #2: full eva_vos policy rounds/sec with the JAX
    SAM in the loop — QNet frame selection + RL-agent type selection +
    annotator (warm-start chain) + propagation, on the bench video."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eva_vos_tpu.annotator import Annotator
    from eva_vos_tpu.data.datasets import VideoSample
    from eva_vos_tpu.interactions.multiple import eva_vos
    from eva_vos_tpu.models.qnet import QualityNet
    from eva_vos_tpu.models.rl_agent import ActorCritic

    qnet = QualityNet(merge_strategy="cat", arch="resnet18", n_labels=20)
    qv = qnet.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 224, 224, 3)))

    @jax.jit
    def qnet_extract(imgs, masks):
        return qnet.apply(qv, imgs, masks, method="extract_features")

    scfg = controller.predictor.cfg
    emb_shape = (1, scfg.grid, scfg.grid, scfg.prompt_embed_dim)
    rl = ActorCritic(out_dim=2, arch="resnet18", dropout=0.0)
    rv = rl.init(jax.random.PRNGKey(1), jnp.zeros(emb_shape),
                 jnp.zeros((1, 224, 224, 3)))

    @jax.jit
    def rl_fwd(emb, mask):
        return rl.apply(rv, emb, mask)

    calls = [0]

    def rl_act(emb, mask224):
        # the value comes from the real (random-weight) ActorCritic forward;
        # the ACTION alternates 3clicks/mask so the measured round rate
        # covers both annotation paths (a random net's argmax is constant,
        # which would silently drop the SAM click chain from the timing)
        _, value = rl_fwd(jnp.asarray(emb), jnp.asarray(mask224))
        calls[0] += 1
        return calls[0] % 2, float(value.squeeze())

    # uint8 storage: the per-video upload is 1 byte/px (the reference's
    # own pipeline loads uint8 PNGs), and initialize()'s feature cache
    # makes the repeated eva_vos calls below skip re-upload + re-encode
    # entirely (VERDICT r4 #6)
    img_u8 = (np.clip(images01, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    sample = VideoSample(name="bench__1", images01=img_u8, gt=gt)
    annotator = Annotator(controller)

    # warm-up: compile the QNet / agent forwards at the loop's real shapes
    # so the timed section measures the round rate, not tunnel compiles
    t = images01.shape[0]
    jax.block_until_ready(qnet_extract(jnp.zeros((t, 224, 224, 3)),
                                       jnp.zeros((t, 224, 224, 3))))
    jax.block_until_ready(rl_fwd(jnp.zeros(emb_shape),
                                 jnp.zeros((1, 224, 224, 3))))
    # untimed policy rounds covering BOTH action paths: round 1 is the gt
    # bootstrap, rounds 2-3 hit 'mask' and '3clicks' through the alternating
    # chooser — so the click path's first-use graphs (per-frame ViT-H encode
    # wrapper, warm-start chain, fused click rounds, mask->224 resize)
    # compile OUTSIDE the timed window.  The r5 run that warmed only one
    # round recorded 0.253 rounds/sec because the first timed 3clicks round
    # carried ~10 s of these compiles.
    t0 = time.perf_counter()
    eva_vos(qnet_extract, rl_act, 3, engine, sample, annotator,
            annotation_types=("3clicks", "mask"), eval_metric="j")
    print(f"[bench] eva_vos warm-up rounds (compiles) "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # MARGINAL round rate: every eva_vos call pays a per-VIDEO setup inside
    # the loop (initialize() re-uploads the video + recomputes features,
    # frames_to_224) — ~80 s at 480p/T=60 through the tunnel
    # (experiments/r4_evavos_profile.json: rounds 4-6 cost 1.2 s (mask) /
    # 4.3 s (worst-case 3clicks chain) while r4_bench_full4 recorded
    # 28.8 s/round).  Timing rounds=1 and rounds=1+N and dividing the
    # difference isolates the N marginal policy rounds from the setup.
    calls[0] = 0
    t0 = time.perf_counter()
    eva_vos(qnet_extract, rl_act, 1, engine, sample, annotator,
            annotation_types=("3clicks", "mask"), eval_metric="j")
    setup_s = time.perf_counter() - t0
    calls[0] = 0
    t0 = time.perf_counter()
    mu, times, values, actions, metrics, frames = eva_vos(
        qnet_extract, rl_act, 1 + rounds, engine, sample, annotator,
        annotation_types=("3clicks", "mask"), eval_metric="j")
    elapsed = time.perf_counter() - t0
    n_rounds = len(mu) - 1
    marginal_s = max(elapsed - setup_s, 1e-9)
    print(f"[bench] eva_vos 1+{n_rounds} rounds in {elapsed:.1f}s "
          f"(setup+round1 {setup_s:.1f}s, actions {actions})",
          file=sys.stderr)
    return {
        "eva_vos_rounds_per_sec": round(n_rounds / marginal_s, 3),
        "eva_vos_rounds_timed": n_rounds,
        "eva_vos_setup_plus_round1_s": round(setup_s, 2),
    }


def _window_session(engine, feats, masks_dev, t, rounds, edges=None):
    """Farthest-point interactive session with WINDOW-based timing.

    Timing discipline: block_until_ready on DONATED outputs can return
    before execution completes through the axon tunnel (r4_bench_full1
    recorded 0.5 ms "rounds" for ~300 ms of device work;
    experiments/r4_sync_probe.py).  Within a window the rounds chain
    through the donated state — a real data dependency, so device
    execution is serial — and ONE 4-byte certain_count fetch per window
    edge amortizes the tunnel RTT instead of inflating every round.
    Round 0 (compile of the donated variant) is excluded and retried on
    transient tunnel failures.

    Returns (windows, span): windows = [(start_round, end_round, frames,
    seconds)], span(a, b) -> (frames, seconds) over rounds [a, b).
    """
    import jax
    import time as _time

    order = [0, t - 1]
    while len(order) < rounds:
        s = sorted(order)
        gaps = [(s[i + 1] - s[i], s[i]) for i in range(len(s) - 1)]
        g, lo = max(gaps)
        if g <= 1:
            break
        order.append(lo + g // 2)

    if edges is None:
        edges = sorted({5, 10, max(11, rounds // 2), rounds})
    edges = [e for e in edges if e <= rounds]

    state = engine.init_state(feats, 1)
    interacted = set()
    windows = []  # (start_round, end_round, frames, seconds)
    wstart, wframes = 1, 0
    t0 = None
    for r, idx in enumerate(order[:rounds]):
        fwd = min((i for i in interacted if i > idx), default=t)
        bwd = max((i for i in interacted if i < idx), default=-1)
        n_frames = max(0, fwd - idx - 1) + max(0, idx - bwd - 1)
        interacted.add(idx)
        m = masks_dev[:, idx]
        if r == 0:
            for attempt in range(3):
                try:
                    state = engine.interact(state, feats, m, idx,
                                            donate=True)
                    jax.device_get(state.certain_count)
                    break
                except Exception as e:
                    if attempt == 2 or not _is_transient(e):
                        raise
                    print(f"[bench] interactive compile attempt "
                          f"{attempt + 1} failed (transient: "
                          f"{e!r}); retrying", file=sys.stderr)
                    # the failed call may have consumed the donated
                    # buffers — rebuild the round-0 inputs so the
                    # retry does not trip 'Array has been deleted'
                    state = engine.init_state(feats, 1)
                    interacted = {idx}
                    time.sleep(20)
            t0 = _time.perf_counter()
            continue
        state = engine.interact(state, feats, m, idx, donate=True)
        wframes += n_frames
        if (r + 1) in edges or r == rounds - 1:
            jax.device_get(state.certain_count)  # true sync
            now = _time.perf_counter()
            windows.append((wstart, r + 1, wframes, now - t0))
            wstart, wframes, t0 = r + 1, 0, now

    def span(a, b):  # (frames, seconds) over rounds [a, b)
        fr = sum(w[2] for w in windows if w[0] >= a and w[1] <= b)
        sec = sum(w[3] for w in windows if w[0] >= a and w[1] <= b)
        return fr, sec

    return windows, span


def run(quick: bool = False):
    import os

    import jax
    import jax.numpy as jnp

    # Survivable capture (VERDICT r4 #1: BENCH_r04 was rc 124 / parsed null
    # because bench.py printed its JSON only at the very end and the driver
    # window closed inside the last section).  Three defenses:
    #   1. a GLOBAL wall-clock budget (EVAVOS_BENCH_BUDGET_S, default well
    #      under the driver window) — sections are gated on remaining time
    #      and skipped gracefully, so the process exits rc 0;
    #   2. the cumulative result JSON is PRINTED (and written to
    #      BENCH_PARTIAL.json) after every section, so even a hard kill
    #      leaves the last complete snapshot on stdout;
    #   3. sections run cheapest-evidence-first (headline -> MFU ->
    #      interactive -> T120 -> SAM -> eva_vos -> deep quality).
    t_run0 = time.perf_counter()
    budget_s = float(os.environ.get("EVAVOS_BENCH_BUDGET_S", "1600"))

    def remaining():
        return budget_s - (time.perf_counter() - t_run0)

    # per-section wall-time accounting: lands in result["section_s"] so a
    # budget overrun is diagnosable from the capture itself
    section_s = {}
    _last_mark = [t_run0]

    def mark(name):
        now = time.perf_counter()
        section_s[name] = round(now - _last_mark[0], 1)
        _last_mark[0] = now

    partial_path = Path(__file__).resolve().parent / "BENCH_PARTIAL.json"

    def emit(result):
        try:
            partial_path.write_text(json.dumps(result, indent=1) + "\n")
        except OSError as e:
            print(f"[bench] partial write failed: {e!r}", file=sys.stderr)
        print(json.dumps(result), flush=True)

    if quick:
        jax.config.update("jax_platforms", "cpu")
    else:
        # persistent compile cache: the 480p interact graph takes tens of
        # minutes to compile through the axon tunnel; repeat bench runs on
        # the same box (including the driver's end-of-round run) reuse it
        # repo-local by default: /tmp is wiped on reboot, and the driver's
        # end-of-round capture must hit the cache this session warmed even
        # if the box bounced in between (r4/r5 cold-capture lesson)
        cache_dir = os.environ.get(
            "EVAVOS_JAX_CACHE",
            str(Path(__file__).resolve().parent / ".jax_compile_cache"))
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
    # K=1 video for the headline/interactive/T120/SAM/eva_vos sections —
    # the SAME protocol r1-r4 measured (the r5 run1-4 captures ran these
    # sections on a K=2-distractor video, which alone moved the headline
    # 186 -> 172-176: selection-kernel work is data-dependent, so the
    # scene change conflated protocol with regression).  The deep-quality
    # episode (VERDICT r4 #4) builds its OWN K=2 video + fitted weights
    # in its section below.
    images, masks = synthetic_video(t, h, w, num_objects=1, seed=0)
    if not quick:
        print(f"[bench] setup to synthetic_video: "
              f"{time.perf_counter() - t_run0:.1f}s", file=sys.stderr)
    fp32_stcn = None
    fp32_fusion = None
    if not quick:
        # briefly-fitted weights (ON this very video, at its geometry —
        # the r3 small-geometry fit never converged, r4_fit_transfer*):
        # the SAME weights drive the headline timing, the engine's quality
        # episode, and (exported through the inverse converter) the torch
        # reference episode — so the quality tie-in is measured at a
        # mid-range J, not a degenerate ~0
        try:
            fit_key = (t, h, w, np.dtype(dtype).name, 1, 0)  # geom, K, seed
            fp32_stcn = _fit_cached(
                "stcn", (*fit_key, fit_stcn_briefly),
                lambda: fit_stcn_briefly(images, masks))
            # round the fitted weights to the bench dtype ONCE and hand the
            # SAME (bit-identical, bf16-representable) values to both
            # stacks: the torch reference upcasts them to fp32, this engine
            # casts them to bf16 losslessly.  r4_bench_full4 ran the torch
            # side on the unrounded fp32 originals, so its j_and_f_delta
            # (+0.0155) conflated weight precision with engine numerics.
            # Rounding happens ON HOST (ml_dtypes bf16 == XLA's RN-even
            # cast, asserted in tests/test_bench_helpers.py): the old
            # jnp round-trip moved every weight tensor up AND down the
            # ~13 MB/s tunnel — ~800 s of the r5 run3 "fit" span.
            fp32_stcn = jax.tree.map(
                lambda x: _round_to_dtype_host(x, dtype), fp32_stcn)
            sp = jax.tree.map(lambda x: jnp.asarray(x, dtype), fp32_stcn)
        except Exception as e:
            print(f"[bench] brief fit failed ({e!r}); random init",
                  file=sys.stderr)
            fp32_stcn = None
    if fp32_stcn is None:
        sp = stcn.init(jax.random.PRNGKey(0), frame0, mask0,
                       method="init_all")
    fp32_fusion = None
    if not quick and fp32_stcn is not None:
        # fusion must also be fitted: a random-init FusionNet outputs
        # logit ~ -1 everywhere and the 2nd/3rd interaction's fuse wipes
        # the episode to empty masks in BOTH stacks (r4_bench_full2)
        try:
            fp32_fusion = _fit_cached(
                "fusion", (*fit_key, fit_fusion_briefly, fit_stcn_briefly),
                lambda: fit_fusion_briefly(images, masks, fp32_stcn))
            # same bit-identical-weights treatment as the STCN above
            fp32_fusion = jax.tree.map(
                lambda x: _round_to_dtype_host(x, dtype), fp32_fusion)
        except Exception as e:
            print(f"[bench] fusion brief fit failed ({e!r}); random init",
                  file=sys.stderr)
            fp32_fusion = None
    if fp32_fusion is None:
        fp32_fusion_init = FusionNet(dtype=jnp.float32).init(
            jax.random.PRNGKey(1), jnp.zeros((ph, pw, 3), jnp.float32),
            jnp.zeros((ph, pw), jnp.float32),
            jnp.zeros((ph, pw), jnp.float32),
            jnp.zeros((ph, pw, 2), jnp.float32),
            jnp.zeros((2,), jnp.float32))
        fp32_fusion = jax.tree.map(lambda x: np.asarray(x, np.float32),
                                   fp32_fusion_init)
    fp = jax.tree.map(lambda x: jnp.asarray(x, dtype), fp32_fusion)

    mark("fit")
    if not quick:
        print(f"[bench] fit section: {section_s['fit']:.1f}s",
              file=sys.stderr)

    cfg = EngineConfig(mem_freq=5, top_k=top_k,
                       max_interactions=4 if quick else 60,
                       feature_chunk=2)
    engine = InferenceEngine(stcn, fusion, sp, fp, cfg)
    strat = engine.config.readout_strategy
    probe = "passed" if strat.startswith("pallas") else "not used"
    print(f"[bench] readout strategy: {strat} (pallas kernel probe {probe})",
          file=sys.stderr)

    padded, pad = prepare_video(images, dtype=dtype)
    feats = engine.precompute_features(padded)
    jax.block_until_ready(feats.k16)

    state0 = engine.init_state(feats, 1)
    m0 = pad_mask(masks[:1, 0].astype(np.float32), pad).astype(jnp.float32)

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
    mark("warmup_compile")

    start = time.perf_counter()
    for _ in range(iters):
        out = engine.interact(state0, feats, m0, 0)
        jax.block_until_ready(out.prob)
    # one true host sync: block_until_ready alone can under-report through
    # the tunnel (see the interactive section / r4_sync_probe); the
    # dispatches execute serially on-device regardless, so a single
    # end-of-loop 4-byte fetch bounds the measurement correctly
    jax.device_get(out.certain_count)
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
        mark("headline")
        result["section_s"] = section_s
        emit(result)  # headline secured: flush the first snapshot NOW

    if not quick:
        # aggregate MFU from the EXECUTED-FLOP model (r4): the r1-r3 fields
        # divided cost_analysis of the whole interact by wall time, but
        # cost_analysis counts fori_loop bodies ONCE — a ~3-4x undercount
        # at T=60 (~11 blocked + 4 tail iterations per pass).  See
        # experiments/r4_mfu_attribution.md.
        try:
            peak, kind = device_peak_flops()
            model = executed_interact_flops(engine, feats)
            if model and peak:
                result["mfu"] = round(
                    model["total"] * iters / elapsed / peak, 4)
                result["interact_tflops_executed"] = round(
                    model["total"] / 1e12, 3)
                result["mfu_detail"] = model["detail"]
                result["device"] = kind
            # the old (loop-bodies-once) figure, kept for r1-r3 comparison
            flops = executable_flops(engine._interact_jit, state0, feats, m0,
                                     jnp.asarray(0, jnp.int32))
            if flops and peak:
                result["mfu_costanalysis_legacy"] = round(
                    flops * iters / elapsed / peak, 4)
                result.setdefault("device", kind)
        except Exception as e:  # accounting must never sink the headline
            print(f"[bench] mfu accounting skipped: {e!r}", file=sys.stderr)
            result["mfu_skipped"] = repr(e)
        mark("mfu")
        emit(result)

    if not quick and remaining() < 90:
        result["interactive_skipped"] = "budget"
    elif not quick:
        # interactive big-bank session (the regime EVA-VOS actually runs),
        # at the reference's 60-round protocol
        # (``eval_annotation_method.py:30``); honest metric = frames the
        # passes actually propagate / wall time.  Frames are chosen
        # farthest-point in index space (the shape of qnet/oracle
        # selections).  The first-10-round fields keep r1-r3 comparability;
        # the *_60round fields record the long-session steady state where
        # fixed per-round cost dominates (VERDICT r3 #5).
        rounds = min(60, t)
        try:
            # device-resident masks: per-round host->device mask uploads
            # are not part of the propagation work being measured (real
            # sessions produce SAM masks on device)
            masks_dev = pad_mask(masks[:1].astype(np.float32), pad)
            jax.block_until_ready(masks_dev)
            windows, span = _window_session(engine, feats, masks_dev, t,
                                            rounds)

            fr10, sec10 = span(1, 10)
            if sec10:
                result["interactive_fps_72slot_honest"] = round(
                    fr10 / sec10, 2)
                result["interactive_rounds_per_sec"] = round(9 / sec10, 3)
            frt, sect = span(5, 10)
            if sect:
                result["interactive_tail_fps_honest"] = round(
                    frt / sect, 2)
            if rounds > 30:
                half = max(11, rounds // 2)
                fr_all, sec_all = span(1, rounds)
                fr_half, sec_half = span(half, rounds)
                result["interactive_fps_60round"] = round(
                    fr_all / sec_all, 2) if sec_all else 0.0
                result["interactive_tail_fps_60round"] = round(
                    fr_half / sec_half, 2) if sec_half else 0.0
                result["interactive_rounds_60"] = rounds
                result["interactive_tail_ms_per_round_60round"] = round(
                    1e3 * sec_half / (rounds - half), 1)
                # at T == rounds the final half-session propagates ~0 frames
                # (every gap is closed), so its fps is degenerate by
                # construction — the late-ACTIVE window is rounds 10..half
                fr_la, sec_la = span(10, half)
                if sec_la:
                    result["interactive_fps_rounds10_30"] = round(
                        fr_la / sec_la, 2)
                result["interactive_session60_s"] = round(sec_all, 2)
        except Exception as e:  # never sink the already-computed headline
            print(f"[bench] interactive session skipped: {e!r}",
                  file=sys.stderr)
            result["interactive_skipped"] = repr(e)

    if not quick:
        mark("interactive")
        emit(result)

    # 60-round session on a LONGER (T=120) video: at T == rounds the
    # T=60 session's final half propagates ~0 frames (every gap is
    # closed), so its tail fps measures available work, not speed.
    # At T=120 the tail rounds still propagate 1-2 frames each — this
    # is the non-degenerate long-session tail throughput (VERDICT r3
    # #5).  Reuses the same engine: interact jit-specializes on the
    # T=120 feature shapes (one extra compile, persistent-cached).
    if not quick and remaining() < 150:
        result["interactive_t120_skipped"] = "budget"
    elif not quick:
        try:
            t2 = 120
            images2, masks2 = synthetic_video(t2, h, w, num_objects=1,
                                              seed=1)
            padded2, pad2 = prepare_video(images2, dtype=dtype)
            feats2 = engine.precompute_features(padded2)
            jax.block_until_ready(feats2.k16)
            masks2_dev = pad_mask(masks2.astype(np.float32), pad2)
            jax.block_until_ready(masks2_dev)
            _, span2 = _window_session(engine, feats2, masks2_dev, t2, 60,
                                       edges=[10, 30, 60])
            fr_all, sec_all = span2(1, 60)
            fr_tail, sec_tail = span2(30, 60)
            if sec_all:
                result["interactive_fps_60round_T120"] = round(
                    fr_all / sec_all, 2)
            if sec_tail:
                result["interactive_tail_fps_60round_T120"] = round(
                    fr_tail / sec_tail, 2)
                result["interactive_tail_ms_per_round_T120"] = round(
                    1e3 * sec_tail / 30, 1)
            del feats2, masks2_dev, padded2
        except Exception as e:
            print(f"[bench] T120 interactive session skipped: {e!r}",
                  file=sys.stderr)
            result["interactive_t120_skipped"] = repr(e)

    if not quick:
        mark("interactive_t120")
        emit(result)

    # SAM-path benchmarks (VERDICT r3 #2): encode ms, warm-start decode
    # chain ms, and the full eva_vos policy round rate with the JAX SAM
    # in the loop.  Random ViT-H weights — the geometry (and the
    # worst-case 21-decode warm-start budget) is what's measured.
    controller = None
    if not quick and remaining() < 180:
        result["sam_bench_skipped"] = "budget"
    elif not quick:
        try:
            controller = build_jax_sam()
            result.update(sam_bench(controller))
        except Exception as e:
            print(f"[bench] sam bench skipped: {e!r}", file=sys.stderr)
            result["sam_bench_skipped"] = repr(e)
        mark("sam")
        emit(result)
    if controller is not None and remaining() < 150:
        result["eva_vos_rate_skipped"] = "budget"
    elif controller is not None:
        try:
            result.update(eva_vos_round_rate(
                engine, images, masks[:1], controller))
        except Exception as e:
            print(f"[bench] eva_vos round rate skipped: {e!r}",
                  file=sys.stderr)
            result["eva_vos_rate_skipped"] = repr(e)
        mark("eva_vos")
        emit(result)

    # production-geometry quality (LAST: the most expensive evidence —
    # a driver-window overrun here costs only this section, VERDICT r4
    # #1): same fitted weights through the torch reference (CPU fp32,
    # worker thread) and this engine (bf16 + fp32 cross-check) on a
    # T=30, K=2 slice of the bench video
    if not quick and fp32_stcn is None:
        result["deep_quality_skipped"] = "no fitted weights"
    elif not quick and remaining() < 150:
        result["deep_quality_skipped"] = "budget"
    elif not quick:
        try:
            # the episode's own K=2 video + weights briefly fitted ON it
            # (disk-cached like the headline fit); an engine built around
            # those weights costs no extra compile beyond what this
            # section already pays — the T=30 feature shapes force a
            # fresh interact specialization either way
            images_q, masks_q = synthetic_video(t, h, w, num_objects=2,
                                                seed=0)
            fit_key_q = (t, h, w, np.dtype(dtype).name, 2, 0)
            stcn_q = jax.tree.map(
                lambda x: _round_to_dtype_host(x, dtype),
                _fit_cached("stcn", (*fit_key_q, fit_stcn_briefly),
                            lambda: fit_stcn_briefly(images_q, masks_q)))
            fusion_q = jax.tree.map(
                lambda x: _round_to_dtype_host(x, dtype),
                _fit_cached(
                    "fusion",
                    (*fit_key_q, fit_fusion_briefly, fit_stcn_briefly),
                    lambda: fit_fusion_briefly(images_q, masks_q, stcn_q)))
            engine_q = InferenceEngine(
                stcn, fusion,
                jax.tree.map(lambda x: jnp.asarray(x, dtype), stcn_q),
                jax.tree.map(lambda x: jnp.asarray(x, dtype), fusion_q),
                engine.config)
            result.update(deep_quality(
                engine_q, images_q[:30], masks_q[:, :30], stcn_q,
                fusion_q, interactions=(0, None, 10),
                budget_s=max(120.0, remaining() - 120.0),
                fp32_xcheck=remaining() > 300))
        except Exception as e:
            print(f"[bench] deep_quality skipped: {e!r}",
                  file=sys.stderr)
            result["deep_quality_skipped"] = repr(e)
    if quick:
        # tiny matched-weights episode vs the imported torch reference at
        # the quick profile's numerics
        try:
            result.update(quality_delta("f32"))
        except Exception as e:  # a missing oracle must never sink the bench
            print(f"[bench] quality_delta skipped: {e!r}", file=sys.stderr)
    if not quick:
        mark("deep_quality")
        result["bench_wall_s"] = round(time.perf_counter() - t_run0, 1)
        record_history(result)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    run(quick=args.quick)

"""Attribute the gap between summed phase costs (7.6 ms/frame,
r3_phase_mfu) and the measured interactive step (11.9 ms/frame) by timing
the REAL engine's sub-stages — same engine object, same weights, same
bank state — against the full interact call.

Stages (per 5-frame block at fill 13):
  segment   — _segment_frames_batched (selection + readout + decode)
  fusion    — _fuse_frames_batched (attention + packed FusionNet)
  evalue    — _encode_value (one admission)
  interact  — the full jitted round (2 passes over ~25 frames)

Run on TPU:  python experiments/r3_engine_bisect.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from eva_vos_tpu.models import PropagationNetwork, FusionNet
from eva_vos_tpu.engine import InferenceEngine
from eva_vos_tpu.engine.propagation import EngineConfig, prepare_video, pad_mask
from eva_vos_tpu.data import synthetic_video


def timed(fn, *args, iters=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(t=60, h=480, w=854):
    dtype = jnp.bfloat16
    ph, pw = h + (-h) % 16, w + (-w) % 16
    stcn = PropagationNetwork(dtype=dtype)
    fusion = FusionNet(dtype=dtype)
    sp = stcn.init(jax.random.PRNGKey(0), jnp.zeros((ph, pw, 3), dtype),
                   jnp.zeros((1, ph, pw), dtype), method="init_all")
    fp = fusion.init(jax.random.PRNGKey(1), jnp.zeros((ph, pw, 3), dtype),
                     jnp.zeros((ph, pw), dtype), jnp.zeros((ph, pw), dtype),
                     jnp.zeros((ph, pw, 2), dtype), jnp.zeros((2,), dtype))
    engine = InferenceEngine(stcn, fusion, sp, fp,
                             EngineConfig(max_interactions=60,
                                          feature_chunk=2))
    print(f"readout: {engine.config.readout_strategy}", flush=True)

    images, masks = synthetic_video(t, h, w, 1, seed=0)
    padded, pad = prepare_video(images, dtype=dtype)
    feats = engine.precompute_features(padded)
    jax.block_until_ready(feats.k16)
    state = engine.init_state(feats, 1)

    # build a fill-13 bank state by running a few rounds
    for idx in (0, t - 1, 20):
        m = pad_mask(masks[:, idx].astype(np.float32), pad)
        state = engine.interact(state, feats, m, idx)
    jax.block_until_ready(state.prob)
    h16, w16 = feats.f16_thin.shape[1:3]
    hw = h16 * w16

    tis = jnp.asarray([31, 32, 33, 34, 35], jnp.int32)
    front = jnp.asarray(13, jnp.int32)

    seg = jax.jit(lambda bk, bv, fr, ti: engine._segment_frames_batched(
        feats, bk, bv, fr, ti))
    t_seg = timed(seg, state.bank_k, state.bank_v, front, tis)
    print(f"segment(B=5, fill13): {t_seg * 1e3:.2f} ms "
          f"({t_seg / 5 * 1e3:.2f}/frame)", flush=True)

    out5 = seg(state.bank_k, state.bank_v, front, tis)
    from eva_vos_tpu.ops import aggregate_wbg

    agg = jax.jit(lambda o: jax.vmap(
        lambda p: aggregate_wbg(p.astype(jnp.float32), keep_bg=True))(o))
    t_agg = timed(agg, out5)
    print(f"aggregate(B=5): {t_agg * 1e3:.2f} ms", flush=True)

    prob5 = agg(out5)
    key_k16 = feats.k16[0].reshape(h16, w16, -1)
    posd = jnp.ones((1, ph, pw), jnp.float32) * 0.1
    negd = jnp.ones((1, ph, pw), jnp.float32) * 0.1
    prev5 = jnp.moveaxis(state.prob[:, tis], 1, 0)

    fuse = jax.jit(lambda prev, curr, ti: engine._fuse_frames_batched(
        feats, prev, curr, key_k16, posd, negd,
        jnp.asarray(40, jnp.int32), jnp.asarray(20, jnp.int32), ti))
    t_fuse = timed(fuse, prev5, prob5, tis)
    print(f"fusion(B=5): {t_fuse * 1e3:.2f} ms "
          f"({t_fuse / 5 * 1e3:.2f}/frame)", flush=True)

    ev = jax.jit(lambda m: engine._encode_value(feats, jnp.asarray(31), m))
    t_ev = timed(ev, prob5[0, 1:].astype(dtype))
    print(f"encode_value: {t_ev * 1e3:.2f} ms", flush=True)

    # full interact round at this bank state (round 4: propagates ~19
    # frames between interacted 20 and 59 -> idx 40)
    m = pad_mask(masks[:, 40].astype(np.float32), pad)
    t_int = timed(lambda: engine.interact(state, feats, m, 40), iters=5)
    n_frames = (59 - 40 - 1) + (40 - 20 - 1)
    print(f"interact(idx=40, {n_frames} frames): {t_int * 1e3:.1f} ms "
          f"({t_int / n_frames * 1e3:.2f}/frame)", flush=True)
    n_blocks = -(-n_frames // 5)
    acc = (n_blocks * (t_seg + t_agg + t_fuse) + n_blocks * t_ev)
    print(f"accounted: {acc * 1e3:.1f} ms; gap: {(t_int - acc) * 1e3:.1f} ms "
          f"({(t_int - acc) / n_frames * 1e3:.2f}/frame)", flush=True)

    # FIXED per-round cost: an interact that propagates (almost) nothing.
    # The v5 interactive rounds fit ~7 ms/frame + ~95 ms/round fixed
    # (r3_interactive_v5.log rounds 6-10) - measure that intercept
    # directly: interact at idx=1 with 0 and 2 interacted => fwd 0 frames,
    # bwd 0 frames.  Costs left: encode_value + state-buffer copies
    # (no donation) + dispatch + the two empty fori_loops.
    m2 = pad_mask(masks[:, 2].astype(np.float32), pad)
    state2 = engine.interact(state, feats, m2, 2)
    jax.block_until_ready(state2.prob)
    m1 = pad_mask(masks[:, 1].astype(np.float32), pad)
    t_zero = timed(lambda: engine.interact(state2, feats, m1, 1), iters=10)
    print(f"interact(idx=1, 0 frames propagated): {t_zero * 1e3:.1f} ms "
          f"fixed per-round cost", flush=True)

    # donated variant: same zero-propagation round without the input
    # state's ~340 MB prob/bank copy (each iteration must donate a FRESH
    # state, so rebuild one per call outside the timed region is not
    # possible with `timed` — chain donations instead: the output state
    # has the same shapes, so donate it back in)
    cc2 = int(state2.certain_count)
    inter2 = np.asarray(state2.interacted)
    st = engine.interact(state2, feats, m1, 1, donate=False)
    jax.block_until_ready(st.prob)
    # warm-up compile of the donated executable
    st = engine.interact(st._replace(
        certain_count=jnp.asarray(cc2, jnp.int32),
        interacted=jnp.asarray(inter2)), feats, m1, 1, donate=True)
    jax.block_until_ready(st.prob)
    t0 = time.perf_counter()
    for _ in range(10):
        # fresh scalar/flag buffers each round: donation consumes ALL of
        # arg 0's buffers, so reusing state2's arrays would die on round 2
        st = engine.interact(st._replace(
            certain_count=jnp.asarray(cc2, jnp.int32),
            interacted=jnp.asarray(inter2)), feats, m1, 1, donate=True)
    jax.block_until_ready(st.prob)
    t_zero_d = (time.perf_counter() - t0) / 10
    print(f"interact(idx=1, 0 frames, donate=True): {t_zero_d * 1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()

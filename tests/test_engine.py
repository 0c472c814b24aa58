"""Propagation engine vs. a dynamic-shape Python oracle.

The oracle walks the exact reference ``InferenceCore`` semantics
(``mivos/inference_core.py:126-244``): python loops, growing memory lists,
per-pass transient banks, mem_freq admission, fusion between interacted
frames.  The engine must reproduce its probability volume with its
fixed-shape banks, traced bounds and fori_loop passes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eva_vos_tpu.models import PropagationNetwork, FusionNet
from eva_vos_tpu.engine import InferenceEngine
from eva_vos_tpu.engine.propagation import EngineConfig, prepare_video, pad_mask
from eva_vos_tpu.ops import memory_readout, aggregate_wbg
from eva_vos_tpu.data import synthetic_video

T, H, W = 6, 48, 64
MEM_FREQ = 2
TOP_K = 8


def build(k_objects, block_frames=False):
    stcn = PropagationNetwork(key_arch="resnet18", value_arch="resnet18",
                              top_k=TOP_K)
    fusion = FusionNet()
    frame = jnp.zeros((H, W, 3))
    masks = jnp.zeros((k_objects, H, W))
    sp = stcn.init(jax.random.PRNGKey(0), frame, masks, method="init_all")
    fp = fusion.init(jax.random.PRNGKey(1), frame, masks[0], masks[0],
                     jnp.zeros((H, W, 2)), jnp.zeros((2,)))
    cfg = EngineConfig(mem_freq=MEM_FREQ, top_k=TOP_K, max_interactions=4,
                       feature_chunk=2, block_frames=block_frames)
    return stcn, fusion, sp, fp, cfg


class Oracle:
    """Reference-semantics propagation with plain Python control flow."""

    def __init__(self, stcn, fusion, sp, fp, feats, k):
        self.stcn, self.fusion, self.sp, self.fp = stcn, fusion, sp, fp
        self.feats = feats
        self.k = k
        t, self.hw, self.ck = feats.k16.shape
        self.t = t
        nh, nw = feats.images.shape[1:3]
        self.prob = np.zeros((k + 1, t, nh, nw), np.float32)
        self.prob[0] = 1e-7
        self.certain_k, self.certain_v = [], []
        self.interacted = set()

    def encode_value(self, ti, masks):
        v = self.stcn.apply(self.sp, self.feats.images[ti], self.feats.f16[ti],
                            jnp.asarray(masks), method="encode_value")
        return np.asarray(v.reshape(self.k, self.hw, -1))

    def segment(self, mem_k, mem_v, ti):
        mk = jnp.asarray(np.concatenate(mem_k, 0))               # [M*hw? tokens]
        mv = jnp.asarray(np.stack(mem_v, 0))                     # [S, K, hw, CV]
        mv = jnp.transpose(mv, (1, 0, 2, 3)).reshape(self.k, -1, mv.shape[-1])
        readout = memory_readout(mk, self.feats.k16[ti], mv,
                                 top_k=min(TOP_K, mk.shape[0]))
        h16, w16 = self.feats.f16_thin.shape[1:3]
        readout = readout.reshape(self.k, h16, w16, -1)
        # engine-precomputed feats carry the hoisted skip-conv outputs
        prob = self.stcn.apply(self.sp, readout, self.feats.f16_thin[ti],
                               self.feats.f8[ti], self.feats.f4[ti],
                               skips_precomputed=True,
                               method="decode_with_readout")
        return np.asarray(aggregate_wbg(prob.astype(jnp.float32), keep_bg=True))

    def fuse(self, ti, tc, tr, out, key_k16, pos, neg):
        h16, w16 = self.feats.f16_thin.shape[1:3]
        attn = self.stcn.apply(self.sp, key_k16, jnp.asarray(pos),
                               jnp.asarray(neg),
                               self.feats.k16[ti].reshape(h16, w16, -1),
                               method="get_attention")
        nc = abs(tc - ti) / abs(tc - tr)
        nr = abs(tr - ti) / abs(tc - tr)
        dist = jnp.asarray([nc, nr], jnp.float32)
        fused = []
        for kk in range(1, self.k + 1):
            logit = self.fusion.apply(
                self.fp, self.feats.images[ti],
                jnp.asarray(self.prob[kk, ti]), jnp.asarray(out[kk]),
                attn[kk - 1], dist)
            fused.append(np.asarray(jax.nn.sigmoid(logit)))
        return np.asarray(aggregate_wbg(jnp.asarray(np.stack(fused)), keep_bg=True))

    def interact(self, mask, idx):
        fwd = min([t for t in self.interacted if t > idx] + [self.t])
        bwd = max([t for t in self.interacted if t < idx] + [-1])
        self.interacted.add(idx)

        pos = np.clip(mask - self.prob[1:, idx], 0, 1)
        neg = np.clip(self.prob[1:, idx] - mask, 0, 1)
        self.prob[0, idx] = 1 - mask.max(0)
        self.prob[1:, idx] = mask

        self.certain_k.append(np.asarray(self.feats.k16[idx]))
        self.certain_v.append(self.encode_value(idx, mask))

        h16, w16 = self.feats.f16_thin.shape[1:3]
        key_k16 = self.feats.k16[idx].reshape(h16, w16, -1)

        for forward, closest in ((True, fwd), (False, bwd)):
            mem_k = list(self.certain_k)
            mem_v = list(self.certain_v)
            last_ti = idx
            rng = range(idx + 1, closest) if forward else range(idx - 1, closest, -1)
            end = closest - 1 if forward else closest + 1
            for ti in rng:
                out = self.segment(mem_k, mem_v, ti)
                if ti != end and abs(ti - last_ti) >= MEM_FREQ:
                    mem_k.append(np.asarray(self.feats.k16[ti]))
                    mem_v.append(self.encode_value(ti, out[1:]))
                    last_ti = ti
                if closest != self.t and closest != -1:
                    self.prob[:, ti] = self.fuse(ti, closest, idx, out,
                                                 key_k16, pos, neg)
                else:
                    self.prob[:, ti] = out


@pytest.mark.parametrize(
    "k_objects,block_frames",
    [(1, False), pytest.param(2, False, marks=pytest.mark.slow),
     (1, True), pytest.param(2, True, marks=pytest.mark.slow)])
def test_engine_matches_oracle(k_objects, block_frames):
    stcn, fusion, sp, fp, cfg = build(k_objects, block_frames)
    images, masks = synthetic_video(T, H, W, num_objects=k_objects, seed=3)
    padded, pad = prepare_video(images)
    assert pad == (0, 0, 0, 0)

    engine = InferenceEngine(stcn, fusion, sp, fp, cfg)
    feats = engine.precompute_features(padded)
    state = engine.init_state(feats, k_objects)
    oracle = Oracle(stcn, fusion, sp, fp, feats, k_objects)

    # Round 1: frame 0 (pure forward pass, memory admission every 2 frames).
    # Round 2: frame T-1 (backward pass with fusion on in-between frames).
    # Round 3: frame 2 (both passes fused; re-exercises certain bank growth).
    for idx in (0, T - 1, 2):
        m = masks[:, idx].astype(np.float32)
        state = engine.interact(state, feats, pad_mask(m, pad), idx)
        oracle.interact(m, idx)
        np.testing.assert_allclose(
            np.asarray(state.prob), oracle.prob, rtol=2e-4, atol=2e-5,
            err_msg=f"prob mismatch after interacting frame {idx}")

    assert int(state.certain_count) == 3
    assert np.asarray(state.interacted).sum() == 3


@pytest.mark.slow
def test_readout_strategies_agree():
    """gather and scatter readouts must produce identical propagation."""
    stcn, fusion, sp, fp, _ = build(1)
    images, masks = synthetic_video(T, H, W, num_objects=1, seed=9)
    padded, pad = prepare_video(images)

    probs = []
    for strategy in ("gather", "scatter"):
        cfg = EngineConfig(mem_freq=MEM_FREQ, top_k=TOP_K, max_interactions=4,
                           feature_chunk=2, readout_strategy=strategy)
        engine = InferenceEngine(stcn, fusion, sp, fp, cfg)
        feats = engine.precompute_features(padded)
        state = engine.init_state(feats, 1)
        state = engine.interact(state, feats,
                                pad_mask(masks[:, 0].astype(np.float32), pad), 0)
        probs.append(np.asarray(state.prob))
    np.testing.assert_allclose(probs[0], probs[1], rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_fusion_packed_matches_module_path():
    """The space-to-depth FusionNet execution must not change propagation:
    two interactions force fused passes, then compare full prob volumes."""
    stcn, fusion, sp, fp, _ = build(1)
    images, masks = synthetic_video(T, H, W, num_objects=1, seed=11)
    padded, pad = prepare_video(images)

    probs = []
    for mode in ("off", "on"):
        cfg = EngineConfig(mem_freq=MEM_FREQ, top_k=TOP_K, max_interactions=4,
                           feature_chunk=2, fusion_packed=mode)
        engine = InferenceEngine(stcn, fusion, sp, fp, cfg)
        feats = engine.precompute_features(padded)
        state = engine.init_state(feats, 1)
        for idx in (0, T - 1):  # second interact propagates BETWEEN -> fuses
            state = engine.interact(
                state, feats, pad_mask(masks[:, idx].astype(np.float32), pad),
                idx)
        probs.append(np.asarray(state.prob))
    np.testing.assert_allclose(probs[0], probs[1], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("block_frames", [False, True])
def test_fusion_none_disables_blending(block_frames):
    """fusion=None must trace and run (ADVICE r1: lax.cond traced the fused
    branch and crashed); between-interaction passes keep the fresh
    prediction instead of blending."""
    stcn, fusion, sp, fp, _ = build(1, block_frames)
    cfg = EngineConfig(mem_freq=MEM_FREQ, top_k=TOP_K, max_interactions=4,
                       feature_chunk=2, block_frames=block_frames)
    images, masks = synthetic_video(T, H, W, num_objects=1, seed=7)
    padded, pad = prepare_video(images)

    engine = InferenceEngine(stcn, None, sp, None, cfg)
    feats = engine.precompute_features(padded)
    state = engine.init_state(feats, 1)
    # second interaction triggers a between-interacted-frames pass, the one
    # that would have entered the fused branch
    state = engine.interact(state, feats,
                            pad_mask(masks[:, 0].astype(np.float32), pad), 0)
    state = engine.interact(
        state, feats, pad_mask(masks[:, T - 1].astype(np.float32), pad), T - 1)
    prob = np.asarray(state.prob)
    assert np.isfinite(prob).all()
    np.testing.assert_allclose(prob[:, 1:-1].sum(0), 1.0, atol=1e-4)


@pytest.mark.slow
def test_interact_capacity_error():
    """Exceeding max_interactions certain slots must raise loudly, not
    silently clamp into the transient bank region (ADVICE r1)."""
    stcn, fusion, sp, fp, _ = build(1)
    cfg = EngineConfig(mem_freq=MEM_FREQ, top_k=TOP_K, max_interactions=2,
                       feature_chunk=2)
    images, masks = synthetic_video(T, H, W, num_objects=1, seed=11)
    padded, pad = prepare_video(images)
    engine = InferenceEngine(stcn, fusion, sp, fp, cfg)
    feats = engine.precompute_features(padded)
    state = engine.init_state(feats, 1)
    for idx in (0, T - 1):
        state = engine.interact(
            state, feats, pad_mask(masks[:, idx].astype(np.float32), pad), idx)
    with pytest.raises(ValueError, match="capacity"):
        engine.interact(state, feats,
                        pad_mask(masks[:, 2].astype(np.float32), pad), 2)


@pytest.mark.slow
def test_propagation_tracks_moving_object():
    """With *trained-free* random nets we can't check quality, but the engine
    must at least produce valid distributions and mark state correctly."""
    stcn, fusion, sp, fp, cfg = build(1)
    images, masks = synthetic_video(T, H, W, num_objects=1, seed=5)
    padded, pad = prepare_video(images)
    engine = InferenceEngine(stcn, fusion, sp, fp, cfg)
    feats = engine.precompute_features(padded)
    state = engine.init_state(feats, 1)
    state = engine.interact(state, feats, pad_mask(masks[:, 0].astype(np.float32), pad), 0)

    prob = np.asarray(state.prob)
    assert np.isfinite(prob).all()
    sums = prob[:, 1:].sum(0)  # propagated frames are softmax distributions
    np.testing.assert_allclose(sums, 1.0, atol=1e-4)

    ids = engine.masks_from_prob(state.prob, pad)
    assert ids.shape == (T, H, W)
    # interacted frame must reproduce the ground truth exactly
    np.testing.assert_array_equal(ids[0], masks[0, 0])


@pytest.mark.slow
def test_donating_interact_matches_default():
    """interact(donate=True) must produce the same propagation as the
    non-donating path; the donated input state must be consumed."""
    stcn, fusion, sp, fp, cfg = build(1)
    images, masks = synthetic_video(T, H, W, num_objects=1, seed=11)
    padded, pad = prepare_video(images)
    engine = InferenceEngine(stcn, fusion, sp, fp, cfg)
    feats = engine.precompute_features(padded)

    def session(donate):
        state = engine.init_state(feats, 1)
        for idx in (0, T - 1, 2):
            m = pad_mask(masks[:, idx].astype(np.float32), pad)
            state = engine.interact(state, feats, m, idx, donate=donate)
        return np.asarray(state.prob)

    np.testing.assert_allclose(session(False), session(True),
                               rtol=1e-5, atol=1e-6)

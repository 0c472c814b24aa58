"""SAM stack tests on the tiny preset (no checkpoints needed)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eva_vos_tpu.models.sam import build_sam, SamPredictor, SAMController
from eva_vos_tpu.models.sam.image_encoder import (
    window_partition, window_unpartition, get_rel_pos)
from eva_vos_tpu.models.sam.prompt_encoder import PAD_LABEL


@pytest.fixture(scope="module")
def tiny_sam():
    return build_sam("tiny")


@pytest.fixture(scope="module")
def predictor(tiny_sam):
    sam, params = tiny_sam
    return SamPredictor(sam, params, max_points=16)


class TestWindowing:
    def test_roundtrip_exact(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)).astype(np.float32))
        wins, padded = window_partition(x, 4)
        assert wins.shape == (2 * 2 * 3, 4, 4, 5)
        back = window_unpartition(wins, 4, padded, (8, 12))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_roundtrip_with_padding(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 7, 10, 3)).astype(np.float32))
        wins, padded = window_partition(x, 4)
        assert padded == (8, 12)
        back = window_unpartition(wins, 4, padded, (7, 10))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_get_rel_pos_exact_size(self, rng):
        rp = jnp.asarray(rng.standard_normal((7, 4)).astype(np.float32))  # 2*4-1
        out = get_rel_pos(4, 4, rp)
        assert out.shape == (4, 4, 4)
        # relative offset 0 sits at index k_size-1 = 3
        np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(rp[3]))
        np.testing.assert_allclose(np.asarray(out[3, 0]), np.asarray(rp[6]))


@pytest.mark.slow
class TestEncoderShapes:
    def test_image_encoder_output(self, tiny_sam):
        sam, params = tiny_sam
        x = jnp.zeros((1, 128, 128, 3))
        emb = sam.apply(params, x, method="encode_image")
        assert emb.shape == (1, 8, 8, 32)

    def test_decode_output(self, tiny_sam):
        sam, params = tiny_sam
        emb = jnp.zeros((8, 8, 32))
        coords = jnp.zeros((8, 2))
        labels = jnp.full((8,), PAD_LABEL, jnp.int32)
        mask_in = jnp.zeros((32, 32))
        masks, iou = sam.apply(params, emb, coords, labels, mask_in, False,
                               method="decode")
        assert masks.shape == (4, 32, 32)
        assert iou.shape == (4,)


@pytest.mark.slow
class TestPaddingInvariance:
    def test_extra_pad_slots_do_not_change_output(self, tiny_sam):
        """The fixed-shape prompt design must be exact: adding more padding
        slots cannot change the decoded masks."""
        sam, params = tiny_sam
        emb = jnp.asarray(
            np.random.default_rng(0).standard_normal((8, 8, 32)), jnp.float32)
        mask_in = jnp.zeros((32, 32))

        def run(n_slots):
            coords = np.zeros((n_slots, 2), np.float32)
            labels = np.full((n_slots,), PAD_LABEL, np.int32)
            coords[0] = (40, 60)
            labels[0] = 1
            labels[1] = -1  # official pad token
            m, i = sam.apply(params, emb, jnp.asarray(coords),
                             jnp.asarray(labels), mask_in, False,
                             method="decode")
            return np.asarray(m), np.asarray(i)

        m8, i8 = run(8)
        m16, i16 = run(16)
        np.testing.assert_allclose(m8, m16, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(i8, i16, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
class TestPredictor:
    def test_set_image_and_predict(self, predictor, rng):
        img = (rng.uniform(0, 1, (96, 120, 3)) * 255).astype(np.uint8)
        predictor.set_image(img)
        assert predictor.input_size == (102, 128)

        masks, iou, logits = predictor.predict(
            point_coords=np.array([[60, 48]]), point_labels=np.array([1]))
        assert masks.shape == (3, 96, 120) and masks.dtype == bool
        assert iou.shape == (3,)
        assert logits.shape == (3, 32, 32)

    def test_single_mask_output(self, predictor, rng):
        img = (rng.uniform(0, 1, (64, 64, 3)) * 255).astype(np.uint8)
        predictor.set_image(img)
        masks, iou, logits = predictor.predict(
            point_coords=np.array([[32, 32]]), point_labels=np.array([1]),
            multimask_output=False)
        assert masks.shape == (1, 64, 64)

    def test_box_and_mask_input(self, predictor, rng):
        img = (rng.uniform(0, 1, (64, 64, 3)) * 255).astype(np.uint8)
        predictor.set_image(img)
        m1, _, logits = predictor.predict(box=np.array([10, 10, 50, 50]))
        m2, _, _ = predictor.predict(
            point_coords=np.array([[30, 30]]), point_labels=np.array([1]),
            mask_input=logits[:1])
        assert m2.shape == (3, 64, 64)

    def test_embedding_shape(self, predictor, rng):
        img = (rng.uniform(0, 1, (64, 64, 3)) * 255).astype(np.uint8)
        predictor.set_image(img)
        emb = predictor.get_image_embedding()
        assert emb.shape == (32, 8, 8)  # channel-first, official layout


@pytest.mark.slow
class TestPredictorContract:
    """Property tests pinning the official predictor contract's edge cases
    (VERDICT r4 #8): multimask ordering, mask_input low-res logit
    semantics, the has-mask flag, and the full-res threshold — the
    behaviors the real-SAM fixtures would otherwise witness (the
    ``segment_anything`` pip package is not importable in this image)."""

    def test_multimask_is_decoder_outputs_1_to_3_in_order(self, predictor,
                                                          rng):
        """multimask masks/scores are decoder outputs 1..3 IN DECODER
        ORDER (the official predictor does not re-sort by score), and
        multimask_output=False is decoder output 0."""
        img = (rng.uniform(0, 1, (64, 64, 3)) * 255).astype(np.uint8)
        predictor.set_image(img)
        coords, labels = predictor._build_prompts(
            np.array([[30.0, 20.0]]), np.array([1]), None)
        raw_masks, raw_iou = predictor._decode(
            predictor.params, predictor.features, jnp.asarray(coords),
            jnp.asarray(labels),
            jnp.zeros((predictor.cfg.low_res, predictor.cfg.low_res),
                      predictor.sam.dtype), jnp.asarray(False))
        m3, i3, l3 = predictor.predict(point_coords=np.array([[30, 20]]),
                                       point_labels=np.array([1]))
        np.testing.assert_allclose(l3, np.asarray(raw_masks[1:], np.float32),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(i3, np.asarray(raw_iou[1:], np.float32),
                                   rtol=1e-5, atol=1e-5)
        m1, i1, l1 = predictor.predict(point_coords=np.array([[30, 20]]),
                                       point_labels=np.array([1]),
                                       multimask_output=False)
        np.testing.assert_allclose(l1, np.asarray(raw_masks[:1], np.float32),
                                   rtol=1e-5, atol=1e-5)

    def test_no_mask_flag_ignores_mask_content(self, predictor, rng):
        """has_mask=False must use the learned no-mask embedding: the
        mask_input buffer's CONTENT cannot leak into the output."""
        img = (rng.uniform(0, 1, (64, 64, 3)) * 255).astype(np.uint8)
        predictor.set_image(img)
        coords, labels = predictor._build_prompts(
            np.array([[30.0, 20.0]]), np.array([1]), None)
        lr = predictor.cfg.low_res
        garbage = jnp.asarray(rng.standard_normal((lr, lr)),
                              predictor.sam.dtype)
        zero = jnp.zeros((lr, lr), predictor.sam.dtype)
        a = predictor._decode(predictor.params, predictor.features,
                              jnp.asarray(coords), jnp.asarray(labels),
                              garbage, jnp.asarray(False))
        b = predictor._decode(predictor.params, predictor.features,
                              jnp.asarray(coords), jnp.asarray(labels),
                              zero, jnp.asarray(False))
        np.testing.assert_allclose(np.asarray(a[0], np.float32),
                                   np.asarray(b[0], np.float32),
                                   rtol=1e-5, atol=1e-5)
        # ...and has_mask=True with the same garbage must differ (the mask
        # branch is live)
        c = predictor._decode(predictor.params, predictor.features,
                              jnp.asarray(coords), jnp.asarray(labels),
                              garbage, jnp.asarray(True))
        assert not np.allclose(np.asarray(a[0], np.float32),
                               np.asarray(c[0], np.float32), atol=1e-4)

    def test_logit_round_trip_and_threshold(self, predictor, rng):
        """low_res_logits are the raw (pre-threshold) low-res decoder
        outputs: feeding one back as mask_input reproduces the decode that
        receives the identical tensor, and the returned bool masks are
        exactly postprocess(logits) > 0.0 at the original resolution."""
        img = (rng.uniform(0, 1, (72, 96, 3)) * 255).astype(np.uint8)
        predictor.set_image(img)
        masks, iou, logits = predictor.predict(
            point_coords=np.array([[48, 36]]), point_labels=np.array([1]))
        assert logits.shape == (3, predictor.cfg.low_res,
                                predictor.cfg.low_res)
        up = np.asarray(predictor.postprocess_masks(jnp.asarray(logits)))
        np.testing.assert_array_equal(masks, up > 0.0)

        m_a, _, _ = predictor.predict(
            point_coords=np.array([[48, 36]]), point_labels=np.array([1]),
            mask_input=logits[:1])
        m_b, _, _ = predictor.predict(
            point_coords=np.array([[48, 36]]), point_labels=np.array([1]),
            mask_input=np.asarray(logits[0]))  # squeezed variant
        np.testing.assert_array_equal(m_a, m_b)

    def test_preprocess_shape_official_rounding(self):
        """longest-side resize uses the official int(dim * scale + 0.5)
        rounding (ResizeLongestSide.get_preprocess_shape)."""
        from eva_vos_tpu.models.sam.predictor import get_preprocess_shape

        for (h, w, long), want in [
                ((480, 854, 1024), (576, 1024)),
                ((854, 480, 1024), (1024, 576)),
                ((720, 1280, 1024), (576, 1024)),
                ((3, 5, 1024), (614, 1024)),
        ]:
            assert get_preprocess_shape(h, w, long) == want


@pytest.mark.slow
class TestController:
    def test_reference_api(self, tiny_sam, rng):
        sam, params = tiny_sam
        ctrl = SAMController(SamPredictor(sam, params, max_points=16))
        img = (rng.uniform(0, 1, (80, 100, 3)) * 255).astype(np.uint8)
        ctrl.set_image(img)
        masks, scores, logits = ctrl.predict(
            click_coords=np.array([[50, 40]]), click_labels=np.array([1]))
        assert masks.shape == (3, 1, 80, 100)
        ctrl.reset_image()
        assert not ctrl.embedded


@pytest.mark.slow
class TestFusedSelect:
    """predict_select must reproduce predict + the reference best_sam_mask
    selection exactly (same best mask, same smoothed IoU, same idx) while
    keeping the logit round-trip on device."""

    def _reference_select(self, predictor, target, **kw):
        from eva_vos_tpu.ops.metrics import compute_iou

        masks, _, logits = predictor.predict(
            point_coords=kw.get("point_coords"),
            point_labels=kw.get("point_labels"), box=kw.get("box"),
            mask_input=kw.get("mask_input"),
            multimask_output=kw.get("multimask_output", True))
        tgt = np.asarray(target).squeeze()[None].astype(bool)
        mask_idx, max_iou = -1, 0.0
        for ii, gen in enumerate(np.asarray(masks)):
            iou = compute_iou(np.asarray(gen, dtype=bool)[None], tgt)
            if iou > max_iou:
                mask_idx, max_iou = ii, iou
        eff = mask_idx if mask_idx >= 0 else len(masks) - 1
        return masks[eff], max_iou, mask_idx, logits[eff]

    @pytest.mark.parametrize("multi", [True, False])
    def test_matches_generic_path(self, predictor, rng, multi):
        img = (rng.uniform(0, 1, (61, 96, 3)) * 255).astype(np.uint8)
        predictor.set_image(img)
        target = np.zeros((61, 96), bool)
        target[20:40, 30:60] = True

        coords = np.array([[45.0, 30.0], [10.0, 10.0]])
        labels = np.array([1, 0])
        ref_mask, ref_iou, ref_idx, ref_low = self._reference_select(
            predictor, target, point_coords=coords, point_labels=labels,
            multimask_output=multi)
        mask, iou, idx, low = predictor.predict_select(
            target, point_coords=coords, point_labels=labels,
            multimask_output=multi)

        assert idx == ref_idx
        assert iou == pytest.approx(ref_iou, abs=0, rel=0)
        np.testing.assert_array_equal(mask, ref_mask)
        np.testing.assert_allclose(np.asarray(low, np.float32), ref_low,
                                   rtol=1e-5, atol=1e-5)

    def test_mask_input_round_trip_and_box(self, predictor, rng):
        img = (rng.uniform(0, 1, (61, 96, 3)) * 255).astype(np.uint8)
        predictor.set_image(img)
        target = np.zeros((61, 96), bool)
        target[10:35, 20:70] = True
        coords = np.array([[40.0, 20.0]])
        labels = np.array([1])
        box = np.array([18.0, 8.0, 72.0, 37.0])

        # round 1 (box + click), round 2 feeds round 1's logits back
        _, _, _, low = predictor.predict_select(
            target, point_coords=coords, point_labels=labels, box=box)
        mask2, iou2, idx2, _ = predictor.predict_select(
            target, point_coords=coords, point_labels=labels, box=box,
            mask_input=low[None])

        _, _, _, ref_low = self._reference_select(
            predictor, target, point_coords=coords, point_labels=labels,
            box=box)
        ref_mask2, ref_iou2, ref_idx2, _ = self._reference_select(
            predictor, target, point_coords=coords, point_labels=labels,
            box=box, mask_input=np.asarray(ref_low)[None])

        assert idx2 == ref_idx2
        assert iou2 == pytest.approx(ref_iou2, rel=1e-12)
        np.testing.assert_array_equal(mask2, ref_mask2)


@pytest.mark.slow
class TestAnnotatorFusedParity:
    """The Annotator must produce identical episodes through the fused
    controller path and the generic predict path."""

    def _run(self, controller, rng_seed=3):
        from eva_vos_tpu.annotator import Annotator

        rng = np.random.default_rng(rng_seed)
        im = rng.uniform(-1, 1, (61, 96, 3)).astype(np.float32)
        gt = np.zeros((61, 96), np.float32)
        gt[18:42, 25:65] = 1.0
        pred = np.roll(gt, (4, 7), axis=(0, 1)).astype(bool)

        annotator = Annotator(controller)
        return annotator.get_mask(
            annotation_type="click", num_prompts=2, gt_mask=gt, im=im,
            mivos_mask=pred, cache_key=0)

    def test_click_episode_identical(self, tiny_sam):
        sam, params = tiny_sam

        class GenericOnly:
            """Controller facade without predict_select."""

            def __init__(self, ctrl):
                self._c = ctrl

            def __getattr__(self, name):
                if name == "predict_select":
                    raise AttributeError(name)
                return getattr(self._c, name)

        fused_ctrl = SAMController(SamPredictor(sam, params, max_points=64))
        generic_ctrl = GenericOnly(
            SAMController(SamPredictor(sam, params, max_points=64)))

        m1, c1, q1, l1, cl1, lb1, bb1 = self._run(fused_ctrl)
        m2, c2, q2, l2, cl2, lb2, bb2 = self._run(generic_ctrl)

        assert c1 == c2
        assert q1 == pytest.approx(q2, rel=1e-12)
        np.testing.assert_array_equal(np.asarray(m1, bool),
                                      np.asarray(m2, bool))
        if cl1 is None:
            assert cl2 is None
        else:
            np.testing.assert_array_equal(cl1, cl2)
            np.testing.assert_array_equal(lb1, lb2)
        if l1 is not None and l2 is not None:
            np.testing.assert_allclose(np.asarray(l1, np.float32),
                                       np.asarray(l2, np.float32),
                                       rtol=1e-5, atol=1e-5)


@pytest.mark.slow
class TestWarmstartChainParity:
    """The fused device warm-start chain (``SamPredictor.warmstart_select``,
    one dispatch for the whole middle-click -> decode -> refine loop) must
    reproduce the host loop (``create_similar_samlogits`` with
    ``EVAVOS_HOST_WARMSTART=1``) round-for-round: identical clicks, labels,
    mask, and logits — including the give-up (None) case.  Reference
    semantics: ``annotator/annotator.py:60-107``."""

    def _episode(self, controller, pred, host, monkeypatch, threshold,
                 max_tries):
        from eva_vos_tpu.annotator import annotator as annot_mod

        monkeypatch.setattr(annot_mod, "SIMILAR_IOU_THRESHOLD", threshold)
        monkeypatch.setattr(annot_mod, "MAX_WARMSTART_TRIES", max_tries)
        if host:
            monkeypatch.setenv("EVAVOS_HOST_WARMSTART", "1")
        else:
            monkeypatch.delenv("EVAVOS_HOST_WARMSTART", raising=False)
        ann = annot_mod.Annotator(controller)
        return ann.create_similar_samlogits(pred)

    @pytest.mark.parametrize("threshold,max_tries,seed", [
        (0.3, 6, 11),    # early stop after a few refinement rounds
        (0.55, 6, 12),   # mid-chain stop or near-exhaustion
        (0.95, 4, 13),   # give-up path (tiny random SAM can't reach 0.95)
    ])
    def test_chain_identical(self, tiny_sam, monkeypatch, threshold,
                             max_tries, seed):
        sam, params = tiny_sam
        ctrl = SAMController(SamPredictor(sam, params, max_points=16))
        rng = np.random.default_rng(seed)
        img = (rng.uniform(0, 1, (61, 96, 3)) * 255).astype(np.uint8)
        ctrl.set_image(img)
        pred = np.zeros((61, 96), bool)
        pred[18:42, 25:65] = True
        pred[30:50, 10:30] = True  # two-lobe target: CC robot is exercised

        f_log, f_mask, f_clicks, f_labels = self._episode(
            ctrl, pred, False, monkeypatch, threshold, max_tries)
        h_log, h_mask, h_clicks, h_labels = self._episode(
            ctrl, pred, True, monkeypatch, threshold, max_tries)

        if h_log is None:
            assert f_log is None and f_mask is None and f_clicks is None
            return
        assert f_log is not None, "fused gave up where the host succeeded"
        np.testing.assert_array_equal(np.asarray(f_clicks, np.float64),
                                      np.asarray(h_clicks, np.float64))
        np.testing.assert_array_equal(np.asarray(f_labels, np.int64),
                                      np.asarray(h_labels, np.int64))
        np.testing.assert_array_equal(np.asarray(f_mask, bool).squeeze(),
                                      np.asarray(h_mask, bool).squeeze())
        np.testing.assert_allclose(
            np.asarray(f_log, np.float32).squeeze(),
            np.asarray(h_log, np.float32).squeeze(), rtol=1e-5, atol=1e-5)

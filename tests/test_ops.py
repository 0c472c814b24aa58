import numpy as np
import jax.numpy as jnp
import pytest

from eva_vos_tpu.ops import (
    compute_pad,
    pad_hw,
    unpad_hw,
    pad_divide_by,
    aggregate_wbg,
    im_normalize,
    im_denormalize,
    all_to_onehot,
    masks_to_boxes,
)
from eva_vos_tpu.ops.resize import area_downsample

pytestmark = pytest.mark.smoke


class TestPadding:
    @pytest.mark.parametrize(
        "h,w,expected",
        [
            (480, 854, (5, 5, 0, 0)),      # DAVIS 480p: w pads 854->864
            (480, 864, (0, 0, 0, 0)),
            (479, 853, (5, 6, 0, 1)),      # odd splits: low gets floor
            (16, 16, (0, 0, 0, 0)),
            (17, 31, (0, 1, 7, 8)),
        ],
    )
    def test_compute_pad(self, h, w, expected):
        assert compute_pad(h, w, 16) == expected

    def test_roundtrip(self, rng):
        x = rng.standard_normal((2, 3, 479, 853)).astype(np.float32)
        padded, pad = pad_divide_by(jnp.asarray(x), 16)
        assert padded.shape[-2] % 16 == 0 and padded.shape[-1] % 16 == 0
        back = unpad_hw(padded, pad)
        np.testing.assert_array_equal(np.asarray(back), x)

    def test_pad_axes(self, rng):
        x = rng.standard_normal((5, 30, 50, 3)).astype(np.float32)  # THWC
        padded, pad = pad_divide_by(jnp.asarray(x), 16, h_axis=1, w_axis=2)
        assert padded.shape == (5, 32, 64, 3)
        back = unpad_hw(padded, pad, h_axis=1, w_axis=2)
        np.testing.assert_array_equal(np.asarray(back), x)


class TestAggregate:
    def test_matches_reference_formula(self, rng):
        # Recompute the reference torch formula in numpy.
        prob = rng.uniform(0, 1, size=(3, 8, 8)).astype(np.float32)
        bg = np.prod(1 - prob, axis=0, keepdims=True)
        new_prob = np.clip(np.concatenate([bg, prob], 0), 1e-7, 1 - 1e-7)
        logits = np.log(new_prob / (1 - new_prob))
        ref = np.exp(logits - logits.max(0)) / np.exp(logits - logits.max(0)).sum(0)

        out = np.asarray(aggregate_wbg(jnp.asarray(prob), keep_bg=True))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_keep_bg_slices(self, rng):
        prob = jnp.asarray(rng.uniform(0, 1, size=(2, 4, 4)).astype(np.float32))
        full = aggregate_wbg(prob, keep_bg=True)
        nobg = aggregate_wbg(prob, keep_bg=False)
        assert full.shape == (3, 4, 4)
        assert nobg.shape == (2, 4, 4)
        np.testing.assert_allclose(np.asarray(full[1:]), np.asarray(nobg))

    def test_sums_to_one(self, rng):
        prob = jnp.asarray(rng.uniform(0, 1, size=(4, 6, 6)).astype(np.float32))
        out = aggregate_wbg(prob, keep_bg=True)
        np.testing.assert_allclose(np.asarray(out.sum(0)), 1.0, atol=1e-5)

    def test_hard_mode_saturates(self):
        prob = jnp.asarray(np.array([[[0.6]], [[0.3]]], dtype=np.float32))
        out = np.asarray(aggregate_wbg(prob, keep_bg=True, hard=True))
        assert out[1, 0, 0] > 0.999  # the 0.6 object wins outright


class TestNormalize:
    def test_roundtrip(self, rng):
        img = rng.uniform(0, 1, size=(4, 4, 3)).astype(np.float32)
        out = np.asarray(im_denormalize(im_normalize(jnp.asarray(img))))
        np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-6)

    def test_known_value(self):
        img = jnp.zeros((1, 1, 3))
        out = np.asarray(im_normalize(img))
        np.testing.assert_allclose(
            out[0, 0], [-0.485 / 0.229, -0.456 / 0.224, -0.406 / 0.225], rtol=1e-5
        )


class TestMaskUtils:
    def test_all_to_onehot(self):
        m = np.array([[[0, 1], [2, 1]], [[2, 2], [0, 0]]], dtype=np.uint8)
        out = all_to_onehot(m, [1, 2])
        assert out.shape == (2, 2, 2, 2)
        np.testing.assert_array_equal(out[0], (m == 1))
        np.testing.assert_array_equal(out[1], (m == 2))

    def test_masks_to_boxes(self):
        m = np.zeros((1, 10, 12), dtype=np.uint8)
        m[0, 2:5, 3:9] = 1
        box = masks_to_boxes(m)[0]
        np.testing.assert_array_equal(box, [3, 2, 8, 4])

    def test_masks_to_boxes_empty(self):
        box = masks_to_boxes(np.zeros((1, 4, 4)))[0]
        np.testing.assert_array_equal(box, [0, 0, 0, 0])


class TestResize:
    def test_area_downsample(self, rng):
        x = jnp.asarray(rng.uniform(size=(2, 32, 48)).astype(np.float32))
        out = area_downsample(x, 16)
        assert out.shape == (2, 2, 3)
        expected = np.asarray(x).reshape(2, 2, 16, 3, 16).mean(axis=(2, 4))
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


class TestPrepareVideo:
    def test_uint8_matches_float(self, rng):
        """uint8 videos upload 1 byte/px and are scaled on device; the
        result must be bit-equal to the [0,1] float path."""
        from eva_vos_tpu.engine.propagation import prepare_video

        img = (rng.uniform(size=(3, 30, 44, 3)) * 255).astype(np.uint8)
        a, pad_a = prepare_video(img.astype(np.float32) / 255.0)
        b, pad_b = prepare_video(img)
        assert pad_a == pad_b
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

import numpy as np
import jax.numpy as jnp

import pytest

from eva_vos_tpu.ops.metrics import (
    compute_iou,
    binary_jaccard,
    jnp_iou,
    seg2bmap,
    disk,
    f_measure,
    get_j_and_f,
)

pytestmark = pytest.mark.smoke


def square_mask(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), dtype=bool)
    m[y0:y1, x0:x1] = True
    return m


class TestIoU:
    def test_perfect(self):
        m = square_mask(20, 20, 5, 15, 5, 15)[None]
        assert abs(compute_iou(m, m) - 1.0) < 1e-6

    def test_known_overlap(self):
        a = square_mask(20, 20, 0, 10, 0, 10)[None]
        b = square_mask(20, 20, 5, 15, 0, 10)[None]
        # inter = 50, union = 150
        expected = (50 + 1e-6) / (150 + 1e-6)
        assert abs(compute_iou(a, b) - expected) < 1e-9

    def test_both_empty_smoothed_is_one(self):
        z = np.zeros((1, 8, 8), dtype=bool)
        assert abs(compute_iou(z, z) - 1.0) < 1e-6

    def test_binary_jaccard_empty_union(self):
        z = np.zeros((8, 8), dtype=bool)
        assert binary_jaccard(z, z) == 0.0

    def test_jnp_matches_numpy(self, rng):
        a = rng.uniform(size=(3, 16, 16)) > 0.5
        b = rng.uniform(size=(3, 16, 16)) > 0.5
        got = np.asarray(jnp_iou(jnp.asarray(a), jnp.asarray(b)))
        exp = [compute_iou(a[i:i + 1], b[i:i + 1]) for i in range(3)]
        np.testing.assert_allclose(got, exp, rtol=1e-5)


class TestBoundary:
    def test_seg2bmap_square(self):
        m = square_mask(10, 10, 3, 7, 3, 7)
        b = seg2bmap(m)
        # Boundary ring is offset half a pixel towards the origin: for a
        # square at [3:7, 3:7] it lands on rows/cols 2..6.
        expected = np.zeros((10, 10), dtype=bool)
        expected[2:7, 2:7] = True
        expected[3:6, 3:6] = False
        np.testing.assert_array_equal(b, expected)

    def test_disk_matches_skimage_formula(self):
        d1 = disk(1)
        np.testing.assert_array_equal(d1, [[0, 1, 0], [1, 1, 1], [0, 1, 0]])
        d2 = disk(2)
        assert d2.shape == (5, 5)
        assert d2[0, 0] == 0 and d2[2, 0] == 1

    def test_f_measure_identical_is_one(self):
        m = square_mask(64, 64, 10, 40, 10, 40)
        assert abs(f_measure(m, m) - 1.0) < 1e-9

    def test_f_measure_empty_cases(self):
        z = np.zeros((32, 32), dtype=bool)
        m = square_mask(32, 32, 5, 20, 5, 20)
        assert f_measure(z, z) == 1.0        # both empty: P=R=1
        assert f_measure(m, z) == 0.0        # pred empty, gt not: P=1, R=0 -> F=0
        assert f_measure(z, m) == 0.0        # gt empty, pred not: P=0, R=1 -> F=0

    def test_f_measure_close_masks_high(self):
        a = square_mask(100, 100, 20, 60, 20, 60)
        b = square_mask(100, 100, 21, 61, 20, 60)  # shifted by 1px < bound_pix
        assert f_measure(a, b) > 0.9


class TestJandF:
    def test_identical(self):
        m = square_mask(48, 48, 10, 30, 10, 30)[None]
        assert abs(get_j_and_f(m, m) - 1.0) < 1e-9

    def test_half_weighting(self):
        gt = square_mask(64, 64, 0, 32, 0, 64)[None]
        pred = square_mask(64, 64, 0, 64, 0, 64)[None]
        j = binary_jaccard(pred, gt)
        f = f_measure(gt[0], pred[0])
        assert abs(get_j_and_f(gt, pred) - (0.5 * j + 0.5 * f)) < 1e-9


class TestBatchedQuality:
    """Device-batched J / J&F must be bit-equal to the per-frame host loop
    (integer counts on device, identical float64 assembly on host)."""

    def _frames(self, rng):
        frames = []
        # random speckle, structured squares, empty, full, 1px shifts
        frames.append((rng.uniform(size=(48, 64)) > 0.5,
                       rng.uniform(size=(48, 64)) > 0.5))
        a = square_mask(48, 64, 10, 30, 12, 40)
        b = square_mask(48, 64, 11, 31, 12, 40)
        frames.append((a, b))
        frames.append((a, a))
        frames.append((np.zeros((48, 64), bool), b.astype(bool)))
        frames.append((a.astype(bool), np.zeros((48, 64), bool)))
        frames.append((np.zeros((48, 64), bool), np.zeros((48, 64), bool)))
        frames.append((np.ones((48, 64), bool), np.ones((48, 64), bool)))
        gt = np.stack([np.asarray(g, bool) for g, _ in frames])
        pred = np.stack([np.asarray(p, bool) for _, p in frames])
        return gt, pred

    def test_j_and_f_batch_equals_loop(self, rng):
        from eva_vos_tpu.ops.metrics import j_and_f_batch

        gt, pred = self._frames(rng)
        batch = j_and_f_batch(gt, pred)
        loop = np.asarray([get_j_and_f(gt[t][None], pred[t][None])
                           for t in range(gt.shape[0])])
        np.testing.assert_array_equal(batch, loop)

    def test_quality_batch_j_equals_compute_iou(self, rng):
        from eva_vos_tpu.ops.metrics import quality_batch

        gt, pred = self._frames(rng)
        batch = quality_batch(gt, pred, "j")
        loop = np.asarray([compute_iou(pred[t][None], gt[t][None])
                           for t in range(gt.shape[0])])
        np.testing.assert_array_equal(batch, loop)

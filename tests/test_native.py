"""Native C++ click kernels vs the scipy reference path."""

import numpy as np
import pytest

from eva_vos_tpu import native
from scipy import ndimage

pytestmark = [pytest.mark.smoke,
              pytest.mark.skipif(not native.available(),
                                 reason="native toolchain unavailable")]

_EIGHT = np.ones((3, 3), dtype=int)


def scipy_largest_center(mask):
    labels, num = ndimage.label(mask, structure=_EIGHT)
    if num == 0:
        return None
    sizes = np.bincount(labels.ravel())[1:]
    biggest = int(np.argmax(sizes)) + 1
    ys, xs = np.nonzero(labels == biggest)
    return int(np.mean(xs)), int(np.mean(ys)), int(sizes.max())


class TestLargestComponent:
    def test_empty(self):
        assert native.largest_component_center(np.zeros((8, 8), bool)) is None

    def test_single_blob(self):
        m = np.zeros((20, 30), bool)
        m[4:10, 5:15] = True
        assert native.largest_component_center(m) == scipy_largest_center(m)

    def test_diagonal_connectivity(self):
        # two pixels touching only diagonally must join (8-connectivity)
        m = np.zeros((4, 4), bool)
        m[0, 0] = m[1, 1] = True
        out = native.largest_component_center(m)
        assert out[2] == 2

    @pytest.mark.parametrize("seed", range(8))
    def test_random_masks_match_scipy(self, seed):
        rng = np.random.default_rng(seed)
        m = rng.uniform(size=(64, 96)) > 0.72
        got = native.largest_component_center(m)
        want = scipy_largest_center(m)
        assert got == want

    def test_size_tie_same_winner_center(self):
        # two equal components: both paths must agree on the reported size;
        # scipy's argmax keeps the first label (raster order), the native
        # union-find accumulates in the same raster order.
        m = np.zeros((10, 10), bool)
        m[0, 0:3] = True
        m[9, 7:10] = True
        got = native.largest_component_center(m)
        want = scipy_largest_center(m)
        assert got == want

    def test_size_tie_interleaved_components(self):
        # ADVICE r1: equal-size components where the later-STARTING one
        # finishes its pixels earlier in the raster scan.  A (col 0, rows
        # 0-4) starts first but completes at (4,0); B (row 0, cols 5-9)
        # starts later yet completes at (0,9).  The winner must be A
        # (earliest first pixel = lowest ndimage label), not B (earliest
        # completion).
        m = np.zeros((10, 12), bool)
        m[0:5, 0] = True
        m[0, 5:10] = True
        got = native.largest_component_center(m)
        want = scipy_largest_center(m)
        assert got == want


class TestNearestTrue:
    def test_inside(self):
        m = np.zeros((10, 10), bool)
        m[5, 5] = True
        assert native.nearest_true(m, 5, 5) == (5, 5)

    @pytest.mark.parametrize("seed", range(5))
    def test_matches_numpy(self, seed):
        rng = np.random.default_rng(seed)
        m = rng.uniform(size=(32, 48)) > 0.9
        if not m.any():
            return
        x, y = int(rng.integers(48)), int(rng.integers(32))
        ys, xs = np.nonzero(m)
        d = (xs - x) ** 2 + (ys - y) ** 2
        i = int(np.argmin(d))
        assert native.nearest_true(m, x, y) == (int(xs[i]), int(ys[i]))

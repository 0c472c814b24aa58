"""Device connected-components / click selection vs the host robots.

The device click robot must be BIT-IDENTICAL to the scipy/native host path
(``eva_vos_tpu/annotator/robots.py``) — the fused warm-start chain replaces
the host robot call round-for-round, so any divergence changes annotation
episodes."""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy import ndimage

from eva_vos_tpu.ops.components import (label_components,
                                        largest_component_stats,
                                        snap_to_mask, middle_click,
                                        click_robot_interact, INF32)
from eva_vos_tpu.annotator.robots import ClickRobot

pytestmark = pytest.mark.smoke

_EIGHT = np.ones((3, 3), int)


def _blob_mask(rng, h, w, n_blobs=4, r=6):
    m = np.zeros((h, w), bool)
    for _ in range(n_blobs):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        yy, xx = np.ogrid[:h, :w]
        rr = rng.integers(2, r)
        m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= rr ** 2
    return m


def _spiral_mask(h, w):
    """Adversarial: one long serpentine component (slow geodesic)."""
    m = np.zeros((h, w), bool)
    for i in range(0, h, 4):
        m[i, :] = True
        if (i // 4) % 2 == 0:
            m[i:i + 5, w - 1] = True
        else:
            m[i:i + 5, 0] = True
    return m


class TestLabelComponents:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_scipy_partition(self, seed):
        rng = np.random.default_rng(seed)
        m = rng.random((37, 53)) < 0.35
        lab = np.asarray(label_components(jnp.asarray(m)))
        ref, num = ndimage.label(m, structure=_EIGHT)
        # same partition: device label = min flat index per scipy component
        for c in range(1, num + 1):
            sel = ref == c
            flat = np.flatnonzero(sel.ravel())
            assert (lab[sel] == flat.min()).all()
        assert (lab[~m] == int(INF32)).all()

    def test_spiral_exact(self):
        m = _spiral_mask(33, 41)
        lab = np.asarray(label_components(jnp.asarray(m)))
        ref, num = ndimage.label(m, structure=_EIGHT)
        for c in range(1, num + 1):
            sel = ref == c
            assert len(np.unique(lab[sel])) == 1

    def test_empty_and_full(self):
        for m in (np.zeros((8, 8), bool), np.ones((8, 8), bool)):
            lab = np.asarray(label_components(jnp.asarray(m)))
            if m.any():
                assert (lab[m] == 0).all()
            else:
                assert (lab == int(INF32)).all()


class TestLargestComponent:
    @pytest.mark.parametrize("seed", list(range(8)))
    def test_matches_host_center(self, seed):
        from eva_vos_tpu.annotator.robots import _largest_component_click

        rng = np.random.default_rng(seed)
        m = _blob_mask(rng, 41, 59)
        cx, cy, size = (int(v) for v in largest_component_stats(
            jnp.asarray(m)))
        click, ref_size = _largest_component_click(m)
        assert size == ref_size
        if click is not None:
            assert (cx, cy) == click

    def test_tie_break_raster_first(self):
        # two equal-size components; scipy labels the raster-first one
        # first and argmax keeps it
        m = np.zeros((10, 20), bool)
        m[1:3, 2:4] = True    # 4 px, first pixel (1,2)
        m[5:7, 10:12] = True  # 4 px
        cx, cy, size = (int(v) for v in largest_component_stats(
            jnp.asarray(m)))
        assert size == 4 and (cx, cy) == (2, 1)


class TestClicks:
    @pytest.mark.parametrize("seed", list(range(10)))
    def test_interact_matches_host_robot(self, seed):
        rng = np.random.default_rng(100 + seed)
        gt = _blob_mask(rng, 43, 61, n_blobs=2)
        pred = _blob_mask(rng, 43, 61, n_blobs=3)
        if not gt.any():
            gt[20:25, 30:36] = True
        x, y, lab = (int(v) for v in click_robot_interact(
            jnp.asarray(pred), jnp.asarray(gt)))
        ref_clicks, ref_labels = ClickRobot().interact(pred, gt)
        assert [x, y] == list(ref_clicks[0])
        assert lab == int(ref_labels[0])

    def test_perfect_prediction_falls_back_to_middle(self):
        rng = np.random.default_rng(7)
        gt = _blob_mask(rng, 31, 37, n_blobs=1)
        if not gt.any():
            gt[10:20, 10:20] = True
        x, y, lab = (int(v) for v in click_robot_interact(
            jnp.asarray(gt), jnp.asarray(gt)))
        ref_clicks, ref_labels = ClickRobot().interact(gt, gt)
        assert [x, y] == list(ref_clicks[0]) and lab == int(ref_labels[0])

    @pytest.mark.parametrize("seed", list(range(6)))
    def test_middle_click_matches_host(self, seed):
        rng = np.random.default_rng(200 + seed)
        gt = _blob_mask(rng, 29, 47, n_blobs=2)
        if not gt.any():
            gt[5:9, 7:13] = True
        mx, my = (int(v) for v in middle_click(jnp.asarray(gt)))
        ref_clicks, _ = ClickRobot().middle_click(gt)
        assert [mx, my] == list(ref_clicks[0])

    def test_snap_row_major_tie(self):
        m = np.zeros((9, 9), bool)
        m[2, 4] = True   # distance 2 from (4,4)
        m[6, 4] = True   # distance 2 — row-major first wins
        m[4, 2] = True   # distance 2
        m[4, 6] = True   # distance 2
        x, y = (int(v) for v in snap_to_mask(
            jnp.asarray(4), jnp.asarray(4), jnp.asarray(m)))
        # np.nonzero order: (2,4) first
        assert (x, y) == (4, 2)

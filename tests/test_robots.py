import numpy as np

from eva_vos_tpu.annotator import ClickRobot, BboxRobot
import pytest

pytestmark = pytest.mark.smoke


def sq(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), dtype=bool)
    m[y0:y1, x0:x1] = True
    return m


class TestClickRobot:
    def setup_method(self):
        self.robot = ClickRobot()

    def test_middle_click_center(self):
        gt = sq(32, 32, 10, 20, 10, 20)
        clicks, labels = self.robot.middle_click(gt)
        assert labels.tolist() == [1]
        x, y = clicks[0]
        assert gt[y, x]
        assert 12 <= x <= 16 and 12 <= y <= 16

    def test_middle_click_snaps_into_concave_mask(self):
        # A ring: the median pixel falls in the hole and must snap onto it.
        gt = sq(40, 40, 10, 30, 10, 30) & ~sq(40, 40, 14, 26, 14, 26)
        clicks, labels = self.robot.middle_click(gt)
        x, y = clicks[0]
        assert gt[y, x]

    def test_false_negative_gives_positive_click(self):
        gt = sq(32, 32, 5, 25, 5, 25)
        pred = np.zeros_like(gt)
        clicks, labels = self.robot.interact(pred, gt)
        assert labels.tolist() == [1]
        x, y = clicks[0]
        assert gt[y, x]

    def test_false_positive_gives_negative_click(self):
        gt = np.zeros((32, 32), dtype=bool)
        gt[0, 0] = True  # keep gt nonempty elsewhere
        pred = sq(32, 32, 10, 26, 10, 26)
        clicks, labels = self.robot.interact(pred, gt)
        assert labels.tolist() == [0]
        x, y = clicks[0]
        assert pred[y, x] and not gt[y, x]

    def test_largest_error_region_wins(self):
        gt = sq(64, 64, 0, 30, 0, 30)
        # Prediction covers gt (no FN) plus a big FP blob -> negative click.
        pred = gt | sq(64, 64, 40, 64, 40, 64)
        clicks, labels = self.robot.interact(pred, gt)
        assert labels.tolist() == [0]
        x, y = clicks[0]
        assert 40 <= x < 64 and 40 <= y < 64

    def test_perfect_prediction_falls_back_to_middle(self):
        gt = sq(32, 32, 8, 24, 8, 24)
        clicks, labels = self.robot.interact(gt.copy(), gt)
        assert labels.tolist() == [1]
        x, y = clicks[0]
        assert gt[y, x]

    def test_low_iou_adds_positive_click(self):
        gt = sq(64, 64, 0, 20, 0, 20)
        pred = sq(64, 64, 40, 64, 40, 64)  # disjoint -> iou ~ 0
        clicks, labels = self.robot.interact(pred, gt, iou=0.01)
        assert labels.tolist() == [0, 1]
        assert gt[clicks[1][1], clicks[1][0]]

    def test_three_pos_clicks(self):
        gt = sq(16, 16, 4, 12, 4, 12)
        coords, labels = self.robot.three_pos_clicks(gt)
        assert coords.shape == (3, 2)
        np.testing.assert_array_equal(labels, [1, 1, 1])
        for x, y in coords:
            assert gt[y, x]
        # first/middle/last nonzero pixels in raster order
        ys, xs = np.nonzero(gt)
        np.testing.assert_array_equal(coords[0], [xs[0], ys[0]])
        np.testing.assert_array_equal(coords[2], [xs[-1], ys[-1]])

    def test_three_refinement_clicks_order(self):
        gt = sq(64, 64, 0, 10, 0, 10)           # small FN
        pred = sq(64, 64, 30, 64, 30, 64)       # big FP
        clicks, labels = self.robot.three_refinement_clicks(pred, gt)
        assert len(labels) == 2                  # only two error components
        assert labels.tolist() == [0, 1]         # FP is bigger, comes first


class TestBboxRobot:
    def test_box(self):
        gt = sq(32, 48, 4, 10, 6, 20)
        box = BboxRobot().interact(gt)
        np.testing.assert_array_equal(box[0], [6, 4, 19, 9])

import numpy as np
import pytest

from eva_vos_tpu.annotator import Annotator, FakeSAMController
from eva_vos_tpu.annotator.annotator import denormalize_to_uint8, EMPTY_GT_TOKEN
from eva_vos_tpu.ops.normalize import IMAGENET_MEAN, IMAGENET_STD
from eva_vos_tpu.ops.metrics import compute_iou
from eva_vos_tpu.utils import ANNOTATION_COSTS

pytestmark = pytest.mark.smoke


H, W = 96, 128


@pytest.fixture
def annotator():
    return Annotator(FakeSAMController(), prompt_type="c")


def normed_image():
    rng = np.random.default_rng(0)
    img01 = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    return (img01 - IMAGENET_MEAN) / IMAGENET_STD


def blob(y0, y1, x0, x1):
    m = np.zeros((H, W), dtype=np.float32)
    m[y0:y1, x0:x1] = 1
    return m


class TestDenormalize:
    def test_roundtrip(self):
        rng = np.random.default_rng(1)
        img01 = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
        out = denormalize_to_uint8((img01 - IMAGENET_MEAN) / IMAGENET_STD)
        np.testing.assert_allclose(out / 255.0, img01, atol=1 / 255 + 1e-6)


class TestGetMask:
    def test_empty_gt(self, annotator):
        mask, cost, quality, *_ = annotator.get_mask("mask", np.zeros((H, W)))
        assert cost == ANNOTATION_COSTS["no_object"]
        assert quality == EMPTY_GT_TOKEN
        assert mask.sum() == 0

    def test_mask_type_returns_gt(self, annotator):
        gt = blob(10, 40, 10, 50)
        mask, cost, quality, *_ = annotator.get_mask("mask", gt)
        assert cost == ANNOTATION_COSTS["mask"]
        assert quality == 1
        np.testing.assert_array_equal(mask, gt)

    def test_click_improves_with_more_prompts(self, annotator):
        gt = blob(20, 70, 30, 90)
        im = normed_image()
        _, cost1, iou1, logits, clicks, labels, bbox = annotator.get_mask(
            "click", gt, im=im, num_prompts=1)
        assert logits is not None and logits.shape == (1, 256, 256)
        assert cost1 == ANNOTATION_COSTS["click"] + ANNOTATION_COSTS["click_overhead"]

        _, cost3, iou3, *_ = annotator.get_mask("click", gt, im=im, num_prompts=3)
        assert iou3 >= iou1 - 1e-6
        assert cost3 > cost1

    def test_click_with_warm_start_from_mivos(self, annotator):
        gt = blob(20, 70, 30, 90)
        mivos = blob(24, 74, 34, 94)  # near-correct propagated mask
        im = normed_image()
        mask, cost, iou, *_ = annotator.get_mask(
            "click", gt, im=im, num_prompts=3, mivos_mask=mivos)
        assert iou > 0.2

    def test_bbox(self, annotator):
        gt = blob(16, 64, 40, 100)
        im = normed_image()
        mask, cost, iou, logits, clicks, labels, bbox = annotator.get_mask(
            "bbox", gt, im=im, num_prompts=1)
        assert cost == ANNOTATION_COSTS["bbox"]
        assert bbox is not None
        # FakeSAM fills the box exactly -> near-perfect IoU
        assert iou > 0.9

    def test_bbox_plus_refinement_clicks_cost(self, annotator):
        gt = blob(16, 64, 40, 100)
        im = normed_image()
        _, cost, iou, *_ = annotator.get_mask("bbox", gt, im=im, num_prompts=2)
        assert cost >= ANNOTATION_COSTS["bbox"] + ANNOTATION_COSTS["click"] \
            + ANNOTATION_COSTS["click_overhead"]

    def test_prev_iter_prompts_accumulate(self, annotator):
        gt = blob(20, 70, 30, 90)
        im = normed_image()
        m1, _, _, logits, clicks, labels, bbox = annotator.get_mask(
            "click", gt, im=im, num_prompts=1)
        prev = {"sam_logits": logits, "click_coords": clicks,
                "click_labels": labels, "bbox": bbox}
        _, _, iou2, _, clicks2, labels2, _ = annotator.get_mask(
            "click", gt, im=im, num_prompts=1, mivos_mask=m1,
            prev_iter_data=prev)
        assert len(labels2) > len(labels)  # prompts accumulated


class TestPromptTypes:
    def test_type_a_ignores_mivos_mask(self):
        """prompt_type 'a': no warm start — the first click is the gt
        middle click, regardless of the propagated mask."""
        ann_a = Annotator(FakeSAMController(), prompt_type="a")
        gt = blob(20, 70, 30, 90)
        mivos = blob(24, 74, 34, 94)
        im = normed_image()
        _, cost, _, _, clicks, labels, _ = ann_a.get_mask(
            "click", gt, im=im, num_prompts=1, mivos_mask=mivos)
        assert len(labels) == 1 and labels[0] == 1  # single positive click
        assert cost == ANNOTATION_COSTS["click"] + \
            ANNOTATION_COSTS["click_overhead"]

    def test_type_b_drops_previous_clicks(self):
        """prompt_type 'b': resume from logits only — prior clicks and
        boxes are discarded before the new round."""
        ann_b = Annotator(FakeSAMController(), prompt_type="b")
        gt = blob(20, 70, 30, 90)
        im = normed_image()
        m1, _, _, logits, clicks, labels, bbox = ann_b.get_mask(
            "click", gt, im=im, num_prompts=1)
        prev = {"sam_logits": logits, "click_coords": clicks,
                "click_labels": labels, "bbox": bbox}
        _, _, _, _, clicks2, labels2, bbox2 = ann_b.get_mask(
            "click", gt, im=im, num_prompts=1, mivos_mask=m1,
            prev_iter_data=prev)
        # only the fresh refinement clicks remain
        assert len(labels2) <= 2
        assert bbox2 is None

    def test_warm_start_skipped_for_empty_mivos(self, annotator):
        gt = blob(20, 70, 30, 90)
        im = normed_image()
        _, cost, iou, *_ = annotator.get_mask(
            "click", gt, im=im, num_prompts=1,
            mivos_mask=np.zeros((H, W), np.float32))
        assert cost == ANNOTATION_COSTS["click"] + \
            ANNOTATION_COSTS["click_overhead"]


class TestBestSamMask:
    def test_no_overlap_first_wins_via_smoothing(self, annotator):
        # Smoothed IoU of an empty mask is ~1e-8 > 0, so the first candidate
        # wins the strict-> comparison — matching the reference, where the
        # -1 "nothing matched" branch is unreachable for the same reason.
        gt = blob(0, 10, 0, 10)
        empty = np.zeros((3, 1, H, W), dtype=bool)
        iou, idx = annotator.best_sam_mask(empty, gt)
        assert idx == 0 and iou < 1e-6

    def test_first_strict_max_wins(self, annotator):
        gt = blob(0, 10, 0, 10).astype(bool)
        cands = np.stack([gt[None], gt[None], np.zeros_like(gt)[None]])
        iou, idx = annotator.best_sam_mask(cands, gt)
        assert idx == 0 and iou > 0.99

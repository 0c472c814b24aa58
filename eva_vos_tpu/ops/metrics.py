"""Segmentation quality metrics: smoothed IoU, boundary F-measure, J&F.

Parity target: ``interactions/metrics.py`` in the reference, which is itself
a port of the davisinteractive boundary measure.  The boundary pipeline
(``seg2bmap`` -> disk dilation -> precision/recall) runs host-side on numpy +
cv2, exactly like the reference; a jit-friendly jnp IoU is provided for
on-device batched evaluation.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

SMOOTH = 1e-6


# ---------------------------------------------------------------------------
# IoU (Jaccard)
# ---------------------------------------------------------------------------

def compute_iou(outputs, labels) -> float:
    """Smoothed IoU over a [B, H, W] batch, averaged (reference ``compute_iou``)."""
    outputs = np.asarray(outputs, dtype=bool)
    labels = np.asarray(labels, dtype=bool)
    assert outputs.ndim == labels.ndim == 3
    inter = np.logical_and(outputs, labels).sum(axis=(1, 2)).astype(np.float64)
    union = np.logical_or(outputs, labels).sum(axis=(1, 2)).astype(np.float64)
    iou = (inter + SMOOTH) / (union + SMOOTH)
    return float(iou.mean())


def binary_jaccard(pred, gt) -> float:
    """Unsmoothed binary Jaccard index (torchmetrics ``JaccardIndex`` binary
    semantics: 0.0 when the union is empty)."""
    pred = np.asarray(pred, dtype=bool)
    gt = np.asarray(gt, dtype=bool)
    inter = np.logical_and(pred, gt).sum()
    union = np.logical_or(pred, gt).sum()
    if union == 0:
        return 0.0
    return float(inter / union)


def compute_multi_class_iou_idx(seg, gt, smooth: float = 1e-6) -> float:
    """seg [H, W] predicted object ids (0 = bg); gt [K, H, W] one-hot.

    Mean smoothed IoU over the K object classes (reference
    ``tensor_util.py:41-50``).
    """
    seg = np.asarray(seg)
    gt = np.asarray(gt)
    k = gt.shape[0]
    total = 0.0
    for ki in range(k):
        pred = seg == (ki + 1)
        g = gt[ki] > 0.5
        inter = np.logical_and(pred, g).sum()
        union = np.logical_or(pred, g).sum()
        total += (inter + smooth) / (union + smooth)
    return float((total + smooth) / (k + smooth))


def compute_multi_class_iou_both_idx(seg, gt, smooth: float = 1e-6) -> float:
    """Both inputs are [H, W] object-id maps (reference
    ``tensor_util.py:52-59``)."""
    seg = np.asarray(seg)
    gt = np.asarray(gt)
    k = int(gt.max())
    total = 0.0
    for ki in range(1, k + 1):
        inter = np.logical_and(seg == ki, gt == ki).sum()
        union = np.logical_or(seg == ki, gt == ki).sum()
        total += (inter + smooth) / (union + smooth)
    return float((total + smooth) / (k + smooth))


def jnp_iou(pred, gt, smooth: float = SMOOTH):
    """jit-friendly smoothed IoU over the last two axes."""
    pred = pred.astype(bool)
    gt = gt.astype(bool)
    inter = jnp.sum(jnp.logical_and(pred, gt), axis=(-2, -1)).astype(jnp.float32)
    union = jnp.sum(jnp.logical_or(pred, gt), axis=(-2, -1)).astype(jnp.float32)
    return (inter + smooth) / (union + smooth)


# ---------------------------------------------------------------------------
# Boundary F-measure
# ---------------------------------------------------------------------------

def seg2bmap(seg: np.ndarray) -> np.ndarray:
    """1-pixel-wide binary boundary map, boundary pixels offset by half a
    pixel towards the origin (David Martin's convention, as used by DAVIS)."""
    seg = np.asarray(seg, dtype=bool)
    e = np.zeros_like(seg)
    s = np.zeros_like(seg)
    se = np.zeros_like(seg)
    e[:, :-1] = seg[:, 1:]
    s[:-1, :] = seg[1:, :]
    se[:-1, :-1] = seg[1:, 1:]
    b = (seg ^ e) | (seg ^ s) | (seg ^ se)
    b[-1, :] = seg[-1, :] ^ e[-1, :]
    b[:, -1] = seg[:, -1] ^ s[:, -1]
    b[-1, -1] = False
    return b


def disk(radius: int) -> np.ndarray:
    """Flat disk structuring element (skimage.morphology.disk semantics)."""
    radius = int(radius)
    y, x = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    return (x ** 2 + y ** 2 <= radius ** 2).astype(np.uint8)


def _dilate(binary: np.ndarray, selem: np.ndarray) -> np.ndarray:
    try:
        import cv2

        return cv2.dilate(binary.astype(np.uint8), selem)
    except ImportError:  # pragma: no cover
        from scipy import ndimage

        return ndimage.binary_dilation(binary, structure=selem.astype(bool)).astype(np.uint8)


def f_measure(true_mask, pred_mask, bound_th: float = 0.008) -> float:
    """Boundary F-measure between two 2D masks (davisinteractive semantics)."""
    true_mask = np.asarray(true_mask, dtype=bool)
    pred_mask = np.asarray(pred_mask, dtype=bool)
    assert true_mask.shape == pred_mask.shape

    bound_pix = bound_th if bound_th >= 1 else np.ceil(bound_th * np.linalg.norm(true_mask.shape))

    fg_boundary = seg2bmap(pred_mask)
    gt_boundary = seg2bmap(true_mask)

    selem = disk(bound_pix)
    fg_dil = _dilate(fg_boundary, selem)
    gt_dil = _dilate(gt_boundary, selem)

    gt_match = gt_boundary * fg_dil
    fg_match = fg_boundary * gt_dil

    n_fg = fg_boundary.sum()
    n_gt = gt_boundary.sum()

    if n_fg == 0 and n_gt > 0:
        precision, recall = 1.0, 0.0
    elif n_fg > 0 and n_gt == 0:
        precision, recall = 0.0, 1.0
    elif n_fg == 0 and n_gt == 0:
        precision, recall = 1.0, 1.0
    else:
        precision = float(fg_match.sum()) / float(n_fg)
        recall = float(gt_match.sum()) / float(n_gt)

    if precision + recall == 0:
        return 0.0
    return 2.0 * precision * recall / (precision + recall)


def get_j_and_f(gt_mask, pred_mask) -> float:
    """0.5 * Jaccard + 0.5 * boundary-F for [1, H, W] (or [H, W]) masks."""
    gt = np.asarray(gt_mask, dtype=bool)
    pred = np.asarray(pred_mask, dtype=bool)
    if gt.ndim == 3:
        gt2, pred2 = gt.squeeze(0), pred.squeeze(0)
    else:
        gt2, pred2 = gt, pred
    j = binary_jaccard(pred, gt)
    f = f_measure(gt2, pred2)
    return 0.5 * j + 0.5 * f


# ---------------------------------------------------------------------------
# Device-batched J&F (exact): integer counts on device, float64 assembly on
# host.  The host path costs ~13 ms/frame at 480p (seg2bmap + cv2 dilate per
# frame), i.e. ~0.8 s/round on a 60-frame video — more than the propagation
# step itself.  The batched version computes the SAME counts for all frames
# in one jitted call (shift/XOR boundary maps + one disk-kernel convolution)
# and reproduces get_j_and_f bit-for-bit because every division happens on
# host in float64 with identical edge-case branches.
# ---------------------------------------------------------------------------

def _jnp_seg2bmap(seg):
    """Batched seg2bmap: seg [T, H, W] bool -> boundary maps [T, H, W]."""
    e = jnp.zeros_like(seg).at[:, :, :-1].set(seg[:, :, 1:])
    s = jnp.zeros_like(seg).at[:, :-1, :].set(seg[:, 1:, :])
    se = jnp.zeros_like(seg).at[:, :-1, :-1].set(seg[:, 1:, 1:])
    b = (seg ^ e) | (seg ^ s) | (seg ^ se)
    b = b.at[:, -1, :].set(seg[:, -1, :] ^ e[:, -1, :])
    b = b.at[:, :, -1].set(seg[:, :, -1] ^ s[:, :, -1])
    return b.at[:, -1, -1].set(False)


def _jnp_dilate(b, selem):
    """Zero-padded binary dilation of [T, H, W] bool by a [k, k] 0/1
    structuring element: SAME conv in fp32 (integer counts <= k*k are
    exact) thresholded at > 0 — matches cv2.dilate / scipy
    binary_dilation border semantics."""
    k = selem.shape[0]
    kern = jnp.asarray(selem, jnp.float32)[..., None, None]   # [k, k, 1, 1]
    x = b.astype(jnp.float32)[..., None]                      # [T, H, W, 1]
    dn = jax.lax.conv_dimension_numbers(x.shape, kern.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    pad = ((k // 2, k // 2), (k // 2, k // 2))
    y = jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding=pad,
        dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST)
    return y[..., 0] > 0.0


@partial(jax.jit, static_argnames=("bound_pix",))
def _jf_counts(gt, pred, bound_pix: int):
    """Batched integer counts for J and boundary-F.

    gt/pred [T, H, W] bool -> [T, 6] int32:
    (inter, union, n_fg, n_gt, fg_match, gt_match).
    """
    gt = gt.astype(bool)
    pred = pred.astype(bool)
    inter = jnp.sum(gt & pred, axis=(1, 2), dtype=jnp.int32)
    union = jnp.sum(gt | pred, axis=(1, 2), dtype=jnp.int32)

    fg_b = _jnp_seg2bmap(pred)
    gt_b = _jnp_seg2bmap(gt)
    selem = jnp.asarray(disk(bound_pix))
    fg_dil = _jnp_dilate(fg_b, selem)
    gt_dil = _jnp_dilate(gt_b, selem)
    n_fg = jnp.sum(fg_b, axis=(1, 2), dtype=jnp.int32)
    n_gt = jnp.sum(gt_b, axis=(1, 2), dtype=jnp.int32)
    fg_match = jnp.sum(fg_b & gt_dil, axis=(1, 2), dtype=jnp.int32)
    gt_match = jnp.sum(gt_b & fg_dil, axis=(1, 2), dtype=jnp.int32)
    return jnp.stack([inter, union, n_fg, n_gt, fg_match, gt_match], axis=1)


@jax.jit
def _iou_counts(gt, pred):
    gt = gt.astype(bool)
    pred = pred.astype(bool)
    inter = jnp.sum(gt & pred, axis=(1, 2), dtype=jnp.int32)
    union = jnp.sum(gt | pred, axis=(1, 2), dtype=jnp.int32)
    return jnp.stack([inter, union], axis=1)


def quality_batch(gt_masks, pred_masks, metric: str):
    """Batched per-frame quality, bit-equal to the host loop:
    metric 'j' -> ``compute_iou(pred[None], gt[None])`` per frame (smoothed
    IoU); 'j_and_f' -> ``get_j_and_f``.  Counts on device, float64 on host.
    """
    if metric == "j_and_f":
        return j_and_f_batch(gt_masks, pred_masks)
    gt = _as_device_bool(gt_masks)
    pred = _as_device_bool(pred_masks)
    counts = np.asarray(_iou_counts(gt, pred), np.float64)
    return (counts[:, 0] + SMOOTH) / (counts[:, 1] + SMOOTH)


def _as_device_bool(x):
    """bool device array without a host round-trip for inputs already on
    device (sessions cache their gt stack there)."""
    if isinstance(x, jax.Array):
        return x.astype(bool)
    return jnp.asarray(np.asarray(x, dtype=bool))


def j_and_f_batch(gt_masks, pred_masks, bound_th: float = 0.008):
    """Batched exact J&F: gt/pred [T, H, W] (bool-like) -> [T] floats equal
    to ``get_j_and_f(gt[t][None], pred[t][None])`` for every t."""
    gt = _as_device_bool(gt_masks)
    pred = _as_device_bool(pred_masks)
    assert gt.shape == pred.shape and gt.ndim == 3
    h, w = gt.shape[1:]
    bound_pix = bound_th if bound_th >= 1 else int(
        np.ceil(bound_th * np.linalg.norm((h, w))))
    counts = np.asarray(_jf_counts(gt, pred, int(bound_pix)))
    out = []
    for inter, union, n_fg, n_gt, fg_match, gt_match in counts:
        j = 0.0 if union == 0 else float(inter) / float(union)
        if n_fg == 0 and n_gt > 0:
            precision, recall = 1.0, 0.0
        elif n_fg > 0 and n_gt == 0:
            precision, recall = 0.0, 1.0
        elif n_fg == 0 and n_gt == 0:
            precision, recall = 1.0, 1.0
        else:
            precision = float(fg_match) / float(n_fg)
            recall = float(gt_match) / float(n_gt)
        f = (0.0 if precision + recall == 0
             else 2.0 * precision * recall / (precision + recall))
        out.append(0.5 * j + 0.5 * f)
    return np.asarray(out, dtype=np.float64)

"""Predictor wrapper with the official ``SamPredictor`` contract, plus the
reference's controller facade.

Behavior parity targets:
* official predictor semantics: longest-side resize to img_size, pixel
  normalization, bottom-right padding, coordinate transforms, multimask
  selection, low-res logit round-tripping, mask threshold 0.0;
* ``sam/sam_controller.py`` in the reference: ``set_image`` embeds once,
  ``reset_image``, ``predict(click_coords, click_labels, bbox, mask_input,
  multimask_output)`` -> (masks [n, 1, H, W], scores, logits [n, 256, 256]).

TPU notes: prompts are padded to ``max_points`` so every click count hits
one compiled decode; the image encode is one jitted call on the fixed
img_size square.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .build import Sam, SamConfig, PIXEL_MEAN, PIXEL_STD
from .prompt_encoder import PAD_LABEL, NOT_A_POINT
from ...ops.metrics import SMOOTH

MASK_THRESHOLD = 0.0


def get_preprocess_shape(oldh: int, oldw: int, long_side: int):
    scale = long_side * 1.0 / max(oldh, oldw)
    newh, neww = oldh * scale, oldw * scale
    return int(newh + 0.5), int(neww + 0.5)


class SamPredictor:
    def __init__(self, sam: Sam, params, max_points: int = 64):
        self.sam = sam
        self.params = params
        self.cfg: SamConfig = sam.config
        self.max_points = max_points

        self._encode = jax.jit(
            lambda p, x: sam.apply(p, x, method="encode_image"))
        self._decode = jax.jit(
            lambda p, emb, c, l, m, hm: sam.apply(
                p, emb, c, l, m, hm, method="decode"))
        self._decode_batch = jax.jit(
            lambda p, emb, c, l, m, hm: jax.vmap(
                lambda e_, c_, l_, m_, hm_: sam.apply(
                    p, e_, c_, l_, m_, hm_, method="decode"),
            )(emb, c, l, m, hm))
        self._upscale = jax.jit(self._upscale_fn)
        self._select_cache = {}  # (sel_start, n_sel, orig, input) -> jitted

        self.reset_image()

    # ------------------------------------------------------------------
    def reset_image(self):
        self.features = None
        self.original_size = None
        self.input_size = None
        self.is_image_set = False

    def set_image(self, image: np.ndarray):
        """image: uint8 RGB [H, W, 3]."""
        assert image.ndim == 3 and image.shape[2] == 3
        self.original_size = image.shape[:2]
        newh, neww = get_preprocess_shape(*self.original_size, self.cfg.img_size)
        self.input_size = (newh, neww)

        x = jnp.asarray(image, jnp.float32)
        x = jax.image.resize(x, (newh, neww, 3), method="bilinear")
        x = (x - jnp.asarray(PIXEL_MEAN)) / jnp.asarray(PIXEL_STD)
        x = jnp.pad(x, ((0, self.cfg.img_size - newh),
                        (0, self.cfg.img_size - neww), (0, 0)))
        emb = self._encode(self.params, x[None].astype(self.sam.dtype))
        self.features = emb[0]  # [S, S, 256]
        self.is_image_set = True

    def get_image_embedding(self) -> np.ndarray:
        """[256, S, S] channel-first, mirroring the official API."""
        assert self.is_image_set
        return np.transpose(np.asarray(self.features, np.float32), (2, 0, 1))

    # ------------------------------------------------------------------
    def _transform_coords(self, coords):
        oldh, oldw = self.original_size
        newh, neww = self.input_size
        c = np.asarray(coords, np.float32).copy()
        c[..., 0] *= neww / oldw
        c[..., 1] *= newh / oldh
        return c

    def _build_prompts(self, point_coords, point_labels, box):
        coords = np.zeros((self.max_points, 2), np.float32)
        labels = np.full((self.max_points,), PAD_LABEL, np.int32)
        n = 0
        if point_coords is not None:
            pts = self._transform_coords(point_coords)
            k = len(pts)
            assert k + 3 <= self.max_points, (
                f"too many prompt points ({k}) for max_points="
                f"{self.max_points}")
            coords[:k] = pts
            labels[:k] = np.asarray(point_labels, np.int32)
            n = k
            if box is None:
                # official pads points with one not-a-point when no box
                labels[n] = NOT_A_POINT
                n += 1
        if box is not None:
            b = self._transform_coords(np.asarray(box, np.float32)
                                       .reshape(2, 2))
            coords[n:n + 2] = b
            labels[n:n + 2] = (2, 3)
            n += 2
        return coords, labels

    def _upscale_fn(self, masks):
        """low-res logits [n, S4, S4] -> img_size logits [n, I, I]."""
        n = masks.shape[0]
        return jax.image.resize(
            masks, (n, self.cfg.img_size, self.cfg.img_size),
            method="bilinear")

    def postprocess_masks(self, low_res_masks):
        """[n, low, low] logits -> [n, H, W] logits at the original size."""
        up = self._upscale(low_res_masks)
        up = up[:, :self.input_size[0], :self.input_size[1]]
        out = jax.image.resize(
            up, (up.shape[0], *self.original_size), method="bilinear")
        return out

    def predict(self, point_coords=None, point_labels=None, box=None,
                mask_input=None, multimask_output: bool = True,
                return_logits: bool = False):
        """Returns (masks [n, H, W] bool, iou_predictions [n],
        low_res_logits [n, low, low]) like the official predictor."""
        assert self.is_image_set, "set_image must be called before predict"
        coords, labels = self._build_prompts(point_coords, point_labels, box)

        if mask_input is not None:
            m = jnp.asarray(np.asarray(mask_input, np.float32).squeeze())
            has_mask = True
        else:
            m = jnp.zeros((self.cfg.low_res, self.cfg.low_res), jnp.float32)
            has_mask = False

        all_masks, all_iou = self._decode(
            self.params, self.features, jnp.asarray(coords),
            jnp.asarray(labels), m.astype(self.sam.dtype),
            jnp.asarray(has_mask))

        if multimask_output:
            sel = slice(1, None)
        else:
            sel = slice(0, 1)
        low_res = np.asarray(all_masks[sel], np.float32)
        iou = np.asarray(all_iou[sel], np.float32)

        masks = np.asarray(self.postprocess_masks(jnp.asarray(low_res)))
        if not return_logits:
            masks = masks > MASK_THRESHOLD
        return masks, iou, low_res


    # ------------------------------------------------------------------
    # fused decode + best-mask selection (interactive refinement loops)
    # ------------------------------------------------------------------
    def _build_decode_select(self, sel_start: int, n_sel: int,
                             original_size, input_size,
                             pack_bits: bool = True):
        """One jitted graph: decode -> upscale -> threshold -> per-mask
        intersection/union vs a target.  The refinement loops
        (``annotator.py`` warm start + click rounds) call ``predict`` once
        per click and fetch FULL-RES fp32 logits to the host every round
        (~5 MB) just to pick the best of 3 masks — through a tunneled
        device that transfer dominates the whole chain
        (experiments/r4_sync_probe.py: device_get ~13 MB/s).  Fusing the
        selection math on device shrinks the per-round fetch to 2 int
        vectors + one bit-packed mask."""
        cfg = self.cfg
        sam = self.sam

        def fused(params, emb, coords, labels, m, hm, tgt):
            low, _ = sam.apply(params, emb, coords, labels, m, hm,
                               method="decode")
            low = low[sel_start:sel_start + n_sel]
            up = jax.image.resize(
                low.astype(jnp.float32),
                (n_sel, cfg.img_size, cfg.img_size), method="bilinear")
            up = up[:, :input_size[0], :input_size[1]]
            full = jax.image.resize(up, (n_sel, *original_size),
                                    method="bilinear")
            pred = full > MASK_THRESHOLD
            t = tgt[None]
            inter = jnp.sum(pred & t, axis=(1, 2), dtype=jnp.int32)
            union = jnp.sum(pred | t, axis=(1, 2), dtype=jnp.int32)
            packed = (jnp.packbits(pred, axis=-1) if pack_bits
                      else pred.astype(jnp.uint8))
            return inter, union, packed, low

        return jax.jit(fused)

    def predict_select(self, target_mask, point_coords=None,
                       point_labels=None, box=None, mask_input=None,
                       multimask_output: bool = True):
        """Decode and pick the highest-IoU mask vs ``target_mask`` without
        round-tripping full-resolution logits through the host.

        Semantics match ``predict`` + the reference's ``best_sam_mask``
        (``annotator/annotator.py:38-57``): smoothed IoU, first strict
        improvement wins, ``idx == -1`` (-> last mask) when every candidate
        has zero IoU.  Returns ``(mask [H, W] bool, max_iou, idx,
        low_res_logits [low, low] DEVICE array)`` — the logits stay on
        device so the next round's ``mask_input`` costs no transfer.
        """
        assert self.is_image_set, "set_image must be called before predict"
        coords, labels = self._build_prompts(point_coords, point_labels, box)

        if mask_input is not None:
            m = jnp.asarray(mask_input)
            m = m.reshape(m.shape[-2:])
            has_mask = True
        else:
            m = jnp.zeros((self.cfg.low_res, self.cfg.low_res), jnp.float32)
            has_mask = False

        sel_start, n_sel = (1, 3) if multimask_output else (0, 1)
        key = (sel_start, n_sel, self.original_size, self.input_size)
        entry = self._select_cache.get(key)
        if entry is None:
            entry = [self._build_decode_select(
                sel_start, n_sel, self.original_size, self.input_size,
                pack_bits=True), True]
            self._select_cache[key] = entry

        tgt = jnp.asarray(np.asarray(target_mask).squeeze().astype(bool))
        args = (self.params, self.features, jnp.asarray(coords),
                jnp.asarray(labels), m.astype(self.sam.dtype),
                jnp.asarray(has_mask), tgt)
        try:
            inter, union, packed, low = entry[0](*args)
        except Exception:
            if not entry[1]:
                raise
            # packbits may not lower on every backend: fall back once to a
            # uint8 mask transfer (8x the bytes, same semantics)
            entry[0] = self._build_decode_select(
                sel_start, n_sel, self.original_size, self.input_size,
                pack_bits=False)
            entry[1] = False
            inter, union, packed, low = entry[0](*args)

        inter = np.asarray(inter, np.float64)
        union = np.asarray(union, np.float64)
        ious = (inter + SMOOTH) / (union + SMOOTH)
        mask_idx, max_iou = -1, 0.0
        for ii in range(n_sel):
            if ious[ii] > max_iou:
                mask_idx, max_iou = ii, float(ious[ii])
        eff = mask_idx if mask_idx >= 0 else n_sel - 1

        sel = np.asarray(packed[eff])
        if entry[1]:  # bit-packed transfer
            mask = np.unpackbits(sel, axis=-1,
                                 count=self.original_size[1]).astype(bool)
        else:
            mask = sel.astype(bool)
        return mask, max_iou, mask_idx, low[eff]

    # ------------------------------------------------------------------
    # batched paths (vectorized PPO envs)
    # ------------------------------------------------------------------
    def encode_images(self, images) -> jnp.ndarray:
        """Batch-encode N uint8 RGB images (each resized/padded to the SAM
        square) -> features [N, S, S, 256].  All images must share one
        (H, W) so the batch has a single preprocess geometry."""
        sizes = {im.shape[:2] for im in images}
        assert len(sizes) == 1, "batched encode requires equal image sizes"
        oldh, oldw = next(iter(sizes))
        newh, neww = get_preprocess_shape(oldh, oldw, self.cfg.img_size)

        batch = jnp.asarray(np.stack(images), jnp.float32)
        batch = jax.image.resize(batch, (len(images), newh, neww, 3),
                                 method="bilinear")
        batch = (batch - jnp.asarray(PIXEL_MEAN)) / jnp.asarray(PIXEL_STD)
        batch = jnp.pad(batch, ((0, 0), (0, self.cfg.img_size - newh),
                                (0, self.cfg.img_size - neww), (0, 0)))
        return self._encode(self.params, batch.astype(self.sam.dtype))

    def predict_batch(self, features, original_size, prompts,
                      multimask_output: bool = True):
        """Decode N prompt sets against N precomputed features in ONE
        compiled call (vmapped over the batch).

        features: [N, S, S, 256]; prompts: list of dicts with optional
        point_coords/point_labels/box/mask_input, in original pixel space.
        Returns per-item (masks [n, H, W] bool, iou [n], low_res [n, l, l]).
        """
        self.original_size = original_size
        self.input_size = get_preprocess_shape(*original_size,
                                               self.cfg.img_size)
        coords, labels, mask_ins, has_masks = [], [], [], []
        for pr in prompts:
            c, l = self._build_prompts(pr.get("point_coords"),
                                       pr.get("point_labels"),
                                       pr.get("box"))
            coords.append(c)
            labels.append(l)
            mi = pr.get("mask_input")
            if mi is not None:
                mask_ins.append(np.asarray(mi, np.float32).squeeze())
                has_masks.append(True)
            else:
                mask_ins.append(np.zeros((self.cfg.low_res, self.cfg.low_res),
                                         np.float32))
                has_masks.append(False)

        all_masks, all_iou = self._decode_batch(
            self.params, features, jnp.asarray(np.stack(coords)),
            jnp.asarray(np.stack(labels)),
            jnp.asarray(np.stack(mask_ins)).astype(self.sam.dtype),
            jnp.asarray(has_masks))

        sel = slice(1, None) if multimask_output else slice(0, 1)
        out = []
        for i in range(len(prompts)):
            low_res = np.asarray(all_masks[i, sel], np.float32)
            iou = np.asarray(all_iou[i, sel], np.float32)
            masks = np.asarray(self.postprocess_masks(jnp.asarray(low_res)))
            out.append((masks > MASK_THRESHOLD, iou, low_res))
        return out


class SAMController:
    """Reference-API facade (``sam/sam_controller.py``) over the predictor."""

    def __init__(self, predictor: SamPredictor, verbose: bool = False):
        self.predictor = predictor
        self.embedded = False
        if verbose:
            print("Initializing JAX SAM")

    def set_image(self, image: np.ndarray):
        if self.embedded:
            print("repeat embedding, please reset_image.")
            return
        self.predictor.set_image(image)
        self.embedded = True

    def reset_image(self):
        self.predictor.reset_image()
        self.embedded = False

    def get_image_embedding(self) -> np.ndarray:
        return self.predictor.get_image_embedding()

    def export_embedding_state(self):
        """Opaque embedding state for caching (the on-device features plus
        the size bookkeeping) — same-frame re-annotation rounds restore it
        instead of re-running the ViT-H encoder (the reference re-embeds
        every round, ``mulitple_annotations.py:291``)."""
        assert self.embedded
        p = self.predictor
        return (p.features, p.original_size, p.input_size)

    def restore_embedding_state(self, state):
        p = self.predictor
        p.features, p.original_size, p.input_size = state
        p.is_image_set = True
        self.embedded = True

    def predict(self, click_coords=None, click_labels=None, bbox=None,
                mask_input=None, multimask_output=True):
        assert self.embedded, "prediction called before set_image"
        masks, scores, logits = self.predictor.predict(
            point_coords=click_coords, point_labels=click_labels, box=bbox,
            mask_input=mask_input, multimask_output=multimask_output)
        return masks[:, None], scores, logits  # [n, 1, H, W]

    def predict_select(self, target_mask, click_coords=None,
                       click_labels=None, bbox=None, mask_input=None,
                       multimask_output=True):
        """Fused decode + best-vs-target selection (see
        ``SamPredictor.predict_select``)."""
        assert self.embedded, "prediction called before set_image"
        return self.predictor.predict_select(
            target_mask, point_coords=click_coords,
            point_labels=click_labels, box=bbox, mask_input=mask_input,
            multimask_output=multimask_output)

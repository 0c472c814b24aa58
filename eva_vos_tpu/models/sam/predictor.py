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
        # device mirror of the last predict_select target: the warm-start
        # chain calls predict_select ~21x with the SAME host array (and the
        # click rounds with the same gt), so uploading the [H, W] bool once
        # removes a ~0.4 MB host->device transfer per decode
        self._tgt_cache = None  # (host array ref, device array)

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
        # f32 x f32 products, matching the fused warm-start chain's
        # on-device transform bit-for-bit
        c[..., 0] *= np.float32(neww / oldw)
        c[..., 1] *= np.float32(newh / oldh)
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
        """One jitted graph: decode -> upscale -> threshold -> best-mask
        SELECTION vs a target, entirely on device.  The refinement loops
        (``annotator.py`` warm start + click rounds) call ``predict`` once
        per click and fetch FULL-RES fp32 logits to the host every round
        (~5 MB) just to pick the best of 3 masks — through a tunneled
        device that transfer dominates the whole chain
        (experiments/r4_sync_probe.py: device_get ~13 MB/s).  r4 fused the
        IoU math but still made THREE host round-trips per call (inter,
        union, then packed[idx]); r5 selects on device so ONE fetch
        returns (best_iou, idx, best packed mask).

        Selection order is the EXACT rational order of the smoothed IoUs
        (cross-multiplied int64 comparison; the s^2 terms cancel and the
        s-scale tie-break |s*d2| < 1 can never override an integer
        difference |d1| >= 1), with later candidates winning only on
        strict improvement — the reference ``best_sam_mask`` scan
        (``annotator.py:38-57``: first max wins)."""
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

            def cross_gt(ia, ua, ib, ub):
                """Exact ia/ua > ib/ub for pixel counts (< 2^20) without
                64-bit ints (TPU): the fp32 cross-product sign is reliable
                when |d| is large (error <= ~2^15 at |d| ~ 2^38), and the
                int32 WRAPPING cross-product is exact whenever the true
                |d| < 2^31 — the fp32 magnitude test selects which one
                applies, with orders of margin between the regimes.
                Smoothed-IoU tie-break: equal rationals order by
                s*((ia+ub) - (ib+ua)) (the s^2 terms cancel; |s*d2| < 1
                can never override an integer |d1| >= 1)."""
                f = jnp.float32
                approx = ia.astype(f) * ub.astype(f) - \
                    ib.astype(f) * ua.astype(f)
                d32 = ia * ub - ib * ua          # wraps; exact iff |d|<2^31
                small = jnp.abs(approx) < jnp.float32(2 ** 29)
                gt = jnp.where(small, d32 > 0, approx > 0)
                eq = jnp.where(small, d32 == 0, False)
                d2 = (ia + ub) - (ib + ua)
                return gt | (eq & (d2 > 0))

            # first strict max wins, exactly the reference best_sam_mask
            # scan; the raw (inter, union) counts come back so the host
            # assembles the smoothed IoU in float64, bit-equal to
            # compute_iou
            bi, bu, idx = inter[0], union[0], jnp.int32(0)
            for k in range(1, n_sel):
                better = cross_gt(inter[k], union[k], bi, bu)
                bi = jnp.where(better, inter[k], bi)
                bu = jnp.where(better, union[k], bu)
                idx = jnp.where(better, jnp.int32(k), idx)
            best_pred = jnp.take(pred, idx, axis=0)
            packed = (jnp.packbits(best_pred, axis=-1) if pack_bits
                      else best_pred.astype(jnp.uint8))
            return bi, bu, idx, packed, jnp.take(low, idx, axis=0)

        return jax.jit(fused)

    def predict_select(self, target_mask, point_coords=None,
                       point_labels=None, box=None, mask_input=None,
                       multimask_output: bool = True):
        """Decode and pick the highest-IoU mask vs ``target_mask`` without
        round-tripping full-resolution logits through the host.

        Semantics match ``predict`` + the reference's ``best_sam_mask``
        (``annotator/annotator.py:38-57``): smoothed IoU, first strict
        improvement wins (smoothed IoUs are always > 0, so the reference's
        ``idx == -1`` all-zero branch is unreachable and ``idx`` is always
        a real candidate).  Returns ``(mask [H, W] bool, max_iou, idx,
        low_res_logits [low, low] DEVICE array)`` — the logits stay on
        device so the next round's ``mask_input`` costs no transfer, and
        the whole call makes ONE host round-trip (best iou + idx + the
        bit-packed best mask, fetched together).

        ``target_mask`` may be a host array (uploaded once and cached by
        object identity — the warm-start/click loops reuse one target) or
        an already-device bool array.
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

        if isinstance(target_mask, jax.Array):
            tgt = target_mask.astype(bool)
        else:
            cached = self._tgt_cache
            if cached is not None and cached[0] is target_mask:
                tgt = cached[1]
            else:
                tgt = jnp.asarray(
                    np.asarray(target_mask).squeeze().astype(bool))
                self._tgt_cache = (target_mask, tgt)
        args = (self.params, self.features, jnp.asarray(coords),
                jnp.asarray(labels), m.astype(self.sam.dtype),
                jnp.asarray(has_mask), tgt)
        try:
            bi, bu, idx_d, packed, low = entry[0](*args)
        except Exception:
            if not entry[1]:
                raise
            # packbits may not lower on every backend: fall back once to a
            # uint8 mask transfer (8x the bytes, same semantics)
            entry[0] = self._build_decode_select(
                sel_start, n_sel, self.original_size, self.input_size,
                pack_bits=False)
            entry[1] = False
            bi, bu, idx_d, packed, low = entry[0](*args)

        bi, bu, mask_idx, sel = jax.device_get((bi, bu, idx_d, packed))
        # float64 smoothed IoU, bit-equal to ops.metrics.compute_iou
        max_iou = float((np.float64(bi) + SMOOTH) / (np.float64(bu) + SMOOTH))
        mask_idx = int(mask_idx)
        if entry[1]:  # bit-packed transfer
            mask = np.unpackbits(sel, axis=-1,
                                 count=self.original_size[1]).astype(bool)
        else:
            mask = sel.astype(bool)
        return mask, max_iou, mask_idx, low

    # ------------------------------------------------------------------
    # fused warm-start chain (one dispatch for the whole refinement loop)
    # ------------------------------------------------------------------
    def _build_warmstart(self, original_size, input_size, max_tries: int,
                         threshold: float, pack_bits: bool = True):
        """The reference warm start (``annotator.py:60-107``) as ONE device
        program: middle click -> decode -> best-of-3 select -> click-robot
        refinement -> decode ... until smoothed IoU > threshold or
        ``max_tries`` refinements, with the click robot's connected-
        component selection on device (``ops.components``, bit-identical
        to the scipy/native host robot).

        Rationale: each tunnel round-trip costs ~31 ms
        (experiments/r5_sam_profile.json ``rtt_trivial_dispatch_fetch_ms``)
        and the worst-case chain makes 21 sequential decodes — host-looped
        that is >650 ms of pure RTT; fused it is one dispatch + one fetch.

        The IoU stop test is exact: for threshold p/q (q > p), smoothed
        (i+s)/(u+s) > p/q  <=>  q*i - p*u >= 0 in integers (the s term
        only breaks exact-boundary ties upward, which >= covers).
        """
        from fractions import Fraction

        from ...ops.components import middle_click, click_robot_interact

        cfg = self.cfg
        sam = self.sam
        frac = Fraction(str(threshold))
        p_num, q_den = frac.numerator, frac.denominator
        assert p_num < q_den, "warm-start threshold must be < 1"
        h, w = original_size
        scale = np.float32(input_size[1] / w), np.float32(input_size[0] / h)
        max_pts = self.max_points
        assert max_tries + 4 <= max_pts
        slot = jnp.arange(max_pts, dtype=jnp.int32)

        def decode_select(params, emb, clicks, labels, n, m, hm, tgt):
            c = jnp.stack([clicks[:, 0] * scale[0],
                           clicks[:, 1] * scale[1]], axis=1)
            lab = jnp.where(slot < n, labels, PAD_LABEL)
            lab = jnp.where(slot == n, NOT_A_POINT, lab)  # no box
            low, _ = sam.apply(params, emb, c.astype(jnp.float32), lab,
                               m.astype(sam.dtype), hm, method="decode")
            low = low[1:4]                                 # multimask
            up = jax.image.resize(low.astype(jnp.float32),
                                  (3, cfg.img_size, cfg.img_size),
                                  method="bilinear")
            up = up[:, :input_size[0], :input_size[1]]
            full = jax.image.resize(up, (3, h, w), method="bilinear")
            pred = full > MASK_THRESHOLD
            t = tgt[None]
            inter = jnp.sum(pred & t, axis=(1, 2), dtype=jnp.int32)
            union = jnp.sum(pred | t, axis=(1, 2), dtype=jnp.int32)

            def cross_gt(ia, ua, ib, ub):
                f = jnp.float32
                approx = ia.astype(f) * ub.astype(f) - \
                    ib.astype(f) * ua.astype(f)
                d32 = ia * ub - ib * ua
                small = jnp.abs(approx) < jnp.float32(2 ** 29)
                gt = jnp.where(small, d32 > 0, approx > 0)
                eq = jnp.where(small, d32 == 0, False)
                d2 = (ia + ub) - (ib + ua)
                return gt | (eq & (d2 > 0))

            bi, bu, idx = inter[0], union[0], jnp.int32(0)
            for k in range(1, 3):
                better = cross_gt(inter[k], union[k], bi, bu)
                bi = jnp.where(better, inter[k], bi)
                bu = jnp.where(better, union[k], bu)
                idx = jnp.where(better, jnp.int32(k), idx)
            return bi, bu, jnp.take(pred, idx, axis=0), \
                jnp.take(low, idx, axis=0)

        def chain(params, emb, tgt):
            mx, my = middle_click(tgt)
            clicks = jnp.zeros((max_pts, 2), jnp.float32)
            labels = jnp.full((max_pts,), PAD_LABEL, jnp.int32)
            clicks = clicks.at[0, 0].set(mx.astype(jnp.float32))
            clicks = clicks.at[0, 1].set(my.astype(jnp.float32))
            labels = labels.at[0].set(1)
            n = jnp.int32(1)
            m0 = jnp.zeros((cfg.low_res, cfg.low_res), jnp.float32)
            bi, bu, best_pred, best_low = decode_select(
                params, emb, clicks, labels, n, m0, jnp.asarray(False), tgt)
            done = q_den * bi - p_num * bu >= 0

            def cond(s):
                return (~s[0]) & (s[1] < max_tries)

            def body(s):
                _, t, clicks, labels, n, bi, bu, best_pred, best_low = s
                x, y, lab = click_robot_interact(best_pred, tgt)
                clicks = jax.lax.dynamic_update_slice(
                    clicks,
                    jnp.stack([x, y]).astype(jnp.float32)[None],
                    (n, jnp.int32(0)))
                labels = jax.lax.dynamic_update_slice(labels, lab[None], (n,))
                n = n + 1
                bi, bu, best_pred, best_low = decode_select(
                    params, emb, clicks, labels, n, best_low,
                    jnp.asarray(True), tgt)
                done = q_den * bi - p_num * bu >= 0
                return (done, t + 1, clicks, labels, n, bi, bu, best_pred,
                        best_low)

            state = (done, jnp.int32(0), clicks, labels, n, bi, bu,
                     best_pred, best_low)
            done, t, clicks, labels, n, bi, bu, best_pred, best_low = \
                jax.lax.while_loop(cond, body, state)
            packed = (jnp.packbits(best_pred, axis=-1) if pack_bits
                      else best_pred.astype(jnp.uint8))
            return done, n, clicks, labels, bi, bu, packed, best_low

        return jax.jit(chain)

    def warmstart_select(self, pred_mask, threshold: float = 0.8,
                         max_tries: int = 20):
        """Fused warm start: returns ``(ok, low_res_logits [low, low]
        DEVICE array, mask [H, W] bool, clicks [n, 2], labels [n])`` with
        semantics identical to the host ``create_similar_samlogits`` loop
        (``annotator/annotator.py``).  ``ok`` False mirrors the host
        returning Nones after ``max_tries`` failed refinements."""
        assert self.is_image_set
        key = ("warm", self.original_size, self.input_size, max_tries,
               threshold)
        entry = self._select_cache.get(key)
        if entry is None:
            entry = [self._build_warmstart(
                self.original_size, self.input_size, max_tries, threshold,
                pack_bits=True), True]
            self._select_cache[key] = entry

        if isinstance(pred_mask, jax.Array):
            tgt = pred_mask.astype(bool)
        else:
            cached = self._tgt_cache
            if cached is not None and cached[0] is pred_mask:
                tgt = cached[1]
            else:
                tgt = jnp.asarray(
                    np.asarray(pred_mask).squeeze().astype(bool))
                self._tgt_cache = (pred_mask, tgt)

        try:
            done, n, clicks, labels, bi, bu, packed, low = entry[0](
                self.params, self.features, tgt)
        except Exception:
            if not entry[1]:
                raise
            entry[0] = self._build_warmstart(
                self.original_size, self.input_size, max_tries, threshold,
                pack_bits=False)
            entry[1] = False
            done, n, clicks, labels, bi, bu, packed, low = entry[0](
                self.params, self.features, tgt)

        ok, n, clicks, labels, sel = jax.device_get(
            (done, n, clicks, labels, packed))
        if not bool(ok):
            return False, None, None, None, None
        n = int(n)
        if entry[1]:
            mask = np.unpackbits(sel, axis=-1,
                                 count=self.original_size[1]).astype(bool)
        else:
            mask = sel.astype(bool)
        return True, low, mask, clicks[:n].astype(np.float64), labels[:n]

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

    def warmstart_select(self, pred_mask, threshold: float = 0.8,
                         max_tries: int = 20):
        """Fused single-dispatch warm-start chain (see
        ``SamPredictor.warmstart_select``)."""
        assert self.embedded, "prediction called before set_image"
        return self.predictor.warmstart_select(pred_mask,
                                               threshold=threshold,
                                               max_tries=max_tries)

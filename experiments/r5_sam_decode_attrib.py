"""r5: attribute the fused SAM decode's ~42 ms device cost.

BENCH run4 measured sam_decode_device_ms 42.08 (warm-start chain / 21)
and sam_decode_ms 37.64 per fused predict_select call — ~10-20x the
analytic cost of the mask decoder (+ two bilinear resizes).  This script
times each stage of the fused graph separately on-chip:

  1. decode only              (two-way transformer + upscale convs)
  2. decode + 256->1024 resize
  3. decode + both resizes (to 480x854)
  4. full fused predict_select graph (threshold + IoU select + packbits)

and, for the warm-start chain, one fori_loop step in isolation.  Each
stage is jitted with the same input signature as production and timed
with a device_get sync (window timing, 20 reps).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("EVAVOS_JAX_CACHE", "/tmp/evavos_xla_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/evavos_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from eva_vos_tpu.models.sam import build_sam
from eva_vos_tpu.models.sam.predictor import (SamPredictor, MASK_THRESHOLD,
                                              get_preprocess_shape)
from eva_vos_tpu.data import synthetic_video
from eva_vos_tpu.ops.normalize import im_normalize

OUT = Path(__file__).with_suffix(".json")
res = {}


def bench_fn(fn, args, reps=20, sync=None):
    out = fn(*args)
    jax.block_until_ready(out)
    # true sync through the tunnel: fetch one element
    leaf = jax.tree.leaves(out)[0]
    jax.device_get(jnp.ravel(leaf)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    jax.device_get(jnp.ravel(leaf)[0])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    h, w = 480, 854
    sam, params = build_sam("vit_h", dtype=jnp.bfloat16, seed=0)
    pred = SamPredictor(sam, params)
    images, gt = synthetic_video(4, h, w, num_objects=1, seed=7)
    frame = (np.asarray(im_normalize(images[1])) * 255).astype(np.uint8) \
        if images.max() <= 1.0 else images[1].astype(np.uint8)
    # predictor takes uint8 RGB
    frame = (images[1] * 255).astype(np.uint8)
    t0 = time.perf_counter()
    pred.set_image(frame)
    jax.block_until_ready(pred.features)
    print(f"encode (compile+run): {time.perf_counter() - t0:.1f}s",
          flush=True)

    cfg = pred.cfg
    original_size, input_size = pred.original_size, pred.input_size
    coords, labels = pred._build_prompts(
        np.array([[400.0, 200.0]]), np.array([1]), None)
    coords_d = jnp.asarray(coords)
    labels_d = jnp.asarray(labels)
    m0 = jnp.zeros((cfg.low_res, cfg.low_res), sam.dtype)
    hm = jnp.asarray(False)
    tgt = jnp.asarray(gt[0, 1].astype(bool))
    emb = pred.features
    P = pred.params

    # --- stage 1: decode only ------------------------------------------
    dec = jax.jit(lambda p, e, c, l, m, f: sam.apply(
        p, e, c, l, m, f, method="decode"))
    res["decode_only_ms"] = bench_fn(dec, (P, emb, coords_d, labels_d, m0, hm))
    print("decode_only_ms", res["decode_only_ms"], flush=True)

    # --- stage 2: + first resize (low 256 -> img_size 1024) -------------
    def dec_up(p, e, c, l, m, f):
        low, iou = sam.apply(p, e, c, l, m, f, method="decode")
        low = low[1:4]
        up = jax.image.resize(low.astype(jnp.float32),
                              (3, cfg.img_size, cfg.img_size),
                              method="bilinear")
        return up, iou

    res["decode_up1024_ms"] = bench_fn(
        jax.jit(dec_up), (P, emb, coords_d, labels_d, m0, hm))
    print("decode_up1024_ms", res["decode_up1024_ms"], flush=True)

    # --- stage 3: + second resize to original ---------------------------
    def dec_up_full(p, e, c, l, m, f):
        low, iou = sam.apply(p, e, c, l, m, f, method="decode")
        low = low[1:4]
        up = jax.image.resize(low.astype(jnp.float32),
                              (3, cfg.img_size, cfg.img_size),
                              method="bilinear")
        up = up[:, :input_size[0], :input_size[1]]
        full = jax.image.resize(up, (3, *original_size), method="bilinear")
        return full, iou

    res["decode_full_resize_ms"] = bench_fn(
        jax.jit(dec_up_full), (P, emb, coords_d, labels_d, m0, hm))
    print("decode_full_resize_ms", res["decode_full_resize_ms"], flush=True)

    # --- stage 4: the production fused graph ----------------------------
    fused = pred._build_decode_select(1, 3, original_size, input_size,
                                      pack_bits=True)
    res["fused_graph_ms"] = bench_fn(
        fused, (P, emb, coords_d, labels_d, m0, hm, tgt))
    print("fused_graph_ms", res["fused_graph_ms"], flush=True)

    # --- per-call predict_select (host-visible, incl. RTT + fetch) ------
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        pred.predict_select(gt[0, 1], np.array([[400.0, 200.0]]),
                            np.array([1]))
        times.append(time.perf_counter() - t0)
    res["predict_select_host_ms"] = round(float(np.median(times)) * 1e3, 2)
    print("predict_select_host_ms", res["predict_select_host_ms"], flush=True)

    # --- warm-start: one chain, then ms/decode ---------------------------
    shifted = np.roll(gt[0, 1], (12, 20), axis=(0, 1)).astype(np.float32)
    for _ in range(2):
        t0 = time.perf_counter()
        pred.warmstart_select(shifted, threshold=0.8, max_tries=20)
        warm = time.perf_counter() - t0
    res["warmstart_chain_ms"] = round(warm * 1e3, 2)
    res["warmstart_per_decode_ms"] = round(warm * 1e3 / 21, 2)
    print("warmstart_chain_ms", res["warmstart_chain_ms"], flush=True)

    # --- resizes alone on dummy logits (isolate from decode) ------------
    low_dummy = jnp.asarray(np.random.randn(3, cfg.low_res, cfg.low_res),
                            jnp.float32)

    def up1(x):
        return jax.image.resize(x, (3, cfg.img_size, cfg.img_size),
                                method="bilinear")

    res["resize_256_to_1024_ms"] = bench_fn(jax.jit(up1), (low_dummy,))

    up_dummy = jnp.asarray(
        np.random.randn(3, input_size[0], input_size[1]), jnp.float32)

    def up2(x):
        return jax.image.resize(x, (3, *original_size), method="bilinear")

    res["resize_input_to_orig_ms"] = bench_fn(jax.jit(up2), (up_dummy,))
    print("resizes", res["resize_256_to_1024_ms"],
          res["resize_input_to_orig_ms"], flush=True)

    OUT.write_text(json.dumps(res, indent=1))
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

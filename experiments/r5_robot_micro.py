"""r5: micro-bench the on-device click robot at 480x854.

Hypothesis: the fused warm-start chain's ~42 ms/step is NOT the SAM
decode (predict_select implies ~3-7 ms device once the ~31 ms RTT is
subtracted) but ``click_robot_interact`` — specifically the h*w-length
``.at[root].add`` scatter-adds in ``largest_component_stats`` (colliding
indices serialize on TPU) and/or the label fixpoint loop.

Times each level in isolation on realistic SAM-error-like masks:
  1. label_components(fp)           (fixpoint scan loop)
  2. largest_component_stats(fp)    (+ the 3 scatter-adds + argmax)
  3. click_robot_interact(pred, gt) (2x stats + middle click + snaps)
  4. middle_click(gt)
Plus a sort-based largest_component_stats prototype for comparison.
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

from eva_vos_tpu.ops import components as C

OUT = Path(__file__).with_suffix(".json")
res = {}


def bench_fn(fn, args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    jax.device_get(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jnp.ravel(jax.tree.leaves(out)[0])[0])
    return round((time.perf_counter() - t0) / reps * 1e3, 3)


def sort_based_stats(mask):
    """largest_component_stats with sort-based aggregation (no scatter)."""
    h, w = mask.shape
    lab = C.label_components(mask)                  # [H, W] int32, INF32 bg
    flat = lab.reshape(-1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).reshape(-1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).reshape(-1)
    slab, sy, sx = jax.lax.sort((flat, ys, xs), num_keys=1)
    n = h * w
    start = jnp.concatenate([jnp.ones((1,), bool), slab[1:] != slab[:-1]])
    # run id per element, prefix sums for size / sum_y / sum_x per run
    cum1 = jnp.cumsum(jnp.ones((n,), jnp.int32))
    cumy = jnp.cumsum(sy)
    cumx = jnp.cumsum(sx)
    # end-of-run positions: where the next element starts a new run
    endpos = jnp.concatenate([start[1:], jnp.ones((1,), bool)])
    idx = jnp.arange(n, dtype=jnp.int32)
    # per run: [start_i, end_i]; gather cumulative at ends and starts
    # build arrays over runs via masking (runs <= n; use where+segment)
    # simpler: for each element that is a run END, size = cum1[i] -
    # cum1[start_of_run - 1].  Get start-of-run index per element by
    # cummax over idx*start.
    startidx = jax.lax.associative_scan(jnp.maximum,
                                        jnp.where(start, idx, -1))
    size_at_end = jnp.where(
        endpos, cum1 - jnp.where(startidx > 0, cum1[startidx - 1], 0), 0)
    valid = slab != C.INF32
    size_at_end = jnp.where(valid, size_at_end, 0)
    best = jnp.argmax(size_at_end)  # first max: smallest end position ==
    # smallest root among ties?  (ties resolved by first run end in sorted
    # order == smallest root label — same as reference first-max)
    size = size_at_end[best]
    s0 = startidx[best]
    sumy = cumy[best] - jnp.where(s0 > 0, cumy[s0 - 1], 0)
    sumx = cumx[best] - jnp.where(s0 > 0, cumx[s0 - 1], 0)
    cx = jnp.where(size > 0, sumx // jnp.maximum(size, 1), 0)
    cy = jnp.where(size > 0, sumy // jnp.maximum(size, 1), 0)
    return cx.astype(jnp.int32), cy.astype(jnp.int32), size


def main():
    h, w = 480, 854
    rng = np.random.default_rng(0)
    # realistic error masks: a few blobs
    yy, xx = np.mgrid[:h, :w]
    gt = ((yy - 240) ** 2 + (xx - 400) ** 2) < 120 ** 2
    pred = np.roll(gt, (12, 20), axis=(0, 1))
    fp = pred & ~gt
    fp_d = jnp.asarray(fp)
    gt_d = jnp.asarray(gt)
    pred_d = jnp.asarray(pred)

    lab = jax.jit(C.label_components)
    res["label_components_ms"] = bench_fn(lab, (fp_d,))
    print("label_components_ms", res["label_components_ms"], flush=True)

    stats = jax.jit(C.largest_component_stats)
    res["largest_component_stats_ms"] = bench_fn(stats, (fp_d,))
    print("largest_component_stats_ms", res["largest_component_stats_ms"],
          flush=True)

    robot = jax.jit(C.click_robot_interact)
    res["click_robot_interact_ms"] = bench_fn(robot, (pred_d, gt_d))
    print("click_robot_interact_ms", res["click_robot_interact_ms"],
          flush=True)

    mid = jax.jit(C.middle_click)
    res["middle_click_ms"] = bench_fn(mid, (gt_d,))
    print("middle_click_ms", res["middle_click_ms"], flush=True)

    sstats = jax.jit(sort_based_stats)
    a = jax.device_get(stats(fp_d))
    b = jax.device_get(sstats(fp_d))
    res["sort_stats_matches"] = bool(
        all(int(x) == int(y) for x, y in zip(a, b)))
    res["sort_stats_ms"] = bench_fn(sstats, (fp_d,))
    print("sort_stats_ms", res["sort_stats_ms"],
          "match", res["sort_stats_matches"], flush=True)

    # a harder mask: many small specks (worst case for fixpoint count?)
    speck = rng.uniform(size=(h, w)) < 0.02
    res["label_specks_ms"] = bench_fn(lab, (jnp.asarray(speck),))
    res["stats_specks_ms"] = bench_fn(stats, (jnp.asarray(speck),))
    res["sort_stats_specks_ms"] = bench_fn(sstats, (jnp.asarray(speck),))
    print("specks", res["label_specks_ms"], res["stats_specks_ms"],
          res["sort_stats_specks_ms"], flush=True)

    OUT.write_text(json.dumps(res, indent=1))
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

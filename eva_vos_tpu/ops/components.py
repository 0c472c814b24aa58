"""Device-side connected components and click selection.

The simulated click robot (reference ``robots/click_robot.py:14-76``) is
the one host-side stage of the SAM refinement loops: every warm-start
round fetches the current mask to the host (one ~31 ms tunnel round-trip,
``experiments/r5_sam_profile.json``) just to run scipy labeling and pick
one click.  These jnp re-implementations make the click selection jittable
so the WHOLE warm-start chain (decode -> select -> click -> decode ...)
runs as one device program with a single host round-trip.

Exactness contract (tested against scipy/native in
``tests/test_components.py``):

* 8-connected components, component identity = the minimum flat (row-major)
  index in the component — scipy assigns labels in raster order of first
  pixel, so "argmax over sizes, first max wins" is IDENTICAL to "histogram
  over min-index roots, argmin-flat-index tie-break";
* component center = (sum_x // size, sum_y // size) — equal to
  ``int(np.mean(xs))`` for non-negative ints (float64 mean truncation ==
  integer floor division);
* snap-to-mask = nearest true pixel by squared distance, row-major
  tie-break (``np.argmin`` order);
* middle click = median of xs / median of ys (``np.median`` averages the
  two central order statistics for even counts; int() truncation == floor).

Label propagation: masked min-label iteration.  Each step takes the min
over the 8-neighborhood AND over mask-contiguous row/column runs (a
segment-reset ``associative_scan`` in all four directions), which collapses
straight runs in one step; a ``while_loop`` iterates to fixpoint, so the
result is exact for every shape (spirals just take more iterations).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF32 = jnp.int32(2 ** 31 - 1)


def _segment_min_scan(vals, blocked, axis: int, reverse: bool):
    """Running min along ``axis`` that RESETS at blocked positions.

    combine((b1, v1), (b2, v2)) = (b1|b2, v2 if b2 else min(v1, v2)) is
    associative: the right operand's blocked flag cuts the left prefix.
    """

    def combine(a, b):
        ab, av = a
        bb, bv = b
        return ab | bb, jnp.where(bb, bv, jnp.minimum(av, bv))

    _, out = jax.lax.associative_scan(combine, (blocked, vals), axis=axis,
                                      reverse=reverse)
    return out


def _propagate_once(lab, mask):
    """One fixpoint step: 8-neighborhood min + 4-direction run collapse."""
    blocked = ~mask
    big = jnp.where(mask, lab, INF32)

    # run collapse along rows and columns (both directions)
    for axis in (0, 1):
        for reverse in (False, True):
            lab = jnp.minimum(
                lab, _segment_min_scan(big, blocked, axis, reverse))
            big = jnp.where(mask, lab, INF32)

    # 8-neighborhood min (diagonals included)
    p = jnp.pad(big, 1, constant_values=INF32)
    neigh = big
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh = jnp.minimum(
                neigh, p[1 + dy:p.shape[0] - 1 + dy,
                         1 + dx:p.shape[1] - 1 + dx])
    return jnp.where(mask, jnp.minimum(big, neigh), INF32)


def label_components(mask):
    """mask [H, W] bool -> int32 labels: each true pixel gets the minimum
    flat row-major index of its 8-connected component; false pixels get
    INF32.  Exact (runs to fixpoint)."""
    h, w = mask.shape
    flat = (jnp.arange(h * w, dtype=jnp.int32).reshape(h, w))
    lab0 = jnp.where(mask, flat, INF32)

    def cond(state):
        lab, prev, _ = state
        return jnp.any(lab != prev)

    def body(state):
        lab, _, it = state
        return _propagate_once(lab, mask), lab, it + 1

    first = _propagate_once(lab0, mask)
    lab, _, _ = jax.lax.while_loop(
        cond, body, (first, lab0, jnp.int32(1)))
    return lab


def largest_component_stats(mask):
    """mask [H, W] bool -> (cx, cy, size) of the largest 8-connected
    component; size == 0 when the mask is empty.  Tie-break: the component
    whose first (raster-order) pixel comes first — identical to
    ``np.argmax`` over scipy label sizes.  Centers are integer-floor means
    (== ``int(np.mean(...))`` for non-negative coordinates)."""
    h, w = mask.shape
    lab = label_components(mask)
    flat_lab = lab.reshape(-1)
    valid = flat_lab != INF32
    root = jnp.where(valid, flat_lab, 0)

    ones = valid.astype(jnp.int32)
    sizes = jnp.zeros((h * w,), jnp.int32).at[root].add(ones)
    ys = (jnp.arange(h, dtype=jnp.int32)[:, None]
          * jnp.ones((1, w), jnp.int32)).reshape(-1)
    xs = (jnp.ones((h, 1), jnp.int32)
          * jnp.arange(w, dtype=jnp.int32)[None, :]).reshape(-1)
    sum_y = jnp.zeros((h * w,), jnp.int32).at[root].add(
        jnp.where(valid, ys, 0))
    sum_x = jnp.zeros((h * w,), jnp.int32).at[root].add(
        jnp.where(valid, xs, 0))

    best_root = jnp.argmax(sizes)  # first max == smallest root flat index
    size = sizes[best_root]
    cx = jnp.where(size > 0, sum_x[best_root] // jnp.maximum(size, 1), 0)
    cy = jnp.where(size > 0, sum_y[best_root] // jnp.maximum(size, 1), 0)
    return cx.astype(jnp.int32), cy.astype(jnp.int32), size


def snap_to_mask(x, y, mask):
    """Nearest true pixel of ``mask`` to (x, y) by squared euclidean
    distance, row-major tie-break (== ``np.argmin`` over ``np.nonzero``
    order); returns (x, y) unchanged when already inside.  The mask must
    be non-empty (reference precondition)."""
    h, w = mask.shape
    yy = jnp.arange(h, dtype=jnp.int32)[:, None]
    xx = jnp.arange(w, dtype=jnp.int32)[None, :]
    d = (xx - x) ** 2 + (yy - y) ** 2
    d = jnp.where(mask, d, INF32)
    i = jnp.argmin(d.reshape(-1))  # first min == row-major tie-break
    nx = (i % w).astype(jnp.int32)
    ny = (i // w).astype(jnp.int32)
    inside = mask[y, x]
    return (jnp.where(inside, x, nx).astype(jnp.int32),
            jnp.where(inside, y, ny).astype(jnp.int32))


def _median_int(mask_counts, n):
    """int(np.median(values)) where ``mask_counts[v]`` counts occurrences
    of value v: the floor of the average of the (n-1)//2-th and n//2-th
    order statistics (non-negative values)."""
    cum = jnp.cumsum(mask_counts)
    k1 = (n - 1) // 2
    k2 = n // 2
    v1 = jnp.argmax(cum > k1)  # first index with cum > k
    v2 = jnp.argmax(cum > k2)
    return ((v1 + v2) // 2).astype(jnp.int32)


def middle_click(gt):
    """Median pixel of the object, snapped into the mask (reference
    ``click_robot.py:78-99``).  gt [H, W] bool, must be non-empty.
    Returns (x, y) int32."""
    h, w = gt.shape
    n = jnp.sum(gt, dtype=jnp.int32)
    col_counts = jnp.sum(gt, axis=0, dtype=jnp.int32)  # per-x
    row_counts = jnp.sum(gt, axis=1, dtype=jnp.int32)  # per-y
    mx = _median_int(col_counts, n)
    my = _median_int(row_counts, n)
    return snap_to_mask(mx, my, gt)


def click_robot_interact(pred, gt):
    """One refinement click (the warm-start loop's robot call —
    ``interact`` with no iou argument, reference ``annotator.py:69``):
    the larger of (largest false-positive component -> negative click) and
    (largest false-negative component -> positive click snapped into gt),
    FP winning ties (insertion order).  Falls back to the middle click
    when the prediction is exact.  Returns (x, y, label) int32.
    pred/gt [H, W] bool; gt must be non-empty."""
    fp = pred & ~gt
    fn = ~pred & gt
    fpx, fpy, fps = largest_component_stats(fp)
    fnx0, fny0, fns = largest_component_stats(fn)
    snx, sny = snap_to_mask(fnx0, fny0, gt)

    # candidate order (fp first) with max-by-size, first max wins
    fp_wins = fps >= fns
    have_any = (fps > 0) | (fns > 0)
    # fp empty -> fn wins even on ties of size 0 handled by have_any
    fp_wins = fp_wins & (fps > 0)

    x = jnp.where(fp_wins, fpx, snx)
    y = jnp.where(fp_wins, fpy, sny)
    label = jnp.where(fp_wins, jnp.int32(0), jnp.int32(1))

    mx, my = middle_click(gt)
    x = jnp.where(have_any, x, mx)
    y = jnp.where(have_any, y, my)
    label = jnp.where(have_any, label, jnp.int32(1))
    return x, y, label

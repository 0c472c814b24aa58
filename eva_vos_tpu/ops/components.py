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


# Packed segmented-min-scan state: one int32 per element, value in the low
# 30 bits, the "segment contains a blocked cell" flag in bit 30.  Blocked
# positions are exactly INF32 = (BIT | VMAX), which doubles as the
# out-of-range fill — so the scan carries ONE array instead of the
# (blocked, value) pair (the r5 robot micro-bench measured the pair-carry
# associative_scan fixpoint at 31 ms/label at 480p, dominating the fused
# SAM warm-start chain; experiments/r5_robot_micro.json).
_BIT = jnp.int32(1 << 30)
_VMAX = jnp.int32((1 << 30) - 1)


def _packed_combine(k1, k2):
    """Segmented-min composition of packed states (k1 = earlier segment).

    (b1,v1)*(b2,v2) = (b1|b2, v2 if b2 else min(v1,v2)); packed:
    a blocked right operand wins outright, otherwise min carries the left
    flag (b2=0 makes ``k2 | (k1 & BIT)`` the pair (b1, v2))."""
    return jnp.where(k2 >= _BIT, k2,
                     jnp.minimum(k1, k2 | (k1 & _BIT)))


def _shift_along(x, d: int, axis: int):
    """x[i - d] brought to position i along ``axis``; fill INF32 (blocked)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (d, 0)
    xp = jnp.pad(x, pad, constant_values=INF32)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, x.shape[axis])
    return xp[tuple(sl)]


def _hillis_seg_scan(x, axis: int):
    """Inclusive segmented-min scan (packed states) via Hillis-Steele
    doubling: log2(n) full-array combines, no odd/even recursion — a
    fraction of ``associative_scan``'s op count on TPU."""
    n = x.shape[axis]
    d = 1
    while d < n:
        x = _packed_combine(_shift_along(x, d, axis), x)
        d *= 2
    return x


def _run_collapse(lab, mask, axis: int):
    """min over each mask-contiguous run along ``axis`` (both directions),
    computed as ONE doubling scan over the [fwd, flipped] stack."""
    packed = jnp.where(mask, jnp.minimum(lab, _VMAX), INF32)
    s = jnp.stack([packed, jnp.flip(packed, axis=axis)])
    s = _hillis_seg_scan(s, axis=axis if axis >= 0 else axis)
    fwd = s[0] & _VMAX
    rev = jnp.flip(s[1], axis=axis) & _VMAX
    return jnp.minimum(lab, jnp.minimum(fwd, rev))


def _propagate_once(lab, mask):
    """One fixpoint step: row runs -> column runs (on the updated labels)
    -> 8-neighborhood min.  lab/mask may have leading batch dims; the
    spatial axes are the last two."""
    lab = _run_collapse(lab, mask, axis=-1)
    lab = _run_collapse(lab, mask, axis=-2)

    big = jnp.where(mask, lab, INF32)
    pad = [(0, 0)] * big.ndim
    pad[-1] = (1, 1)
    pad[-2] = (1, 1)
    p = jnp.pad(big, pad, constant_values=INF32)
    h, w = big.shape[-2], big.shape[-1]
    neigh = big
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh = jnp.minimum(
                neigh, p[..., 1 + dy:h + 1 + dy, 1 + dx:w + 1 + dx])
    return jnp.where(mask, jnp.minimum(big, neigh), INF32)


def label_components(mask):
    """mask [..., H, W] bool -> int32 labels: each true pixel gets the
    minimum flat row-major index of its (per-batch-slice) 8-connected
    component; false pixels get INF32.  Exact (runs to fixpoint); leading
    batch dims are labeled together in one fixpoint loop."""
    h, w = mask.shape[-2], mask.shape[-1]
    flat = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    flat = jnp.broadcast_to(flat, mask.shape)
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


# Aggregation strategy for per-component stats: the h*w-slot
# ``.at[root].add`` scatters cost ~3.7 ms EACH on TPU (colliding-index
# scatter, experiments/r5_robot_micro.json) — the dominant robot cost
# after the label fixpoint.  The fast path compacts the <= _ROOT_CAP
# component roots (top_k over the root indicators) and reduces
# ``lab == roots[c]`` compare-planes, which XLA fuses into one pass; the
# scatter path remains as an exact fallback for >_ROOT_CAP components
# (speckle masks), selected by lax.cond at run time.
_ROOT_CAP = 512


def _stats_from_labels_scatter(lab, mask):
    """(cx, cy, size) of the largest component from a label image —
    h*w-slot scatter-add aggregation (exact for any component count)."""
    h, w = mask.shape
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


def _stats_from_labels_compact(lab, mask):
    """(cx, cy, size) via root compaction: valid ONLY when the slice has
    <= _ROOT_CAP components (the caller guards with lax.cond)."""
    h, w = mask.shape
    flat_lab = jnp.where(mask, lab, -1).reshape(-1)
    flat_idx = jnp.arange(h * w, dtype=jnp.int32)
    is_root = flat_lab == flat_idx
    # the <=cap smallest root ids, ascending (padded with INF32): top_k of
    # the negated candidates; ascending order makes argmax's first-max ==
    # smallest-root — the reference (scipy raster-order) tie-break
    sel = jnp.where(is_root, flat_idx, INF32)
    cap = min(_ROOT_CAP, h * w)
    roots = -jax.lax.top_k(-sel, cap)[0]

    ys = (jnp.arange(h, dtype=jnp.int32)[:, None]
          * jnp.ones((1, w), jnp.int32)).reshape(-1)
    xs = (jnp.ones((h, 1), jnp.int32)
          * jnp.arange(w, dtype=jnp.int32)[None, :]).reshape(-1)
    eq = flat_lab[:, None] == roots[None, :]          # [h*w, cap], fused
    sizes = jnp.sum(eq, axis=0, dtype=jnp.int32)
    sum_y = jnp.sum(jnp.where(eq, ys[:, None], 0), axis=0,
                    dtype=jnp.int32)
    sum_x = jnp.sum(jnp.where(eq, xs[:, None], 0), axis=0,
                    dtype=jnp.int32)

    best = jnp.argmax(sizes)  # first max == smallest root (ascending)
    size = sizes[best]
    cx = jnp.where(size > 0, sum_x[best] // jnp.maximum(size, 1), 0)
    cy = jnp.where(size > 0, sum_y[best] // jnp.maximum(size, 1), 0)
    return cx.astype(jnp.int32), cy.astype(jnp.int32), size


def _stats_from_labels(lab, mask):
    """Largest-component stats from a label image: compact fast path,
    scatter fallback when the component count exceeds _ROOT_CAP."""
    h, w = mask.shape
    flat_lab = jnp.where(mask, lab, -1).reshape(-1)
    n_roots = jnp.sum(flat_lab == jnp.arange(h * w, dtype=jnp.int32),
                      dtype=jnp.int32)
    return jax.lax.cond(
        n_roots <= min(_ROOT_CAP, h * w),
        lambda args: _stats_from_labels_compact(*args),
        lambda args: _stats_from_labels_scatter(*args),
        (lab, mask))


def largest_component_stats(mask):
    """mask [H, W] bool -> (cx, cy, size) of the largest 8-connected
    component; size == 0 when the mask is empty.  Tie-break: the component
    whose first (raster-order) pixel comes first — identical to
    ``np.argmax`` over scipy label sizes.  Centers are integer-floor means
    (== ``int(np.mean(...))`` for non-negative coordinates)."""
    lab = label_components(mask)
    return _stats_from_labels(lab, mask)


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
    # ONE batched fixpoint labels both error masks (iterations = the max
    # either needs; halves the scan cost vs two sequential labelings)
    lab2 = label_components(jnp.stack([fp, fn]))
    fpx, fpy, fps = _stats_from_labels(lab2[0], fp)
    fnx0, fny0, fns = _stats_from_labels(lab2[1], fn)
    snx, sny = snap_to_mask(fnx0, fny0, gt)

    # candidate order (fp first) with max-by-size, first max wins
    fp_wins = fps >= fns
    have_any = (fps > 0) | (fns > 0)
    # fp empty -> fn wins even on ties of size 0 handled by have_any
    fp_wins = fp_wins & (fps > 0)

    x = jnp.where(fp_wins, fpx, snx)
    y = jnp.where(fp_wins, fpy, sny)
    label = jnp.where(fp_wins, jnp.int32(0), jnp.int32(1))

    # the middle-click fallback only fires on a pixel-perfect prediction —
    # gate it behind cond so the common path skips its median + snap work
    return jax.lax.cond(
        have_any,
        lambda _: (x, y, label),
        lambda _: (*middle_click(gt), jnp.int32(1)),
        None)

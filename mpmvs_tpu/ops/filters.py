"""Checkerboard star-shaped median depth filter.

Re-derivation of CheckerboardFilter (reference: src/PatchMatch.cu:1036-1174):
after depths are finalized, each pixel's depth is replaced by the median of
up to 21 star-neighborhood depths (border-dependent subset), skipping pixels
whose cost is < 0.001. Runs in two checkerboard phases — black first, red
reads black's filtered values — exactly like the reference's two kernel
launches (PatchMatch.cu:1241-1243).

Vectorization: the 21 taps become 21 shifted maps; invalid taps are pushed
to +inf, one sort of the 21-vector per pixel yields the median at the
per-pixel valid count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpmvs_tpu.ops.sampling import shift_2d

Array = jax.Array

# (dx, dy) and the border condition under which the reference includes the
# tap (PatchMatch.cu:1071-1141). Conditions are (min_x, max_x_off, min_y,
# max_y_off): include iff x >= min_x, x < W - max_x_off, y >= min_y,
# y < H - max_y_off.
_TAPS = (
    ((0, 0),   (0, 0, 0, 0)),
    ((0, -1),  (0, 0, 1, 0)),
    ((0, -3),  (0, 0, 3, 0)),
    ((0, -5),  (0, 0, 5, 0)),
    ((0, 1),   (0, 0, 0, 1)),
    ((0, 3),   (0, 0, 0, 3)),
    ((0, 5),   (0, 0, 0, 5)),
    ((-1, 0),  (1, 0, 0, 0)),
    ((-3, 0),  (3, 0, 0, 0)),
    ((-5, 0),  (5, 0, 0, 0)),
    ((1, 0),   (0, 1, 0, 0)),
    ((3, 0),   (0, 3, 0, 0)),
    ((5, 0),   (0, 5, 0, 0)),
    ((2, -1),  (0, 2, 1, 0)),
    ((2, 1),   (0, 2, 0, 1)),
    ((-2, -1), (2, 0, 1, 0)),
    ((-2, 1),  (2, 0, 0, 1)),
    ((-1, -2), (1, 0, 3, 0)),
    ((1, -2),  (0, 1, 3, 0)),
    ((-1, 2),  (1, 0, 0, 2)),
    ((1, 2),   (0, 1, 0, 2)),
)


def _filter_once(depth: Array, cost: Array, phase: int) -> Array:
    H, W = depth.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    taps, valids = [], []
    for (dx, dy), (min_x, max_x, min_y, max_y) in _TAPS:
        valid = ((xx >= min_x) & (xx < W - max_x)
                 & (yy >= min_y) & (yy < H - max_y))
        taps.append(jnp.where(valid, shift_2d(depth, dx, dy), jnp.inf))
        valids.append(valid)
    stack = jnp.stack(taps, axis=-1)          # (H, W, 21), invalid -> +inf
    count = jnp.sum(jnp.stack(valids, -1), -1)  # (H, W)
    s = jnp.sort(stack, axis=-1)
    mid = count // 2
    take = lambda idx: jnp.take_along_axis(s, idx[..., None], axis=-1)[..., 0]
    med_odd = take(mid)
    med_even = 0.5 * (take(jnp.maximum(mid - 1, 0)) + take(mid))
    median = jnp.where(count % 2 == 0, med_even, med_odd)

    active = ((xx + yy) % 2) == phase
    keep = cost < 0.001  # low-cost pixels are left untouched (PatchMatch.cu:1067)
    return jnp.where(active & ~keep, median, depth)


def checkerboard_median_filter(depth: Array, cost: Array) -> Array:
    """Two-phase (black then red) star median filter of the depth map."""
    depth = _filter_once(depth, cost, phase=0)
    depth = _filter_once(depth, cost, phase=1)
    return depth

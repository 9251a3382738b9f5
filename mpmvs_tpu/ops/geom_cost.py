"""Geometric consistency cost: forward-backward reprojection error.

Re-derivation of ComputeGeomConsistencyCost (PatchMatch.cu:617-640): the
plane's depth at the reference pixel is forward-projected into a source
view, the source's estimated depth is fetched (truncating-nearest, matching
the reference's `(int)` texture fetch), back-projected, re-projected into
the reference, and the pixel error is clamped at 3.0. A zero source depth
scores the full 3.0 penalty.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpmvs_tpu import geometry as geo
from mpmvs_tpu.ops.sampling import nearest_sample_batched

Array = jax.Array


def geom_consistency_cost(
    src_depths: Array,   # (S, Hp, Wp) source-view depth maps (padded)
    src_widths: Array,   # (S,)
    src_heights: Array,  # (S,)
    K_ref: Array, R_ref: Array, C_ref: Array, t_ref: Array,
    K_src: Array,        # (S, 3, 3)
    R_src: Array,        # (S, 3, 3)
    t_src: Array,        # (S, 3)
    C_src: Array,        # (S, 3)
    plane: Array,        # (H, W, 4)
    x: Array, y: Array,  # (H, W) pixel grids
    max_cost: float = 3.0,
) -> Array:
    """Returns (S, H, W) clamped reprojection errors."""
    S = src_depths.shape[0]
    depth = geo.depth_from_plane(K_ref, plane, x, y)            # (H, W)
    Xw = geo.backproject_world(K_ref, R_ref, C_ref, x, y, depth)  # (H, W, 3)

    src_pt, _ = geo.project_camera(
        K_src[:, None, None], R_src[:, None, None], t_src[:, None, None], Xw[None]
    )  # (S, H, W, 2)

    view_idx = jax.lax.broadcasted_iota(jnp.int32, src_pt.shape[:-1], 0)
    src_depth = nearest_sample_batched(
        src_depths, view_idx, src_pt[..., 0], src_pt[..., 1],
        src_widths, src_heights,
    )  # (S, H, W)

    Xs = geo.backproject_world(
        K_src[:, None, None], R_src[:, None, None], C_src[:, None, None],
        src_pt[..., 0], src_pt[..., 1], src_depth,
    )  # (S, H, W, 3)
    back_pt, _ = geo.project_camera(K_ref, R_ref, t_ref, Xs)    # (S, H, W, 2)

    err = jnp.sqrt(
        (x[None] - back_pt[..., 0]) ** 2 + (y[None] - back_pt[..., 1]) ** 2
    )
    err = jnp.where(jnp.isfinite(err), err, max_cost)
    return jnp.where(src_depth == 0.0, max_cost, jnp.minimum(err, max_cost))

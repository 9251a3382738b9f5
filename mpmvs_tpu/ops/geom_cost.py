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


def backward_transfer_terms(K_ref: Array, R_ref: Array, C_ref: Array,
                            K_src: Array,   # (S, 3, 3)
                            R_src: Array,   # (S, 3, 3)
                            C_src: Array):  # (S, 3)
    """Per-source constants of the src-pixel -> ref-pixel point transfer.

    A src pixel p_s with depth d backprojects and reprojects to the
    homogeneous ref image point  (A_bwd p_s) d + b_bwd  with
    A_bwd = K_r R_r R_s^T K_s^-1 and b_bwd = K_r R_r (C_s - C_r) — the
    mirror of geometry.homography_terms' forward factorization. Composing
    the two 3x3 chains once per solve turns the geometric-consistency
    round trip (PatchMatch.cu:617-640) into 2 small FMAs per
    (source, pixel) instead of two full backproject/project chains.
    """
    # Composed once per solve (f32: this runs traced inside the jitted
    # solve, x64 is off). The f32 3x3 chain shifts reprojection errors by
    # up to ~0.015 px vs the unfused formulation — a <=0.003 cost delta
    # after the 0.2 geometric weight, two orders below the NCC cost scale.
    fx, fy = K_src[:, 0, 0], K_src[:, 1, 1]
    cx, cy = K_src[:, 0, 2], K_src[:, 1, 2]
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    Ks_inv = jnp.stack([
        jnp.stack([1.0 / fx, zero, -cx / fx], axis=-1),
        jnp.stack([zero, 1.0 / fy, -cy / fy], axis=-1),
        jnp.stack([zero, zero, one], axis=-1),
    ], axis=-2)                                          # (S, 3, 3)
    KrRr = K_ref @ R_ref                                 # (3, 3)
    A_bwd = jnp.einsum("ij,skj,skl->sil", KrRr, R_src, Ks_inv)
    b_bwd = jnp.einsum("ij,sj->si", KrRr, C_src - C_ref)
    return A_bwd, b_bwd


def geom_consistency_cost_fused(
    src_depths: Array,   # (S, Hp, Wp) source-view depth maps (padded)
    src_widths: Array,   # (S,)
    src_heights: Array,  # (S,)
    u_fwd: Array,        # (S, H, W, 3) = A_fwd @ [x, y, 1] per pixel
    b_fwd: Array,        # (S, 3) forward transfer offset (solver data `b`)
    A_bwd: Array,        # (S, 3, 3) from backward_transfer_terms
    b_bwd: Array,        # (S, 3)
    K_ref: Array,
    plane: Array,        # (H, W, 4)
    x: Array, y: Array,  # (H, W) pixel grids
    max_cost: float = 3.0,
) -> Array:
    """geom_consistency_cost with both projection chains precomposed.

    Same math as geom_consistency_cost reassociated (float-close, not
    bit-identical): the forward chain K_s(R_s X_w + t_s) collapses to
    u_fwd * depth + b_fwd where u_fwd is HYPOTHESIS-INDEPENDENT — the
    caller computes it once per band and shares it across all ~14
    hypothesis evaluations of a half-iteration. Measured on v5e this
    halves the gcost share of a geometric half-iteration (BASELINE.md
    round-5 geom decomposition: gcost was 55% of a geom band).
    """
    depth = geo.depth_from_plane(K_ref, plane, x, y)            # (H, W)
    h = u_fwd * depth[None, ..., None] + b_fwd[:, None, None, :]
    z = h[..., 2]
    sx = h[..., 0] / z
    sy = h[..., 1] / z

    view_idx = jax.lax.broadcasted_iota(jnp.int32, sx.shape, 0)
    src_depth = nearest_sample_batched(src_depths, view_idx, sx, sy,
                                       src_widths, src_heights)  # (S, H, W)

    hr = (jnp.einsum("sij,shwj->shwi",
                     A_bwd, jnp.stack([sx, sy, jnp.ones_like(sx)], axis=-1))
          * src_depth[..., None] + b_bwd[:, None, None, :])
    bx = hr[..., 0] / hr[..., 2]
    by = hr[..., 1] / hr[..., 2]
    err = jnp.sqrt((x[None] - bx) ** 2 + (y[None] - by) ** 2)
    err = jnp.where(jnp.isfinite(err), err, max_cost)
    return jnp.where(src_depth == 0.0, max_cost, jnp.minimum(err, max_cost))

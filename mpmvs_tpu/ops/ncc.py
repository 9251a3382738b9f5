"""Multi-scale-window bilateral-weighted ZNCC matching cost.

TPU-native re-design of ComputeBilateralNCC (reference:
src/PatchMatch.cu:325-458). Instead of one CUDA thread looping over a 6x6
window with texture fetches, the whole (H, W) pixel grid is evaluated at
once per (tap, view): reference-side taps are *static shifts* (pad+slice, no
gathers), bilateral weights and reference moments are recomputed on the VPU
(cheaper than storing 36 x H x W intermediates), and only the source-image
taps are true gathers (there is no texture unit on TPU).

The plane-induced homography is factorized (see geometry.homography_terms)
so each tap projection is two FMAs on a precomputed homogeneous center +
column vectors — the reference recomputes the full 3x3 homography product
per pixel per hypothesis (PatchMatch.cu:349).

Window schedule ("multi-scale windows", the MP of MP-MVS): tap stride
2*2^scale, radius 5*2^scale, always 36 taps (PatchMatch.cu:341-346).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from mpmvs_tpu import geometry as geo
from mpmvs_tpu.ops.sampling import bilinear_sample_batched, shift_2d

Array = jax.Array


def spatial_weights(offsets: Sequence[Tuple[int, int]], sigma_spatial: float):
    """Static spatial bilateral factor exp(-sqrt(dx^2+dy^2) / (2 sigma_s^2))
    per tap (ComputeBilateralWeight, PatchMatch.cu:318-323 — note the
    reference divides the *distance*, not its square, by 2 sigma^2)."""
    return [
        math.exp(-math.sqrt(dx * dx + dy * dy) / (2.0 * sigma_spatial * sigma_spatial))
        for (dx, dy) in offsets
    ]


def ncc_cost(
    ref_img: Array,          # (H, W) reference image (full view)
    src_imgs: Array,         # (S, Hp, Wp) stacked source images (padded)
    src_widths: Array,       # (S,) valid widths (float)
    src_heights: Array,      # (S,)
    A: Array,                # (S, 3, 3) homography terms
    b: Array,                # (S, 3)
    K_ref: Array,            # (3, 3)
    plane: Array,            # (H, W, 4) per-pixel hypothesis (n, w)
    offsets: Sequence[Tuple[int, int]],
    sigma_spatial: float,
    sigma_color: float,
    cost_max: float = 2.0,
) -> Array:
    """Bilateral ZNCC cost of `plane` against every source view.

    Returns (S, H, W) costs in [0, cost_max]. Out-of-bounds center
    projections and degenerate-variance windows cost `cost_max`
    (PatchMatch.cu:350-353, 406-408).
    """
    H, W = ref_img.shape
    S = src_imgs.shape[0]
    x, y = geo.pixel_grid(H, W)

    # Per-view homography of the window: h(dx,dy) = h_p + dx col_x + dy col_y.
    pt, col_x, col_y, h_p = geo.homography_apply(
        A[:, None, None], b[:, None, None], K_ref, plane[None], x, y
    )  # all (S, H, W, ...)

    oob = (
        (pt[..., 0] < 0.0)
        | (pt[..., 0] >= src_widths[:, None, None])
        | (pt[..., 1] < 0.0)
        | (pt[..., 1] >= src_heights[:, None, None])
        | ~jnp.isfinite(pt[..., 0])
        | ~jnp.isfinite(pt[..., 1])
    )

    ref_center = ref_img
    inv_2sc2 = 1.0 / (2.0 * sigma_color * sigma_color)
    sw = spatial_weights(offsets, sigma_spatial)

    view_idx = jax.lax.broadcasted_iota(jnp.int32, (S, H, W), 0)

    sum_w = jnp.zeros((H, W), ref_img.dtype)
    sum_ref = jnp.zeros((H, W), ref_img.dtype)
    sum_ref2 = jnp.zeros((H, W), ref_img.dtype)
    sum_src = jnp.zeros((S, H, W), ref_img.dtype)
    sum_src2 = jnp.zeros((S, H, W), ref_img.dtype)
    sum_rs = jnp.zeros((S, H, W), ref_img.dtype)

    for k, (dx, dy) in enumerate(offsets):
        ref_tap = shift_2d(ref_img, dx, dy)  # clamp addressing
        w = sw[k] * jnp.exp(-jnp.abs(ref_tap - ref_center) * inv_2sc2)
        sum_w = sum_w + w
        wr = w * ref_tap
        sum_ref = sum_ref + wr
        sum_ref2 = sum_ref2 + wr * ref_tap
        h = h_p + dx * col_x + dy * col_y
        inv_z = 1.0 / h[..., 2]
        src_tap = bilinear_sample_batched(
            src_imgs, view_idx, h[..., 0] * inv_z, h[..., 1] * inv_z,
            src_widths, src_heights,
        )
        ws = w[None] * src_tap
        sum_src = sum_src + ws
        sum_src2 = sum_src2 + ws * src_tap
        sum_rs = sum_rs + wr[None] * src_tap

    inv_w = 1.0 / sum_w
    m_ref = sum_ref * inv_w
    m_ref2 = sum_ref2 * inv_w
    m_src = sum_src * inv_w[None]
    m_src2 = sum_src2 * inv_w[None]
    m_rs = sum_rs * inv_w[None]

    var_ref = m_ref2 - m_ref * m_ref
    var_src = m_src2 - m_src * m_src
    covar = m_rs - m_ref[None] * m_src

    k_min_var = 1e-5
    degenerate = (var_ref[None] < k_min_var) | (var_src < k_min_var)
    denom = jnp.sqrt(jnp.maximum(var_ref[None] * var_src, 1e-30))
    ncc = jnp.clip(1.0 - covar / denom, 0.0, cost_max)
    return jnp.where(oob | degenerate, cost_max, ncc)


def ncc_cost_multi(
    ref_img, src_imgs, src_widths, src_heights, A, b, K_ref,
    planes: Array,  # (C, H, W, 4) candidate plane fields
    offsets, sigma_spatial, sigma_color, cost_max: float = 2.0,
    sequential: bool = True,
) -> Array:
    """Costs for C candidate plane fields: (C, S, H, W).

    ``sequential=True`` evaluates candidates with lax.map so peak memory
    stays at one candidate's working set — the (C x S x H x W) tap
    intermediates never materialize (cf. cost_array[8][32] living in CUDA
    registers, PatchMatch.cu:795).
    """
    fn = lambda p: ncc_cost(ref_img, src_imgs, src_widths, src_heights,
                            A, b, K_ref, p, offsets, sigma_spatial,
                            sigma_color, cost_max)
    if sequential:
        return jax.lax.map(fn, planes)
    return jax.vmap(fn)(planes)

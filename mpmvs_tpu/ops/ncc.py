"""Multi-scale-window bilateral-weighted ZNCC matching cost.

TPU-native re-design of ComputeBilateralNCC (reference:
src/PatchMatch.cu:325-458). Instead of one CUDA thread looping over a 6x6
window with texture fetches, a whole pixel set is evaluated at once per
(tap, view): reference-side taps are *static shifts* (pad+slice, no
gathers), and only the source-image taps are true gathers (there is no
texture unit on TPU).

Key memory/compute structure (round 2):

  * The reference side of the window — bilateral weights, weighted ref
    moments, variance — depends only on the reference image, not on the
    plane hypothesis. :func:`ncc_refside` precomputes it ONCE per pixel set;
    every hypothesis evaluation (~14 per checkerboard half-iteration:
    8 propagation candidates + current + 5 refinement trials,
    PatchMatch.cu:798-998) then reuses it, saving 36 exp/abs/mul chains per
    extra evaluation.
  * Evaluations run on an arbitrary pixel set with explicit (x, y)
    coordinates, so the caller can pass a quincunx-packed (H, W//2) active
    checkerboard color and/or a row band — the packed+banded form is what
    bounds peak HBM (see ops/propagation.py and ops/packing.py).

The plane-induced homography is factorized (see geometry.homography_terms)
so each tap projection is two FMAs on a precomputed homogeneous center +
column vectors — the reference recomputes the full 3x3 homography product
per pixel per hypothesis (PatchMatch.cu:349).

Window schedule ("multi-scale windows", the MP of MP-MVS): tap stride
2*2^scale, radius 5*2^scale, always 36 taps (PatchMatch.cu:341-346).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mpmvs_tpu import geometry as geo
from mpmvs_tpu.ops.sampling import bilinear_sample_batched, shift_2d
from mpmvs_tpu.ops.packing import pack_quincunx

Array = jax.Array

K_MIN_VAR = 1e-5  # degenerate-variance threshold (PatchMatch.cu:406)


def spatial_weights(offsets: Sequence[Tuple[int, int]], sigma_spatial: float):
    """Static spatial bilateral factor exp(-sqrt(dx^2+dy^2) / (2 sigma_s^2))
    per tap (ComputeBilateralWeight, PatchMatch.cu:318-323 — note the
    reference divides the *distance*, not its square, by 2 sigma^2)."""
    return [
        math.exp(-math.sqrt(dx * dx + dy * dy) / (2.0 * sigma_spatial * sigma_spatial))
        for (dx, dy) in offsets
    ]


class NCCRefSide(NamedTuple):
    """Per-pixel-set reference-window precompute, shared by all hypothesis
    evaluations at those pixels."""

    w: Array        # (T, …) bilateral weight per tap
    wr: Array       # (T, …) weight * ref tap value
    inv_w: Array    # (…,) 1 / sum_k w_k
    m_ref: Array    # (…,) weighted ref mean
    var_ref: Array  # (…,) weighted ref variance


def ncc_refside(
    ref_slice: Array,   # (Hs, W) reference rows incl. vertical tap halo
    halo: int,          # rows of halo above the output region
    out_rows: int,      # rows in the output region
    offsets: Sequence[Tuple[int, int]],
    sigma_spatial: float,
    sigma_color: float,
    pack_phase: Optional[int] = None,  # quincunx phase, or None = all pixels
) -> NCCRefSide:
    """Precompute the reference side of the bilateral ZNCC window.

    ``ref_slice`` must contain ``halo`` extra rows above and below the
    ``out_rows`` output rows (edge-replicated at image borders — CUDA clamp
    addressing); horizontal taps clamp inside. With ``pack_phase`` set, all
    outputs are quincunx-packed to (out_rows, W//2).
    """
    crop = lambda a: jax.lax.slice_in_dim(a, halo, halo + out_rows, axis=0)
    if pack_phase is None:
        prep = crop
    else:
        prep = lambda a: pack_quincunx(crop(a), pack_phase)

    center = prep(ref_slice)
    inv_2sc2 = 1.0 / (2.0 * sigma_color * sigma_color)
    sw = spatial_weights(offsets, sigma_spatial)

    ws, wrs = [], []
    sum_w = jnp.zeros_like(center)
    sum_ref = jnp.zeros_like(center)
    sum_ref2 = jnp.zeros_like(center)
    for k, (dx, dy) in enumerate(offsets):
        tap = prep(shift_2d(ref_slice, dx, dy))  # clamp addressing
        w = sw[k] * jnp.exp(-jnp.abs(tap - center) * inv_2sc2)
        wr = w * tap
        ws.append(w)
        wrs.append(wr)
        sum_w = sum_w + w
        sum_ref = sum_ref + wr
        sum_ref2 = sum_ref2 + wr * tap

    inv_w = 1.0 / sum_w
    m_ref = sum_ref * inv_w
    var_ref = sum_ref2 * inv_w - m_ref * m_ref
    return NCCRefSide(w=jnp.stack(ws), wr=jnp.stack(wrs), inv_w=inv_w,
                      m_ref=m_ref, var_ref=var_ref)


def ncc_eval(
    refside: NCCRefSide,
    src_imgs: Array,         # (S, Hp, Wp) stacked source images (padded)
    src_widths: Array,       # (S,) valid widths (float)
    src_heights: Array,      # (S,)
    A: Array,                # (S, 3, 3) homography terms
    b: Array,                # (S, 3)
    K_ref: Array,            # (3, 3)
    plane: Array,            # (…, 4) per-pixel hypothesis (n, w)
    x: Array, y: Array,      # (…,) global pixel coordinates
    offsets: Sequence[Tuple[int, int]],
    cost_max: float = 2.0,
    cap_radius: float = 0.0,
) -> Array:
    """Bilateral ZNCC cost of `plane` against every source view at the pixel
    set (x, y): returns (S, …) costs in [0, cost_max]. Out-of-bounds center
    projections and degenerate-variance windows cost `cost_max`
    (PatchMatch.cu:350-353, 406-408).

    ``cap_radius`` > 0 enables the footprint cap (documented deviation, see
    ops/pallas_ncc._kernel): any hypothesis whose projected window leaves a
    ±cap_radius box around the center projection costs ``cost_max``. The
    detection arithmetic mirrors the Pallas kernel bit-for-bit so both
    samplers stay interchangeable."""
    S = src_imgs.shape[0]
    view_bshape = (S,) + (1,) * x.ndim

    # Per-view homography of the window: h(dx,dy) = h_p + dx col_x + dy col_y.
    pt, col_x, col_y, h_p = geo.homography_apply(
        A.reshape(view_bshape + (3, 3)), b.reshape(view_bshape + (3,)),
        K_ref, plane[None], x, y
    )  # all (S, …, k)

    oob = (
        (pt[..., 0] < 0.0)
        | (pt[..., 0] >= src_widths.reshape(view_bshape))
        | (pt[..., 1] < 0.0)
        | (pt[..., 1] >= src_heights.reshape(view_bshape))
        | ~jnp.isfinite(pt[..., 0])
        | ~jnp.isfinite(pt[..., 1])
    )

    if cap_radius > 0.0:
        # center via reciprocal-multiply, exactly like the kernel
        inv_zc = 1.0 / h_p[..., 2]
        ccx = h_p[..., 0] * inv_zc
        ccy = h_p[..., 1] * inv_zc
        ccx = jnp.where(jnp.isfinite(ccx), ccx, 0.0)
        ccy = jnp.where(jnp.isfinite(ccy), ccy, 0.0)
        bx_lo, bx_hi = ccx - cap_radius, ccx + cap_radius
        by_lo, by_hi = ccy - cap_radius, ccy + cap_radius
        capped = jnp.zeros_like(oob)

    view_idx = jax.lax.broadcasted_iota(jnp.int32, (S,) + x.shape, 0)
    sum_src = jnp.zeros((S,) + x.shape, refside.m_ref.dtype)
    sum_src2 = jnp.zeros_like(sum_src)
    sum_rs = jnp.zeros_like(sum_src)
    for k, (dx, dy) in enumerate(offsets):
        h = h_p + dx * col_x + dy * col_y
        inv_z = 1.0 / h[..., 2]
        if cap_radius > 0.0:
            xs = h[..., 0] * inv_z
            ys = h[..., 1] * inv_z
            xs = jnp.where(jnp.isfinite(xs), xs, 0.0)
            ys = jnp.where(jnp.isfinite(ys), ys, 0.0)
            capped = (capped | (xs < bx_lo) | (xs > bx_hi)
                      | (ys < by_lo) | (ys > by_hi))
        src_tap = bilinear_sample_batched(
            src_imgs, view_idx, h[..., 0] * inv_z, h[..., 1] * inv_z,
            src_widths, src_heights,
        )
        ws = refside.w[k][None] * src_tap
        sum_src = sum_src + ws
        sum_src2 = sum_src2 + ws * src_tap
        sum_rs = sum_rs + refside.wr[k][None] * src_tap

    inv_w = refside.inv_w[None]
    m_src = sum_src * inv_w
    var_src = sum_src2 * inv_w - m_src * m_src
    covar = sum_rs * inv_w - refside.m_ref[None] * m_src

    degenerate = (refside.var_ref[None] < K_MIN_VAR) | (var_src < K_MIN_VAR)
    denom = jnp.sqrt(jnp.maximum(refside.var_ref[None] * var_src, 1e-30))
    ncc = jnp.clip(1.0 - covar / denom, 0.0, cost_max)
    bad = (oob | capped | degenerate) if cap_radius > 0.0 else (oob | degenerate)
    return jnp.where(bad, cost_max, ncc)


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
    """Whole-image convenience form: (S, H, W) costs for a full plane field.

    Thin wrapper over :func:`ncc_refside` + :func:`ncc_eval`; the solver's
    hot path calls those directly on packed row bands.
    """
    H, W = ref_img.shape
    x, y = geo.pixel_grid(H, W)
    refside = ncc_refside(ref_img, 0, H, offsets, sigma_spatial, sigma_color)
    return ncc_eval(refside, src_imgs, src_widths, src_heights, A, b, K_ref,
                    plane, x, y, offsets, cost_max)

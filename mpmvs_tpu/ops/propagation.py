"""Adaptive checkerboard propagation + hypothesis refinement.

TPU-native re-design of CheckerboardPropagation / PlaneHypothesisRefinement
(reference: src/PatchMatch.cu:642-998). The CUDA version runs one thread per
half-grid pixel with data-dependent register loops; here the active
checkerboard color's pixels are *packed* into a dense (rows, W//2) array
(ops/packing.py) — the TPU equivalent of the reference's half-height grid
with its thread->pixel row remap (PatchMatch.cu:1000-1019) — and updated as
dense array ops. The two-phase schedule (black reads red's fresh values and
vice versa) is preserved exactly; it is what makes in-place propagation
race-free.

Memory: one half-iteration's candidate cost tensors are
(8 regions x S views x pixels); at the reference operating point
(3200x2130, 20 sources — config/config.yaml:5,17) that is several GB if
evaluated whole-image. The step therefore processes the image in row
*bands*: each band slices the state with a halo (propagation reach 23 px +
NCC window radius), computes its active pixels' update independently —
valid because within a half-iteration every active pixel reads only the
*previous* state — and the bands are mapped sequentially (lax.map), so peak
HBM is one band's working set. ``PatchMatchParams.band_rows`` controls the
band height (0 = automatic from the shape).

The 8 sample regions (4 diagonal "V" wings x12 candidates, 4 axial strips
x10 candidates reaching +-23 px — PatchMatch.cu:769-779) each contribute the
neighbor with minimum *current* cost; each winner's plane is then scored
against all source views at the center pixel.

Documented deviations from reference quirks (SURVEY.md §7e):
  * candidates whose entire region fell outside the image get +inf final
    cost instead of garbage-from-uninitialized-registers (PatchMatch.cu:795);
    interior pixels (>23 px from a border) are unaffected.
  * a zero Monte-Carlo weight-sum keeps the pixel's state instead of
    poisoning the cost map with NaNs (0/0 at PatchMatch.cu:897).
  * in prior mode, adopting a candidate also updates the stored cost; the
    reference writes the cost but then overwrites it with the stale local
    `cost_now` after refinement (PatchMatch.cu:963 vs :993).
  * the refinement geometric-cost accumulator uses the view's weight, fixing
    the reference's loop-index slip (`view_weights[i]`, PatchMatch.cu:689).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mpmvs_tpu import geometry as geo
from mpmvs_tpu.ops import random as pmrand
from mpmvs_tpu.ops.ncc import ncc_eval, ncc_refside
from mpmvs_tpu.ops.geom_cost import geom_consistency_cost
from mpmvs_tpu.ops.packing import pack_quincunx, packed_coords, unpack_quincunx
from mpmvs_tpu.ops.sampling import shift_2d
from mpmvs_tpu.ops.view_selection import monte_carlo_view_weights

Array = jax.Array

# Sample regions: (dx, dy) offsets, np = p + offset (PatchMatch.cu:769-779).
# 0: up-V, 1: down-V, 2: left-V, 3: right-V, 4-7: up/down/left/right strips.
DIRS: Tuple[Tuple[Tuple[int, int], ...], ...] = (
    ((-5, -6), (5, -6), (-6, -7), (6, -7), (-7, -8), (7, -8), (-8, -9), (8, -9),
     (-9, -10), (9, -10), (-10, -11), (10, -11)),
    ((-5, 6), (5, 6), (-6, 7), (6, 7), (-7, 8), (7, 8), (-8, 9), (8, 9),
     (-9, 10), (9, 10), (-10, 11), (10, 11)),
    ((-6, -5), (-6, 5), (-7, -6), (-7, 6), (-8, -7), (-8, 7), (-9, -8), (-9, 8),
     (-10, -9), (-10, 9), (-11, -10), (-11, 10)),
    ((6, -5), (6, 5), (7, -6), (7, 6), (8, -7), (8, 7), (9, -8), (9, 8),
     (10, -9), (10, 9), (11, -10), (11, 10)),
    ((0, -5), (0, -7), (0, -9), (0, -11), (0, -13), (0, -15), (0, -17),
     (0, -19), (0, -21), (0, -23)),
    ((0, 5), (0, 7), (0, 9), (0, 11), (0, 13), (0, 15), (0, 17), (0, 19),
     (0, 21), (0, 23)),
    ((-5, 0), (-7, 0), (-9, 0), (-11, 0), (-13, 0), (-15, 0), (-17, 0),
     (-19, 0), (-21, 0), (-23, 0)),
    ((5, 0), (7, 0), (9, 0), (11, 0), (13, 0), (15, 0), (17, 0), (19, 0),
     (21, 0), (23, 0)),
)

# Immediate 4-neighbors whose view bitmasks seed the selection prior,
# gated on the corresponding V-wing having a valid candidate
# (PatchMatch.cu:788-793, 824-830). Order: up, down, left, right.
NEIGHBOR_OFFSETS = ((0, -1), (0, 1), (-1, 0), (1, 0))

PROPAGATION_REACH = 23  # max |offset| component — the halo a band/tile needs


class SolveData(NamedTuple):
    """Per-scene constants for one reference view's solve."""

    ref_img: Array             # (H, W) float32 grayscale
    src_imgs: Array            # (S, Hp, Wp) padded source images
    src_widths: Array          # (S,) float valid extents
    src_heights: Array         # (S,)
    K_ref: Array               # (3, 3)
    R_ref: Array
    t_ref: Array
    C_ref: Array
    K_src: Array               # (S, 3, 3)
    R_src: Array
    t_src: Array
    C_src: Array
    A: Array                   # (S, 3, 3) homography terms
    b: Array                   # (S, 3)
    depth_min: Array           # () scalar (already widened 0.6x/1.2x)
    depth_max: Array
    src_depths: Optional[Array] = None    # (S, Hp, Wp), geom mode
    prior_planes: Optional[Array] = None  # (H, W, 4), prior mode
    prior_mask: Optional[Array] = None    # (H, W) bool
    # Quad-packed source texture for the Pallas kernel (params.src_quant8):
    # (S, Hq, Wp) int32, pair-row r2 column c packs the 2x2 patch
    # src[2r2:2r2+2, c:c+2] as 4 bytes; v = byte * quad_iscale + quad_lo.
    src_quads: Optional[Array] = None
    quad_lo: Optional[Array] = None       # () f32 affine offset
    quad_iscale: Optional[Array] = None   # () f32 affine scale (hi-lo)/255


class PatchMatchState(NamedTuple):
    plane: Array      # (H, W, 4) (n_cam, w) during the solve
    cost: Array       # (H, W)
    geom_cost: Array  # (H, W)
    sel: Array        # (H, W) int32 view bitmask


def select_candidates(cost: Array, plane: Array):
    """Per-region min-cost neighbor hypothesis (whole-image form).

    Returns (cand_planes (8, H, W, 4), cand_valid (8, H, W)).
    Strict-< running min keeps the first minimum like the reference's
    ``bestConf > nconf`` scan (PatchMatch.cu:809-812).

    This dense form is kept as the unit-test oracle surface; the solver's
    banded/packed path uses :func:`_select_candidates_packed`.
    """
    H, W = cost.shape
    plane_flat = plane.reshape(H * W, 4)
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    cands, valids = [], []
    for region in DIRS:
        best_c = jnp.full((H, W), jnp.inf, cost.dtype)
        best_k = jnp.zeros((H, W), jnp.int32)
        for k, (dx, dy) in enumerate(region):
            c = shift_2d(cost, dx, dy, fill=jnp.inf)
            take = c < best_c
            best_c = jnp.where(take, c, best_c)
            best_k = jnp.where(take, k, best_k)
        valid = jnp.isfinite(best_c)
        dxs = jnp.asarray([d[0] for d in region], jnp.int32)
        dys = jnp.asarray([d[1] for d in region], jnp.int32)
        iy = jnp.clip(yy + jnp.take(dys, best_k), 0, H - 1)
        ix = jnp.clip(xx + jnp.take(dxs, best_k), 0, W - 1)
        cands.append(jnp.take(plane_flat, iy * W + ix, axis=0))
        valids.append(valid)
    return jnp.stack(cands), jnp.stack(valids)


def _select_candidates_packed(cost_s: Array, plane_s: Array, halo: int,
                              rows: int, phase: int, x_int: Array,
                              depth_s: Optional[Array] = None):
    """Banded + packed candidate harvest.

    cost_s/plane_s: (Hs, W[, 4]) band slice with ``halo`` rows above/below
    (out-of-image rows pre-filled with +inf cost by the caller). Returns
    (cand_planes (8, rows, W//2, 4), cand_valid (8, rows, W//2),
    cand_src_depth or None) for the active color's pixels of the band's
    central ``rows`` rows. ``x_int``: (rows, W//2) int32 global x of each
    packed pixel. ``depth_s`` (Hs, W): the slice's stored depth field; when
    given, each candidate's depth AT ITS SOURCE PIXEL is gathered alongside
    (used by the disparity extrapolation clamp in :func:`_band_step`).
    """
    Hs, W = cost_s.shape
    plane_flat = plane_s.reshape(Hs * W, 4)
    depth_flat = depth_s.reshape(Hs * W) if depth_s is not None else None
    crop = lambda a: jax.lax.slice_in_dim(a, halo, halo + rows, axis=0)
    prep = lambda a: pack_quincunx(crop(a), phase)
    r_local = jax.lax.broadcasted_iota(jnp.int32, x_int.shape, 0) + halo
    cands, valids, src_ds = [], [], []
    for region in DIRS:
        best_c = jnp.full((Hs, W), jnp.inf, cost_s.dtype)
        best_k = jnp.zeros((Hs, W), jnp.int32)
        for k, (dx, dy) in enumerate(region):
            c = shift_2d(cost_s, dx, dy, fill=jnp.inf)
            take = c < best_c
            best_c = jnp.where(take, c, best_c)
            best_k = jnp.where(take, k, best_k)
        valid = jnp.isfinite(prep(best_c))
        best_k_p = pack_quincunx(crop(best_k), phase)
        dxs = jnp.asarray([d[0] for d in region], jnp.int32)
        dys = jnp.asarray([d[1] for d in region], jnp.int32)
        iy = jnp.clip(r_local + jnp.take(dys, best_k_p), 0, Hs - 1)
        ix = jnp.clip(x_int + jnp.take(dxs, best_k_p), 0, W - 1)
        cands.append(jnp.take(plane_flat, iy * W + ix, axis=0))
        valids.append(valid)
        if depth_flat is not None:
            src_ds.append(jnp.take(depth_flat, iy * W + ix))
    src_d = jnp.stack(src_ds) if depth_flat is not None else None
    return jnp.stack(cands), jnp.stack(valids), src_d


def _weighted_total(costs_v: Array, weights: Array, norm: Array,
                    geom_v: Optional[Array], geom_weight: float):
    """sum_s w_s (c_s [+ 0.2 g_s]) / norm, with zero-norm guarded to +inf.

    costs_v/geom_v: (S, …); weights: (…, S); norm: (…,).
    Returns (total (…,), geom_total (…,) or None).
    """
    w = jnp.moveaxis(weights, -1, 0)  # (S, …)
    safe_norm = jnp.maximum(norm, 1e-30)
    if geom_v is None:
        total = jnp.sum(w * costs_v, axis=0) / safe_norm
        geom_total = None
    else:
        g = geom_weight * geom_v
        total = jnp.sum(w * (costs_v + g), axis=0) / safe_norm
        geom_total = jnp.sum(w * g, axis=0) / safe_norm
    total = jnp.where(norm > 0, total, jnp.inf)
    return total, geom_total


def _prior_score(cost: Array, depth: Array, plane_n: Array,
                 prior_planes: Array, prior_depth: Array,
                 depth_sigma: Array, angle_sigma: float, gamma: float,
                 beta: float) -> Array:
    """Restricted (to-be-maximized) planar-prior score
    exp(-cost^2/beta) * (gamma + exp(-dd^2/2sd^2) exp(-da^2/2sa^2))
    (PatchMatch.cu:924-955)."""
    depth_diff = depth - prior_depth
    angle_cos = jnp.clip(
        jnp.sum(prior_planes[..., :3] * plane_n, axis=-1), -1.0, 1.0
    )
    angle_diff = jnp.arccos(angle_cos)
    two_ds2 = 2.0 * depth_sigma * depth_sigma
    two_as2 = 2.0 * angle_sigma * angle_sigma
    prior = gamma + jnp.exp(-depth_diff * depth_diff / two_ds2) * jnp.exp(
        -angle_diff * angle_diff / two_as2
    )
    score = jnp.exp(-cost * cost / beta) * prior
    return jnp.where(jnp.isfinite(cost), score, 0.0)


def step_halo(scale: int) -> int:
    """Rows of context a band needs above/below its output rows: candidate
    reach (23, PatchMatch.cu:769-779) or the NCC window radius 5*2^scale
    (PatchMatch.cu:341-346), whichever is larger; rounded up to even."""
    h = max(PROPAGATION_REACH + 1, 5 * (2 ** scale))
    return h + (h % 2)


def auto_band_rows(H: int, W: int, S: int, geom: bool,
                   budget_mb: int = 256) -> int:
    """Even band height keeping one band's working set under ``budget_mb``.

    Cost model per packed row (W//2 pixels, float32):
      * candidate-cost tensor (8, S, rows, W//2): 8 S (x2 with geom_array);
      * one NCC evaluation's live intermediates — homography center/column
        fields (S, rows, W//2, 3) x3, projected points, tap gather temps and
        accumulators: ~40 S (XLA keeps a few evaluations' worth live across
        the lax.map despite serialization, observed on v5e);
    i.e. ~48 S (56 S with geom) floats per packed row. Bands are sized to
    split H evenly (minimal last-band padding), result in [32, H_even]."""
    h_even = H + (H % 2)
    floats_per_row = S * (W // 2 or 1) * (56 if geom else 48)
    rows_max = int(budget_mb * 1024 * 1024 // max(4 * floats_per_row, 1))
    rows_max = max(32, min(h_even, rows_max))
    n_bands = -(-h_even // rows_max)
    rows = -(-h_even // n_bands)
    return min(h_even, rows + (rows % 2))


def _band_step(
    data: SolveData,
    params,
    scale: int,
    iteration: Array,
    phase: int,
    key: Array,
    key_step: Array,           # un-folded step key: shared by all bands so
                               # the smooth random-band field is continuous
                               # across band boundaries
    geom: bool,
    prior: bool,
    halo: int,
    rows: int,
    y0: Array,                 # global (even) first row of the band
    cost_s: Array,             # (Hs, W) state slices incl. halo
    plane_s: Array,            # (Hs, W, 4)
    sel_s: Array,              # (Hs, W)
    ref_s: Array,              # (Hs, W) reference-image slice (edge-padded)
    geom_c: Array,             # (rows, W) current geom-cost, central rows only
    prior_planes_c: Optional[Array],  # (rows, W, 4)
    prior_mask_c: Optional[Array],    # (rows, W)
):
    """One band's active-color update. Returns packed (plane (rows, W//2, 4),
    cost, geom_cost, sel)."""
    Hs, W = cost_s.shape
    Wh = W // 2
    S = data.src_imgs.shape[0]
    offsets = params.tap_offsets(scale)
    k_mc, k_ref1, k_ref2, k_ref3, k_ref4, k_prior = jax.random.split(key, 6)

    x_p, y_p = packed_coords(y0.astype(jnp.float32), rows, Wh, phase)
    x_int = x_p.astype(jnp.int32)

    crop = lambda a: jax.lax.slice_in_dim(a, halo, halo + rows,
                                          axis=a.ndim - 2)
    prep = lambda a: pack_quincunx(crop(a), phase)
    pack_c = lambda a: pack_quincunx(a, phase)  # for halo-free central slices
    pack_vec = lambda a: jnp.moveaxis(
        pack_quincunx(jnp.moveaxis(a, -1, 0), phase), 0, -1)

    # current state at the band's active pixels
    cost_c = prep(cost_s)
    sel_c = prep(sel_s)
    plane_c = jnp.moveaxis(prep(jnp.moveaxis(plane_s, -1, 0)), 0, -1)
    geom_cost_c = pack_c(geom_c)
    if prior:
        prior_planes_p = pack_vec(prior_planes_c)
        prior_mask_p = pack_c(prior_mask_c)

    # reference-side NCC precompute: shared by all ~14 hypothesis evals
    refside = ncc_refside(ref_s, halo, rows, offsets,
                          params.sigma_spatial, params.sigma_color,
                          pack_phase=phase)

    sampler = params.sampler
    if sampler == "auto":
        sampler = "pallas" if jax.default_backend() == "tpu" else "xla"
    cap = params.cap_radius(scale)

    def ncc_xla(plane):
        return ncc_eval(refside, data.src_imgs, data.src_widths,
                        data.src_heights, data.A, data.b, data.K_ref,
                        plane, x_p, y_p, offsets, params.cost_max,
                        cap_radius=cap)

    if sampler in ("pallas", "pallas_sorted"):
        from mpmvs_tpu.ops.pallas_ncc import (ncc_eval_pallas,
                                              ncc_eval_pallas_multi,
                                              ncc_eval_pallas_sorted)
        # interpret-mode off-TPU so explicit sampler="pallas*" still runs
        # (e.g. CPU tests) instead of failing at Mosaic compile (ADVICE r3)
        interp = jax.default_backend() != "tpu"
        # quad-packed 8-bit sampling (params.src_quant8): present only when
        # build_solve_data packed the texture
        qkw = (dict(src_quads=data.src_quads, quad_lo=data.quad_lo,
                    quad_iscale=data.quad_iscale)
               if getattr(params, "src_quant8", False)
               and data.src_quads is not None else {})

        def ncc(plane):
            return ncc_eval_pallas(
                refside, data.src_imgs, data.src_widths, data.src_heights,
                data.A, data.b, data.K_ref, plane, x_p, y_p,
                tuple(offsets), params.cost_max, cap_radius=cap,
                interpret=interp, **qkw)

        def ncc_batch(planes):
            # K-stacked kernel: all hypotheses share each DMA'd source
            # block; one pallas_call per (band, view grid) instead of K
            return ncc_eval_pallas_multi(
                refside, data.src_imgs, data.src_widths, data.src_heights,
                data.A, data.b, data.K_ref, planes, x_p, y_p,
                tuple(offsets), params.cost_max, cap_radius=cap,
                interpret=interp, **qkw)

        if sampler == "pallas_sorted":
            # opt-in: bucket-sorted kernel sampling for the random-depth
            # trials (see ncc_eval_pallas_sorted)
            def ncc_scatter(plane):
                return ncc_eval_pallas_sorted(
                    refside, data.src_imgs, data.src_widths,
                    data.src_heights, data.A, data.b, data.K_ref, plane,
                    x_p, y_p, tuple(offsets), params.cost_max,
                    cap_radius=cap, interpret=interp, **qkw)
        elif params.coherent_random and cap > 0.0:
            # banded random-depth draws + the footprint cap keep every
            # trial's per-tile sweep bounded — the sweep kernel handles
            # them directly (round 4; kills the XLA-gather fallback that
            # was ~80% of projected solve time in round 3)
            ncc_scatter = ncc
        else:
            ncc_scatter = ncc_xla
    else:
        ncc = ncc_xla
        ncc_scatter = ncc_xla
        ncc_batch = lambda planes: jax.lax.map(ncc, planes)

    if getattr(params, "debug_skip_ncc", False):
        # Instrumentation stub (tools/solve_trace.py): near-free cost that
        # still DEPENDS on the hypothesis planes, so XLA cannot dead-code
        # the field construction (disp clamp, trial draws) it feeds — the
        # stubbed band then measures exactly (half-iteration minus the
        # sampling kernels).
        def _stub(planes):
            return jnp.broadcast_to(planes[..., 0][..., None, :, :] * 1e-30,
                                    planes.shape[:-3] + (S,) + x_p.shape)
        ncc_batch = _stub
        ncc = lambda plane: _stub(plane)
        ncc_scatter = ncc

    def gcost(plane):
        # NB: geom_cost.geom_consistency_cost_fused (precomposed transfer
        # chains, hypothesis-shared forward rays) is a MEASURED NEGATIVE
        # here: identical 0.74 s/band on v5e — the term is bound by the
        # scalar depth gathers + their HBM traffic, not by projection
        # math (BASELINE.md round-5 geom decomposition). Cutting it needs
        # a 1-tap variant of the sweep kernel, not algebra.
        if getattr(params, "debug_skip_gcost", False):
            return jnp.broadcast_to(plane[..., 0][..., None, :, :] * 1e-30,
                                    plane.shape[:-3] + (S,) + x_p.shape)
        return geom_consistency_cost(
            data.src_depths, data.src_widths, data.src_heights,
            data.K_ref, data.R_ref, data.C_ref, data.t_ref,
            data.K_src, data.R_src, data.t_src, data.C_src,
            plane, x_p, y_p, params.geom_cost_max)

    # ---- 1. candidate harvesting + their multi-view photometric costs
    # (the current hypothesis rides the same batched kernel call — 9
    # stacked fields, one pallas_call per view grid; its cost is consumed
    # in step 4)
    clamp = params.disp_clamp_frac
    if clamp > 0.0:
        # Disparity extrapolation clamp (round 4, documented deviation):
        # a candidate plane's induced depth at the center pixel is its
        # neighbor's plane EXTRAPOLATED ≤23 px — for any plausible surface
        # that moves disparity by ≲1% of the range, but a random-normal
        # junk plane lands anywhere, scattering the tile's projection
        # footprint across the whole depth range (measured ~12 s/band for
        # early-iteration candidate evals at 3200x2130 on v5e). Candidates
        # are therefore EVALUATED at a disparity clipped to ±clamp x range
        # around their source pixel's stored depth; the clamp never
        # engages for legitimate slants (range/16 over 23 px would need a
        # plane crossing the whole range in ~370 px), and where it does
        # engage the candidate was unadoptable junk. The ORIGINAL plane is
        # still what gets adopted; the reconstructed plane is substituted
        # only where the clamp engaged, so legit candidates are evaluated
        # bit-identically.
        y_s = (jnp.arange(Hs, dtype=jnp.float32)
               + (y0.astype(jnp.float32) - halo))
        x_s = jnp.arange(W, dtype=jnp.float32)
        depth_s = geo.depth_from_plane(data.K_ref, plane_s,
                                       x_s[None, :], y_s[:, None])
        cand_planes, cand_valid, cand_src_d = _select_candidates_packed(
            cost_s, plane_s, halo, rows, phase, x_int, depth_s)
        cand_d = jax.vmap(
            lambda p: geo.depth_from_plane(data.K_ref, p, x_p, y_p))(
                cand_planes)
        disp = 1.0 / cand_d
        disp_nb = jnp.clip(1.0 / cand_src_d, 1.0 / data.depth_max,
                           1.0 / data.depth_min)
        disp_nb = jnp.where(jnp.isfinite(disp_nb), disp_nb,
                            1.0 / data.depth_max)
        half_d = clamp * (1.0 / data.depth_min - 1.0 / data.depth_max)
        disp_ev = jnp.clip(disp, disp_nb - half_d, disp_nb + half_d)
        disp_ev = jnp.where(jnp.isfinite(disp_ev), disp_ev, disp_nb)
        clamped = disp_ev != disp
        plane_ev = jax.vmap(
            lambda d, n: geo.plane_from_depth_normal(data.K_ref, x_p, y_p,
                                                     d, n))(
                1.0 / disp_ev, cand_planes[..., :3])
        eval_planes = jnp.where(clamped[..., None], plane_ev, cand_planes)
    else:
        cand_planes, cand_valid, _ = _select_candidates_packed(
            cost_s, plane_s, halo, rows, phase, x_int)
        eval_planes = cand_planes
    batch9 = ncc_batch(jnp.concatenate([eval_planes, plane_c[None]], axis=0))
    cost_array = batch9[:8]  # (8, S, rows, Wh)
    cost_vec_now = batch9[8]

    # ---- 2. Monte-Carlo view re-selection
    neighbor_sel = jnp.stack(
        [prep(shift_2d(sel_s, dx, dy, fill=0)) for (dx, dy) in NEIGHBOR_OFFSETS]
    )
    weights, weight_norm, temp_selected = monte_carlo_view_weights(
        k_mc, cost_array, cand_valid, neighbor_sel, cand_valid[:4],
        iteration, params.num_mc_samples)

    # ---- 3. view-weighted final candidate costs (+ geometric consistency)
    if geom:
        geom_array = jax.lax.map(gcost, cand_planes)  # (8, S, rows, Wh)
    final_costs = []
    for i in range(8):
        g_i = geom_array[i] if geom else None
        total, _ = _weighted_total(cost_array[i], weights, weight_norm,
                                   g_i, params.geom_weight)
        final_costs.append(jnp.where(cand_valid[i], total, jnp.inf))
    final_costs = jnp.stack(final_costs)  # (8, rows, Wh)
    min_idx = jnp.argmin(final_costs, axis=0)  # (rows, Wh)

    # ---- 4. current hypothesis cost under the new view weights
    # (cost_vec_now came from the step-1 batched call)
    geom_vec_now = gcost(plane_c) if geom else None
    cost_now, geom_now = _weighted_total(cost_vec_now, weights, weight_norm,
                                         geom_vec_now, params.geom_weight)
    cost_now = jnp.where(weight_norm > 0, cost_now, cost_c)
    if geom:
        geom_now = jnp.where(weight_norm > 0, geom_now, geom_cost_c)
    else:
        geom_now = geom_cost_c

    take_flat = lambda arr, idx: jnp.take_along_axis(
        arr.reshape(8, -1), idx.reshape(1, -1), axis=0).reshape(idx.shape)
    best_cost = take_flat(final_costs, min_idx)
    best_valid = take_flat(cand_valid, min_idx) & jnp.isfinite(best_cost)
    best_plane = jnp.take_along_axis(
        cand_planes.reshape(8, rows * Wh, 4),
        min_idx.reshape(1, rows * Wh, 1), axis=0
    ).reshape(rows, Wh, 4)
    best_depth = geo.depth_from_plane(data.K_ref, best_plane, x_p, y_p)
    depth_ok = (best_depth >= data.depth_min) & (best_depth <= data.depth_max)

    sel_now = sel_c
    restricted_now = jnp.zeros((rows, Wh), cost_c.dtype)

    if prior:
        # prior-regularized adoption (PatchMatch.cu:924-978)
        angle_sigma = math.pi * params.prior_angle_sigma_deg / 180.0
        depth_sigma = (data.depth_max - data.depth_min) * params.prior_depth_sigma_frac
        prior_depth = geo.depth_from_plane(data.K_ref, prior_planes_p, x_p, y_p)
        cand_depths = jax.vmap(
            lambda p: geo.depth_from_plane(data.K_ref, p, x_p, y_p))(cand_planes)
        restricted = _prior_score(
            final_costs, cand_depths, cand_planes[..., :3],
            prior_planes_p[None], prior_depth[None],
            depth_sigma, angle_sigma, params.prior_gamma, params.prior_beta)
        restricted = jnp.where(cand_valid, restricted, -jnp.inf)
        max_idx = jnp.argmax(restricted, axis=0)
        r_best = take_flat(restricted, max_idx)
        r_valid = take_flat(cand_valid, max_idx)
        r_plane = jnp.take_along_axis(
            cand_planes.reshape(8, rows * Wh, 4),
            max_idx.reshape(1, rows * Wh, 1), axis=0).reshape(rows, Wh, 4)
        r_cost = take_flat(final_costs, max_idx)
        r_depth = take_flat(cand_depths, max_idx)
        depth_now_cur = geo.depth_from_plane(data.K_ref, plane_c, x_p, y_p)
        r_now = _prior_score(cost_now, depth_now_cur, plane_c[..., :3],
                             prior_planes_p, prior_depth,
                             depth_sigma, angle_sigma, params.prior_gamma,
                             params.prior_beta)
        r_depth_ok = (r_depth >= data.depth_min) & (r_depth <= data.depth_max)
        adopt_m = prior_mask_p & r_valid & r_depth_ok & (r_best > r_now)
        # unmasked pixels use the plain min-cost rule (PatchMatch.cu:969-977);
        # note the reference does not update selected_views on this sub-path.
        adopt_u = (~prior_mask_p) & best_valid & depth_ok & (best_cost < cost_now)
        plane_now = jnp.where(adopt_m[..., None], r_plane,
                              jnp.where(adopt_u[..., None], best_plane, plane_c))
        cost_now = jnp.where(adopt_m, r_cost,
                             jnp.where(adopt_u, best_cost, cost_now))
        sel_now = jnp.where(adopt_m, temp_selected, sel_c)
        # On no adoption the refinement baseline stays 0 — the reference
        # never seeds it with the current plane's score (PatchMatch.cu:922,
        # :964), so refinement then replaces the plane with the best of its
        # 5 trials. Faithfully reproduced: it materially drives prior-mode
        # exploration.
        restricted_now = jnp.where(adopt_m, r_best, 0.0)
        if geom:
            # combined geom+prior extension: track the adopted candidate's
            # geometric share like the plain geom path does
            geom_totals = jnp.stack([
                _weighted_total(cost_array[i], weights, weight_norm,
                                geom_array[i], params.geom_weight)[1]
                for i in range(8)])
            geom_now = jnp.where(adopt_m, take_flat(geom_totals, max_idx),
                                 jnp.where(adopt_u,
                                           take_flat(geom_totals, min_idx),
                                           geom_now))
    else:
        adopt = best_valid & depth_ok & (best_cost < cost_now)
        plane_now = jnp.where(adopt[..., None], best_plane, plane_c)
        cost_now = jnp.where(adopt, best_cost, cost_now)
        sel_now = jnp.where(adopt, temp_selected, sel_c)
        if geom:
            # adopted candidate's geometric share (tracked for GeomCost map)
            geom_totals = jnp.stack([
                _weighted_total(cost_array[i], weights, weight_norm,
                                geom_array[i], params.geom_weight)[1]
                for i in range(8)])
            geom_now = jnp.where(adopt, take_flat(geom_totals, min_idx), geom_now)

    # ---- 5. refinement: 5 perturbed hypotheses (PlaneHypothesisRefinement)
    depth_now = geo.depth_from_plane(data.K_ref, plane_now, x_p, y_p)
    angle_sigma = math.pi * params.prior_angle_sigma_deg / 180.0
    depth_sigma = (data.depth_max - data.depth_min) * params.prior_depth_sigma_frac

    shape_p = x_p.shape
    if params.coherent_random:
        # smooth tile-banded draw (documented deviation — see
        # smooth_banded_uniform). The knot seed comes from the *step* key so
        # every band of this half-iteration draws the same global field.
        k_band_seed = jax.random.fold_in(key_step, 101)
        frac = (params.random_band_frac if (geom or prior)
                else params.effective_band_frac())
        draw_depth = lambda k: pmrand.smooth_banded_uniform(
            k_band_seed, k, x_p, y_p, data.depth_min, data.depth_max, frac)
    else:
        draw_depth = lambda k: jax.random.uniform(
            k, shape_p, jnp.float32, minval=data.depth_min,
            maxval=data.depth_max)
    if prior and not params.legacy_prior_refinement:
        # intended semantics: prior-guided random draw inside the mask
        prior_depth_f = geo.depth_from_plane(data.K_ref, prior_planes_p, x_p, y_p)
        d_rand_u = draw_depth(k_ref1)
        d_rand_p = (jax.random.uniform(k_prior, shape_p, jnp.float32) * 6.0
                    * depth_sigma + prior_depth_f - 3.0 * depth_sigma)
        depth_rand = jnp.where(prior_mask_p, d_rand_p, d_rand_u)
        n_rand_u = pmrand.random_normal_field(k_ref2, data.K_ref, x_p, y_p)
        n_rand_p = pmrand.perturbed_normal_field(
            k_prior, data.K_ref, x_p, y_p, prior_planes_p[..., :3], angle_sigma)
        normal_rand = jnp.where(prior_mask_p[..., None], n_rand_p, n_rand_u)
    else:
        # reference behavior: the second block always runs (PatchMatch.cu:660)
        depth_rand = draw_depth(k_ref1)
        normal_rand = pmrand.random_normal_field(k_ref2, data.K_ref, x_p, y_p)

    p = params.refine_perturbation
    depth_pert = depth_now * (1.0 + (jax.random.uniform(k_ref3, shape_p) * 2.0 - 1.0) * p)
    normal_pert = pmrand.perturbed_normal_field(
        k_ref4, data.K_ref, x_p, y_p, plane_now[..., :3], p * math.pi)
    normal_now = plane_now[..., :3]

    trial_d = [depth_rand, depth_now, depth_rand, depth_now, depth_pert]
    trial_n = [normal_now, normal_rand, normal_rand, normal_pert, normal_now]
    # Trials with per-pixel *random depth* project incoherently. With the
    # round-4 defaults (tile-banded draws + footprint cap) every trial's
    # sweep is bounded, so all 5 batch through the K-stacked kernel; the
    # sorted-scatter / XLA fallbacks remain for the legacy full-range draw
    # (sampler="pallas_sorted" or coherent_random=False).
    trial_scattered = [True, False, True, False, False]
    trial_planes = [geo.plane_from_depth_normal(data.K_ref, x_p, y_p, d, n)
                    for d, n in zip(trial_d, trial_n)]
    if ncc_scatter is ncc:
        trial_costs = ncc_batch(jnp.stack(trial_planes))  # (5, S, rows, Wh)
    else:
        trial_costs = [(ncc_scatter if scat else ncc)(p)
                       for p, scat in zip(trial_planes, trial_scattered)]

    if prior:
        prior_depth_f = geo.depth_from_plane(data.K_ref, prior_planes_p, x_p, y_p)

    for d_i, n_i, plane_i, c_v in zip(trial_d, trial_n, trial_planes,
                                      trial_costs):
        g_v = gcost(plane_i) if geom else None
        t_cost, t_geom = _weighted_total(c_v, weights, weight_norm, g_v,
                                         params.geom_weight)
        d_before = geo.depth_from_plane(data.K_ref, plane_i, x_p, y_p)
        in_range = (d_before >= data.depth_min) & (d_before <= data.depth_max)
        if prior:
            score_i = _prior_score(t_cost, d_i, n_i, prior_planes_p,
                                   prior_depth_f, depth_sigma, angle_sigma,
                                   params.prior_gamma, params.prior_beta)
            adopt_m = prior_mask_p & in_range & (score_i > restricted_now)
            adopt_u = (~prior_mask_p) & in_range & (t_cost < cost_now)
            adopt_i = adopt_m | adopt_u
            restricted_now = jnp.where(adopt_m, score_i, restricted_now)
        else:
            adopt_i = in_range & (t_cost < cost_now)
        plane_now = jnp.where(adopt_i[..., None], plane_i, plane_now)
        cost_now = jnp.where(adopt_i, t_cost, cost_now)
        depth_now = jnp.where(adopt_i, d_before, depth_now)
        if geom:
            geom_now = jnp.where(adopt_i, t_geom, geom_now)

    return plane_now, cost_now, geom_now, sel_now


def _band_geometry(H: int, W: int, S: int, scale: int, geom: bool,
                   band_rows: int):
    """(halo, band height, band count, bottom padding) for a step."""
    halo = step_halo(scale)
    br = band_rows if band_rows > 0 else auto_band_rows(H, W, S, geom)
    br = min(br - (br % 2), H) or H
    n_bands = -(-H // br)
    return halo, br, n_bands, n_bands * br - H


def _pad_step_inputs(state: PatchMatchState, data: SolveData, halo: int,
                     pad_b: int, prior: bool):
    """Halo/band padding of the mutable state + per-step constants.

    +inf cost beyond the image == invalid propagation source (matches the
    whole-image path's shift fill); ref rows edge-replicate (CUDA clamp)."""
    pad_rows = lambda a, top, bottom, **kw: jnp.pad(
        a, [(top, bottom)] + [(0, 0)] * (a.ndim - 1), **kw)
    out = dict(
        cost_pad=pad_rows(state.cost, halo, halo + pad_b,
                          mode="constant", constant_values=jnp.inf),
        plane_pad=pad_rows(state.plane, halo, halo + pad_b, mode="constant"),
        sel_pad=pad_rows(state.sel, halo, halo + pad_b, mode="constant"),
        ref_pad=pad_rows(data.ref_img, halo, halo + pad_b, mode="edge"),
        geom_pad=pad_rows(state.geom_cost, 0, pad_b, mode="constant"),
    )
    if prior:
        out["prior_planes_pad"] = pad_rows(data.prior_planes, 0, pad_b,
                                           mode="constant")
        out["prior_mask_pad"] = pad_rows(data.prior_mask, 0, pad_b,
                                         mode="constant")
    return out


def _band_call(pads: dict, data: SolveData, params, scale: int,
               iteration: Array, phase: int, key_b: Array, key_step: Array,
               geom: bool, prior: bool, halo: int, br: int, y0: Array):
    """One band's update from the padded buffers (shared by the fused and
    stepped dispatch paths)."""
    Hs = br + 2 * halo
    sl = lambda a, h: jax.lax.dynamic_slice(
        a, (y0,) + (0,) * (a.ndim - 1), (h,) + a.shape[1:])
    return _band_step(
        data, params, scale, iteration, phase, key_b, key_step, geom, prior,
        halo, br, y0, sl(pads["cost_pad"], Hs), sl(pads["plane_pad"], Hs),
        sl(pads["sel_pad"], Hs), sl(pads["ref_pad"], Hs),
        sl(pads["geom_pad"], br),
        sl(pads["prior_planes_pad"], br) if prior else None,
        sl(pads["prior_mask_pad"], br) if prior else None)


def _merge_bands(state: PatchMatchState, phase: int, geom: bool,
                 plane_p, cost_p, geom_p, sel_p) -> PatchMatchState:
    """Scatter packed active-color results back into the dense state."""
    unpack_vec = lambda P, like: jnp.moveaxis(
        unpack_quincunx(jnp.moveaxis(P, -1, 0), phase,
                        jnp.moveaxis(like, -1, 0)), 0, -1)
    return PatchMatchState(
        plane=unpack_vec(plane_p, state.plane),
        cost=unpack_quincunx(cost_p, phase, state.cost),
        geom_cost=unpack_quincunx(geom_p, phase, state.geom_cost) if geom else state.geom_cost,
        sel=unpack_quincunx(sel_p, phase, state.sel),
    )


def checkerboard_step(
    state: PatchMatchState,
    data: SolveData,
    params,
    scale: int,
    iteration: Array,
    phase: int,
    key: Array,
    geom: bool,
    prior: bool,
    band_rows: int = 0,
) -> PatchMatchState:
    """One half-iteration (one checkerboard color), banded over rows.

    ``phase`` must be a static int (0 or 1); ``band_rows`` the band height
    (0 = automatic). H and W must be even (the solver pads)."""
    H, W = state.cost.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    S = data.src_imgs.shape[0]
    halo, br, n_bands, pad_b = _band_geometry(H, W, S, scale, geom, band_rows)
    Hb = n_bands * br
    pads = _pad_step_inputs(state, data, halo, pad_b, prior)

    def band_fn(b):
        return _band_call(pads, data, params, scale, iteration, phase,
                          jax.random.fold_in(key, b), key, geom, prior,
                          halo, br, b * br)

    if n_bands == 1:
        plane_p, cost_p, geom_p, sel_p = band_fn(jnp.int32(0))
    else:
        plane_b, cost_b, geom_b, sel_b = jax.lax.map(
            band_fn, jnp.arange(n_bands, dtype=jnp.int32))
        Wh = W // 2
        plane_p = plane_b.reshape(Hb, Wh, 4)[:H]
        cost_p = cost_b.reshape(Hb, Wh)[:H]
        geom_p = geom_b.reshape(Hb, Wh)[:H]
        sel_p = sel_b.reshape(Hb, Wh)[:H]

    return _merge_bands(state, phase, geom, plane_p, cost_p, geom_p, sel_p)


# ---------------------------------------------------------------------------
# Stepped dispatch: identical math, but padding / each band / the merge are
# separate device executions driven from the host. Required on runtimes that
# bound single-execution wall time (the tunneled bench chip kills executions
# over ~1 minute — the "TPU worker crashed" of rounds 1-2 — and a full solve
# in one program is minutes); also mirrors the reference's own granularity
# of one CUDA kernel launch per color per iteration with a device sync
# between them (PatchMatch.cu:1213-1217).
# ---------------------------------------------------------------------------

_pad_step_jit = jax.jit(_pad_step_inputs,
                        static_argnames=("halo", "pad_b", "prior"))
_band_call_jit = jax.jit(
    _band_call,
    static_argnames=("params", "scale", "phase", "geom", "prior", "halo",
                     "br"))
_merge_concat_jit = jax.jit(
    lambda state, phase, geom, outs, H: _merge_bands(
        state, phase, geom,
        *(jnp.concatenate(leaf)[:H] for leaf in zip(*outs))),
    static_argnames=("phase", "geom", "H"))


def checkerboard_step_stepped(
    state: PatchMatchState,
    data: SolveData,
    params,
    scale: int,
    iteration,
    phase: int,
    key: Array,
    geom: bool,
    prior: bool,
    band_rows: int = 0,
) -> PatchMatchState:
    """checkerboard_step with one device execution per band (plus a pad and
    a merge execution). Bit-identical schedule and per-band PRNG keys."""
    H, W = state.cost.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    S = data.src_imgs.shape[0]
    halo, br, n_bands, pad_b = _band_geometry(H, W, S, scale, geom, band_rows)
    pads = _pad_step_jit(state, data, halo=halo, pad_b=pad_b, prior=prior)
    iteration = jnp.int32(iteration)
    outs = []
    for b in range(n_bands):
        outs.append(_band_call_jit(
            pads, data, params, scale=scale, iteration=iteration, phase=phase,
            key_b=jax.random.fold_in(key, b), key_step=key, geom=geom,
            prior=prior, halo=halo, br=br, y0=jnp.int32(b * br)))
    if n_bands == 1:
        return _merge_bands(state, phase, geom, *outs[0])
    return _merge_concat_jit(state, phase, geom, outs, H=H)

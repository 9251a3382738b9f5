"""Solver op tests vs independent scalar NumPy oracles.

Each oracle is a direct per-pixel transcription of the reference CUDA
semantics (cited per test), written in float64 double loops — so the
vectorized float32 implementations are validated against the *math*, not
against themselves.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpmvs_tpu import geometry as geo
from mpmvs_tpu.params import PatchMatchParams
from mpmvs_tpu.ops.ncc import ncc_cost
from mpmvs_tpu.ops.view_selection import (initial_cost_and_views,
                                          monte_carlo_view_weights,
                                          decode_bits, encode_bits)
from mpmvs_tpu.ops.propagation import DIRS, select_candidates
from mpmvs_tpu.ops.filters import checkerboard_median_filter
from mpmvs_tpu.ops.geom_cost import geom_consistency_cost
from mpmvs_tpu.utils.synthetic import make_plane_scene
from tests.test_geometry import brute_force_homography


def _bilinear_clamped(img, x, y):
    h, w = img.shape
    x0 = int(np.floor(x)); y0 = int(np.floor(y))
    fx = x - x0; fy = y - y0
    cx0 = min(max(x0, 0), w - 1); cx1 = min(max(x0 + 1, 0), w - 1)
    cy0 = min(max(y0, 0), h - 1); cy1 = min(max(y0 + 1, 0), h - 1)
    top = img[cy0, cx0] * (1 - fx) + img[cy0, cx1] * fx
    bot = img[cy1, cx0] * (1 - fx) + img[cy1, cx1] * fx
    return top * (1 - fy) + bot * fy


def ncc_oracle(ref, src, ref_cam, src_cam, plane4, px, py, offsets,
               sigma_s, sigma_c, src_w, src_h):
    """Scalar ComputeBilateralNCC (PatchMatch.cu:325-458)."""
    H = brute_force_homography(ref_cam, src_cam, plane4[:3], plane4[3])
    hp = H @ np.array([px, py, 1.0])
    ptx, pty = hp[0] / hp[2], hp[1] / hp[2]
    if ptx >= src_w or ptx < 0 or pty >= src_h or pty < 0:
        return 2.0
    h_img, w_img = ref.shape
    center = ref[py, px]
    s_w = s_r = s_rr = s_s = s_ss = s_rs = 0.0
    for dx, dy in offsets:
        rx = min(max(px + dx, 0), w_img - 1)
        ry = min(max(py + dy, 0), h_img - 1)
        rpix = ref[ry, rx]
        w = math.exp(-math.sqrt(dx * dx + dy * dy) / (2 * sigma_s ** 2)
                     - abs(rpix - center) / (2 * sigma_c ** 2))
        q = H @ np.array([px + dx, py + dy, 1.0])
        spix = _bilinear_clamped(src, q[0] / q[2], q[1] / q[2])
        s_w += w; s_r += w * rpix; s_rr += w * rpix * rpix
        s_s += w * spix; s_ss += w * spix * spix; s_rs += w * rpix * spix
    inv = 1.0 / s_w
    mr, mrr = s_r * inv, s_rr * inv
    ms, mss, mrs = s_s * inv, s_ss * inv, s_rs * inv
    var_r = mrr - mr * mr
    var_s = mss - ms * ms
    if var_r < 1e-5 or var_s < 1e-5:
        return 2.0
    return max(0.0, min(2.0, 1.0 - (mrs - mr * ms) / math.sqrt(var_r * var_s)))


class TestNCC:
    @pytest.mark.parametrize("scale", [0, 2])
    def test_matches_scalar_oracle(self, scale):
        scene = make_plane_scene(num_views=2, height=48, width=64, seed=11)
        params = PatchMatchParams()
        cams = scene.cameras
        ref_cam, src_cam = cams.view(0), cams.view(1)
        rng = np.random.default_rng(5)
        x, y = geo.pixel_grid(48, 64)
        # planes near GT with noise so costs span the range
        n_cam = np.asarray(geo.normal_world_to_cam(ref_cam.R,
                                                   jnp.asarray(scene.gt_normal_world)))
        depth = scene.gt_depth[0] * rng.uniform(0.9, 1.1, (48, 64))
        normal = np.broadcast_to(n_cam, (48, 64, 3)) + 0.1 * rng.standard_normal((48, 64, 3))
        normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
        plane = geo.plane_from_depth_normal(ref_cam.K, x, y,
                                            jnp.asarray(depth, jnp.float32),
                                            jnp.asarray(normal, jnp.float32))
        A, b = geo.homography_terms(ref_cam.K, ref_cam.R, ref_cam.C,
                                    cams.K[1:], cams.R[1:], cams.C[1:])
        offsets = params.tap_offsets(scale)
        costs = np.asarray(ncc_cost(
            jnp.asarray(scene.images[0]), jnp.asarray(scene.images[1:]),
            cams.width[1:], cams.height[1:], A, b, ref_cam.K,
            plane, offsets, params.sigma_spatial, params.sigma_color))

        plane_np = np.asarray(plane)
        for px, py in rng.integers([0, 0], [64, 48], size=(25, 2)):
            expected = ncc_oracle(
                scene.images[0].astype(np.float64),
                scene.images[1].astype(np.float64),
                ref_cam, src_cam, plane_np[py, px].astype(np.float64),
                int(px), int(py), offsets,
                params.sigma_spatial, params.sigma_color,
                float(src_cam.width), float(src_cam.height))
            got = costs[0, py, px]
            assert got == pytest.approx(expected, abs=5e-3), (px, py, scale)


class TestViewSelection:
    def test_initial_topk_oracle(self):
        rng = np.random.default_rng(7)
        S, H, W = 6, 5, 4
        costs = rng.uniform(0, 2.2, (S, H, W)).astype(np.float32)
        costs[costs > 2.0] = 2.0
        cost, sel = initial_cost_and_views(jnp.asarray(costs), top_k=4)
        cost, sel = np.asarray(cost), np.asarray(sel)
        for yy in range(H):
            for xx in range(W):
                c = costs[:, yy, xx]
                valid = (c < 2.0).sum()
                k = min(valid, 4)
                if k == 0:
                    assert cost[yy, xx] == 2.0 and sel[yy, xx] == 0
                    continue
                s = np.sort(c)
                assert cost[yy, xx] == pytest.approx(s[:k].mean(), rel=1e-5)
                thr = s[k - 1]
                expected_mask = sum(1 << i for i in range(S) if c[i] <= thr)
                assert sel[yy, xx] == expected_mask

    def test_bitmask_roundtrip(self):
        rng = np.random.default_rng(8)
        masks = jnp.asarray(rng.integers(0, 2 ** 12, (3, 4)), jnp.int32)
        bits = decode_bits(masks, 12)
        np.testing.assert_array_equal(encode_bits(bits), masks)

    def test_mc_weights_concentrate_and_reproduce(self):
        H, W, S = 6, 8, 4
        cost_array = np.full((8, S, H, W), 2.0, np.float32)
        cost_array[:, 0] = 0.05  # view 0 is excellent everywhere
        cand_valid = np.ones((8, H, W), bool)
        neighbor_sel = np.full((4, H, W), 1, np.int32)  # neighbors chose view 0
        key = jax.random.PRNGKey(0)
        w1, norm1, sel1 = monte_carlo_view_weights(
            key, jnp.asarray(cost_array), jnp.asarray(cand_valid),
            jnp.asarray(neighbor_sel), jnp.asarray(cand_valid[:4]),
            jnp.int32(0))
        w2, _, _ = monte_carlo_view_weights(
            key, jnp.asarray(cost_array), jnp.asarray(cand_valid),
            jnp.asarray(neighbor_sel), jnp.asarray(cand_valid[:4]),
            jnp.int32(0))
        np.testing.assert_array_equal(w1, w2)  # reproducible
        w1 = np.asarray(w1)
        assert np.asarray(norm1).max() <= 15
        # essentially all draws land on view 0
        assert (w1[..., 0] >= 14).all()
        assert np.asarray(sel1).max() <= (1 << S) - 1

    def test_mc_weights_all_bad_views_zero(self):
        H, W, S = 4, 4, 3
        cost_array = np.full((8, S, H, W), 1.9, np.float32)  # all > 1.2
        cand_valid = np.ones((8, H, W), bool)
        neighbor_sel = np.zeros((4, H, W), np.int32)
        w, norm, sel = monte_carlo_view_weights(
            jax.random.PRNGKey(1), jnp.asarray(cost_array),
            jnp.asarray(cand_valid), jnp.asarray(neighbor_sel),
            jnp.asarray(cand_valid[:4]), jnp.int32(0))
        assert float(jnp.max(norm)) == 0.0
        assert int(jnp.max(sel)) == 0


class TestCandidateSelection:
    def test_matches_brute_force(self):
        rng = np.random.default_rng(9)
        H, W = 40, 50
        cost = rng.uniform(0, 2, (H, W)).astype(np.float32)
        plane = rng.standard_normal((H, W, 4)).astype(np.float32)
        cands, valid = select_candidates(jnp.asarray(cost), jnp.asarray(plane))
        cands, valid = np.asarray(cands), np.asarray(valid)
        for py, px in rng.integers([0, 0], [H, W], size=(30, 2)):
            for r, region in enumerate(DIRS):
                best, best_np = np.inf, None
                for dx, dy in region:
                    nx, ny = px + dx, py + dy
                    if not (0 <= nx < W and 0 <= ny < H):
                        continue
                    if cost[ny, nx] < best:
                        best, best_np = cost[ny, nx], (ny, nx)
                if best_np is None:
                    assert not valid[r, py, px]
                else:
                    assert valid[r, py, px]
                    np.testing.assert_array_equal(cands[r, py, px],
                                                  plane[best_np])


def median_filter_oracle(depth, cost):
    """Scalar CheckerboardFilter x2 phases (PatchMatch.cu:1036-1174)."""
    H, W = depth.shape
    out = depth.copy()
    for phase in (0, 1):
        src = out.copy()
        for py in range(H):
            for px in range(W):
                if (px + py) % 2 != phase or cost[py, px] < 0.001:
                    continue
                vals = [src[py, px]]
                def add(dx, dy, cond):
                    if cond:
                        vals.append(src[py + dy, px + dx])
                add(0, -1, py > 0); add(0, -3, py > 2); add(0, -5, py > 4)
                add(0, 1, py < H - 1); add(0, 3, py < H - 3); add(0, 5, py < H - 5)
                add(-1, 0, px > 0); add(-3, 0, px > 2); add(-5, 0, px > 4)
                add(1, 0, px < W - 1); add(3, 0, px < W - 3); add(5, 0, px < W - 5)
                add(2, -1, py > 0 and px < W - 2)
                add(2, 1, py < H - 1 and px < W - 2)
                add(-2, -1, py > 0 and px > 1)
                add(-2, 1, py < H - 1 and px > 1)
                add(-1, -2, px > 0 and py > 2)
                add(1, -2, px < W - 1 and py > 2)
                add(-1, 2, px > 0 and py < H - 2)
                add(1, 2, px < W - 1 and py < H - 2)
                v = np.sort(np.array(vals))
                n = len(v)
                out[py, px] = v[n // 2] if n % 2 else 0.5 * (v[n // 2 - 1] + v[n // 2])
    return out


class TestMedianFilter:
    def test_matches_scalar_oracle(self):
        rng = np.random.default_rng(10)
        H, W = 14, 17
        depth = rng.uniform(1, 10, (H, W)).astype(np.float32)
        cost = rng.uniform(0, 2, (H, W)).astype(np.float32)
        cost[3, 4] = 0.0  # skipped pixel
        got = np.asarray(checkerboard_median_filter(jnp.asarray(depth),
                                                    jnp.asarray(cost)))
        expected = median_filter_oracle(depth.astype(np.float64), cost)
        np.testing.assert_allclose(got, expected, rtol=1e-5)


class TestGeomCost:
    def test_consistent_depths_near_zero(self):
        scene = make_plane_scene(num_views=3, height=40, width=56, seed=12)
        cams = scene.cameras
        ref = cams.view(0)
        x, y = geo.pixel_grid(40, 56)
        n_cam = geo.normal_world_to_cam(ref.R, jnp.asarray(scene.gt_normal_world))
        plane = geo.plane_from_depth_normal(
            ref.K, x, y, jnp.asarray(scene.gt_depth[0]),
            jnp.broadcast_to(n_cam, (40, 56, 3)))
        cost = geom_consistency_cost(
            jnp.asarray(scene.gt_depth[1:]), cams.width[1:], cams.height[1:],
            ref.K, ref.R, ref.C, ref.t,
            cams.K[1:], cams.R[1:], cams.t[1:], cams.C[1:],
            plane, x, y)
        inner = np.asarray(cost)[:, 4:-4, 4:-4]
        assert np.median(inner) < 0.15, np.median(inner)

    def test_fused_matches_reference_formulation(self):
        """geom_consistency_cost_fused (precomposed transfer chains, shared
        u_fwd) must match the direct backproject/project formulation to
        float-reassociation tolerance on BOTH a consistent plane field and
        a wild random field (oob, behind-camera, clamped fetches)."""
        from mpmvs_tpu.ops.geom_cost import (backward_transfer_terms,
                                             geom_consistency_cost_fused)
        from mpmvs_tpu.ops import random as pmrand

        scene = make_plane_scene(num_views=3, height=40, width=56, seed=12)
        cams = scene.cameras
        ref = cams.view(0)
        x, y = geo.pixel_grid(40, 56)
        n_cam = geo.normal_world_to_cam(ref.R,
                                        jnp.asarray(scene.gt_normal_world))
        plane_gt = geo.plane_from_depth_normal(
            ref.K, x, y, jnp.asarray(scene.gt_depth[0]),
            jnp.broadcast_to(n_cam, (40, 56, 3)))
        plane_rand = pmrand.random_plane_field(
            jax.random.PRNGKey(3), ref.K, x, y,
            float(ref.depth_min), float(ref.depth_max))

        A_fwd, b_fwd = geo.homography_terms(ref.K, ref.R, ref.C,
                                            cams.K[1:], cams.R[1:],
                                            cams.C[1:])
        A_bwd, b_bwd = backward_transfer_terms(ref.K, ref.R, ref.C,
                                               cams.K[1:], cams.R[1:],
                                               cams.C[1:])
        p_hom = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
        u_fwd = jnp.einsum("sij,hwj->shwi", A_fwd, p_hom)
        for plane in (plane_gt, plane_rand):
            ref_cost = np.asarray(geom_consistency_cost(
                jnp.asarray(scene.gt_depth[1:]), cams.width[1:],
                cams.height[1:], ref.K, ref.R, ref.C, ref.t,
                cams.K[1:], cams.R[1:], cams.t[1:], cams.C[1:],
                plane, x, y))
            fused = np.asarray(geom_consistency_cost_fused(
                jnp.asarray(scene.gt_depth[1:]), cams.width[1:],
                cams.height[1:], u_fwd, b_fwd, A_bwd, b_bwd, ref.K,
                plane, x, y))
            # f32 reassociation of the composed 3x3 chains shifts the
            # reprojection error by <=~0.02 px (a <=0.004 cost delta after
            # the 0.2 geometric weight — two orders below the NCC cost
            # scale), and can flip a truncating nearest-fetch index on
            # exact-integer boundaries for a vanishing pixel fraction
            close = np.isclose(fused, ref_cost, atol=5e-2)
            assert close.mean() > 0.999, close.mean()
            assert np.abs(np.mean(fused) - np.mean(ref_cost)) < 1e-3

    def test_zero_src_depth_max_cost(self):
        scene = make_plane_scene(num_views=2, height=24, width=32, seed=13)
        cams = scene.cameras
        ref = cams.view(0)
        x, y = geo.pixel_grid(24, 32)
        n_cam = geo.normal_world_to_cam(ref.R, jnp.asarray(scene.gt_normal_world))
        plane = geo.plane_from_depth_normal(
            ref.K, x, y, jnp.asarray(scene.gt_depth[0]),
            jnp.broadcast_to(n_cam, (24, 32, 3)))
        zeros = jnp.zeros_like(jnp.asarray(scene.gt_depth[1:]))
        cost = geom_consistency_cost(
            zeros, cams.width[1:], cams.height[1:],
            ref.K, ref.R, ref.C, ref.t,
            cams.K[1:], cams.R[1:], cams.t[1:], cams.C[1:],
            plane, x, y)
        np.testing.assert_array_equal(np.asarray(cost), 3.0)


class TestBandedUniform:
    """ops/random.banded_uniform — tile-coherent uniform depth draws."""

    def test_support_and_tile_spread(self):
        from mpmvs_tpu.ops.random import banded_uniform

        lo, hi, frac = 2.0, 8.0, 1.0 / 16.0
        d = np.asarray(banded_uniform(jax.random.PRNGKey(0), (64, 512),
                                      lo, hi, frac))
        assert d.min() >= lo and d.max() <= hi
        # every 8x128 tile spans at most frac of the range
        band = frac * (hi - lo)
        for ty in range(8):
            for tx in range(4):
                t = d[8 * ty:8 * (ty + 1), 128 * tx:128 * (tx + 1)]
                assert t.max() - t.min() <= band + 1e-5
        # full-range coverage across tiles: both halves of the range hit
        mid = 0.5 * (lo + hi)
        assert (d < mid).any() and (d > mid).any()

    def test_marginal_near_uniform(self):
        from mpmvs_tpu.ops.random import banded_uniform

        d = np.asarray(banded_uniform(jax.random.PRNGKey(3), (512, 2048),
                                      0.0, 1.0, 1.0 / 16.0)).ravel()
        # trapezoidal marginal: interior deciles each hold ~10.7% (the
        # centers live on [h, 1-h] so the flat part is slightly denser);
        # tolerance covers the 1024-center sampling noise
        hist, _ = np.histogram(d, bins=10, range=(0.0, 1.0))
        interior = hist[1:-1] / d.size
        assert np.all(np.abs(interior - 0.1067) < 0.035), interior


class TestDisparityClampNeutrality:
    """The candidate-evaluation disparity clamp (ops/propagation._band_step)
    must be a bit-exact no-op for plausible fields — it only bounds junk
    extrapolations' kernel footprints."""

    @pytest.mark.slow
    def test_identical_on_coherent_slanted_field(self):
        from mpmvs_tpu.ops.propagation import PatchMatchState, checkerboard_step
        from mpmvs_tpu.params import PatchMatchParams
        from mpmvs_tpu.solver import build_solve_data
        from mpmvs_tpu.utils.synthetic import make_plane_scene
        from mpmvs_tpu.ops import random as pmrand

        scene = make_plane_scene(num_views=3, height=48, width=64, seed=2)
        data = build_solve_data(jnp.asarray(scene.images), scene.cameras)
        H, W = 48, 64
        x, y = geo.pixel_grid(H, W)
        # mildly slanted normals on the GT depth: a realistic surface
        n0 = jnp.broadcast_to(jnp.asarray([0.25, 0.1, -0.96]), (H, W, 3))
        n0 = n0 / jnp.linalg.norm(n0, axis=-1, keepdims=True)
        plane = geo.plane_from_depth_normal(
            data.K_ref, x, y, jnp.asarray(scene.gt_depth[0]), n0)
        state = PatchMatchState(
            plane=plane, cost=jnp.full((H, W), 0.5, jnp.float32),
            geom_cost=jnp.zeros((H, W), jnp.float32),
            sel=jnp.zeros((H, W), jnp.int32))
        key = jax.random.PRNGKey(7)
        outs = []
        for frac in (1.0 / 16.0, 0.0):
            params = PatchMatchParams(disp_clamp_frac=frac)
            st = checkerboard_step(state, data, params, 0, jnp.int32(0), 0,
                                   key, False, False, 0)
            outs.append(st)
        for a, b in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

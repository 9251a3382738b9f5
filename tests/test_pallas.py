"""Correctness of the Pallas source-sampling NCC kernel (ops/pallas_ncc.py)
against the XLA reference path, run in Pallas interpret mode so the CPU
suite exercises the kernel logic without TPU hardware.

The kernel is the solver's TPU hot path (auto-dispatch in
ops/propagation.py); before this test nothing executed it off-TPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpmvs_tpu import geometry as geo
from mpmvs_tpu.ops.ncc import ncc_eval, ncc_refside
from mpmvs_tpu.ops.pallas_ncc import ncc_eval_pallas
from mpmvs_tpu.params import PatchMatchParams
from mpmvs_tpu.solver import build_solve_data
from mpmvs_tpu.utils.synthetic import make_plane_scene


@pytest.fixture(scope="module")
def setup():
    scene = make_plane_scene(num_views=3, height=48, width=128, seed=7)
    params = PatchMatchParams()
    data = build_solve_data(jnp.asarray(scene.images), scene.cameras)
    return scene, params, data


def _eval_both(data, params, plane, x, y, offsets):
    args = (data.src_imgs, data.src_widths, data.src_heights,
            data.A, data.b, data.K_ref, plane, x, y)
    r0, rows = int(y[0, 0]), plane.shape[0]
    refside = ncc_refside(data.ref_img, r0, rows, offsets,
                          params.sigma_spatial, params.sigma_color)
    c_xla = ncc_eval(refside, *args, offsets, params.cost_max)
    c_pal = ncc_eval_pallas(refside, *args, tuple(offsets), params.cost_max,
                            interpret=True)
    return np.asarray(c_xla), np.asarray(c_pal)


def test_pallas_matches_xla_on_gt_plane(setup):
    scene, params, data = setup
    offsets = params.tap_offsets(0)
    H, W = data.ref_img.shape
    r0, rows = 12, 16
    x, y = geo.pixel_grid(rows, W)
    y = y + r0
    gt_depth = jnp.asarray(scene.gt_depth[0][r0:r0 + rows])
    n = jnp.concatenate([jnp.zeros((rows, W, 2)), -jnp.ones((rows, W, 1))], -1)
    plane = geo.plane_from_depth_normal(data.K_ref, x, y, gt_depth, n)
    c_xla, c_pal = _eval_both(data, params, plane, x, y, offsets)
    assert c_xla.shape == c_pal.shape
    # same costs up to float-accumulation order
    np.testing.assert_allclose(c_pal, c_xla, atol=2e-4)


def test_pallas_matches_xla_on_random_planes(setup):
    """Incoherent planes: exercises clipping, oob masking and the
    degenerate-variance branch across the full cost surface."""
    scene, params, data = setup
    offsets = params.tap_offsets(0)
    H, W = data.ref_img.shape
    r0, rows = 8, 16
    x, y = geo.pixel_grid(rows, W)
    y = y + r0
    key = jax.random.PRNGKey(0)
    from mpmvs_tpu.ops import random as pmrand
    plane = pmrand.random_plane_field(key, data.K_ref, x, y,
                                      data.depth_min, data.depth_max)
    c_xla, c_pal = _eval_both(data, params, plane, x, y, offsets)
    # oob/degenerate pixels must agree exactly (both cost_max)
    np.testing.assert_allclose(c_pal, c_xla, atol=2e-4)


class TestBilateralKernel:
    """ops/pallas_bilateral.py vs the portable jnp.roll implementation."""

    def test_matches_scan_oracle(self):
        from mpmvs_tpu.models.sky import bilateral_refine
        from mpmvs_tpu.ops.pallas_bilateral import bilateral_refine_pallas

        rng = np.random.default_rng(3)
        H, W = 52, 150
        bgr = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
        prob = rng.uniform(0, 1, (H, W)).astype(np.float32)
        ref_mask = bilateral_refine(bgr, prob, use_pallas=False)
        out = np.asarray(bilateral_refine_pallas(
            jnp.asarray(bgr), jnp.asarray(prob), interpret=True))
        assert ((out > 0.6) != ref_mask).mean() < 0.002

    def test_edge_exclusion(self):
        """Out-of-image taps carry zero weight: a uniform mask must stay
        exactly uniform at the borders (no dark-corner artifacts)."""
        from mpmvs_tpu.ops.pallas_bilateral import bilateral_refine_pallas

        H, W = 24, 140
        bgr = np.full((H, W, 3), 128.0, np.float32)
        prob = np.full((H, W), 0.7, np.float32)
        out = np.asarray(bilateral_refine_pallas(
            jnp.asarray(bgr), jnp.asarray(prob), interpret=True))
        np.testing.assert_allclose(out, 0.7, atol=1e-5)


def test_footprint_cap_parity_random_planes(setup):
    """With the footprint cap on, the kernel and the XLA path must agree on
    a random-plane field — including which hypotheses get capped to
    cost_max (the cap detection arithmetic is mirrored bit-for-bit)."""
    scene, params, data = setup
    offsets = params.tap_offsets(0)
    H, W = data.ref_img.shape
    r0, rows = 8, 16
    x, y = geo.pixel_grid(rows, W)
    y = y + r0
    from mpmvs_tpu.ops import random as pmrand
    plane = pmrand.random_plane_field(jax.random.PRNGKey(11), data.K_ref,
                                      x, y, data.depth_min, data.depth_max)
    cap = params.cap_radius(0)
    assert cap > 0.0
    refside = ncc_refside(data.ref_img, r0, rows, offsets,
                          params.sigma_spatial, params.sigma_color)
    args = (data.src_imgs, data.src_widths, data.src_heights,
            data.A, data.b, data.K_ref, plane, x, y)
    c_xla = np.asarray(ncc_eval(refside, *args, offsets, params.cost_max,
                                cap_radius=cap))
    c_pal = np.asarray(ncc_eval_pallas(refside, *args, tuple(offsets),
                                       params.cost_max, cap_radius=cap,
                                       interpret=True))
    np.testing.assert_allclose(c_pal, c_xla, atol=2e-4)
    # the cap must actually fire somewhere on a wild random field, and
    # uncapped evaluation must differ there
    c_free = np.asarray(ncc_eval(refside, *args, offsets, params.cost_max))
    fired = (c_xla == params.cost_max) & (c_free != params.cost_max)
    assert fired.any()


def test_footprint_cap_no_op_on_gt_plane(setup):
    """A well-behaved (ground-truth) plane field never trips the cap: the
    capped cost equals the uncapped cost everywhere."""
    scene, params, data = setup
    offsets = params.tap_offsets(0)
    H, W = data.ref_img.shape
    r0, rows = 12, 16
    x, y = geo.pixel_grid(rows, W)
    y = y + r0
    gt_depth = jnp.asarray(scene.gt_depth[0][r0:r0 + rows])
    n = jnp.concatenate([jnp.zeros((rows, W, 2)), -jnp.ones((rows, W, 1))], -1)
    plane = geo.plane_from_depth_normal(data.K_ref, x, y, gt_depth, n)
    refside = ncc_refside(data.ref_img, r0, rows, offsets,
                          params.sigma_spatial, params.sigma_color)
    args = (data.src_imgs, data.src_widths, data.src_heights,
            data.A, data.b, data.K_ref, plane, x, y)
    c_free = np.asarray(ncc_eval(refside, *args, offsets, params.cost_max))
    c_cap = np.asarray(ncc_eval(refside, *args, offsets, params.cost_max,
                                cap_radius=params.cap_radius(0)))
    np.testing.assert_array_equal(c_cap, c_free)


@pytest.mark.slow
def test_multi_matches_single_calls(setup):
    """The K-stacked kernel must reproduce K independent single calls
    bit-for-bit (the union sweep adds exact zeros in the same order) on a
    solver-realistic hypothesis mix: GT plane, banded-random depth with
    random normals, and a perturbed field."""
    from mpmvs_tpu.ops import random as pmrand
    from mpmvs_tpu.ops.pallas_ncc import ncc_eval_pallas_multi

    scene, params, data = setup
    offsets = tuple(params.tap_offsets(0))
    H, W = data.ref_img.shape
    r0, rows = 8, 16
    x, y = geo.pixel_grid(rows, W)
    y = y + r0
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    gt_depth = jnp.asarray(scene.gt_depth[0][r0:r0 + rows])
    n_flat = jnp.concatenate([jnp.zeros((rows, W, 2)), -jnp.ones((rows, W, 1))], -1)
    p_gt = geo.plane_from_depth_normal(data.K_ref, x, y, gt_depth, n_flat)
    d_band = pmrand.banded_uniform(k1, (rows, W), data.depth_min,
                                   data.depth_max, params.random_band_frac)
    n_rand = pmrand.random_normal_field(k2, data.K_ref, x, y)
    p_band = geo.plane_from_depth_normal(data.K_ref, x, y, d_band, n_rand)
    n_pert = pmrand.perturbed_normal_field(k3, data.K_ref, x, y, n_flat, 0.3)
    p_pert = geo.plane_from_depth_normal(data.K_ref, x, y, gt_depth, n_pert)
    planes = jnp.stack([p_gt, p_band, p_pert])
    cap = params.cap_radius(0)

    refside = ncc_refside(data.ref_img, r0, rows, offsets,
                          params.sigma_spatial, params.sigma_color)
    args = (data.src_imgs, data.src_widths, data.src_heights,
            data.A, data.b, data.K_ref)
    multi = np.asarray(ncc_eval_pallas_multi(
        refside, *args, planes, x, y, offsets, params.cost_max,
        cap_radius=cap, interpret=True))
    for k in range(3):
        single = np.asarray(ncc_eval_pallas(
            refside, *args, planes[k], x, y, offsets, params.cost_max,
            cap_radius=cap, interpret=True))
        np.testing.assert_array_equal(multi[k], single)
    # and against the XLA oracle
    for k in range(3):
        oracle = np.asarray(ncc_eval(refside, *args, planes[k], x, y,
                                     offsets, params.cost_max,
                                     cap_radius=cap))
        np.testing.assert_allclose(multi[k], oracle, atol=2e-4)


@pytest.mark.slow
def test_sorted_scatter_matches_xla_on_random_planes(setup):
    """ncc_eval_pallas_sorted (per-view bucketing + vals-out + XLA ZNCC)
    must reproduce ncc_eval on an incoherent random-plane field."""
    from mpmvs_tpu.ops.pallas_ncc import ncc_eval_pallas_sorted
    from mpmvs_tpu.ops.random import random_plane_field

    scene, params, data = setup
    offsets = params.tap_offsets(0)
    H, W = data.ref_img.shape
    r0, rows = 8, 16
    x, y = geo.pixel_grid(rows, W)
    y = y + r0
    plane = random_plane_field(jax.random.PRNGKey(5), data.K_ref, x, y,
                               data.depth_min, data.depth_max)
    refside = ncc_refside(data.ref_img, r0, rows, offsets,
                          params.sigma_spatial, params.sigma_color)
    args = (data.src_imgs, data.src_widths, data.src_heights,
            data.A, data.b, data.K_ref, plane, x, y)
    c_xla = np.asarray(ncc_eval(refside, *args, offsets, params.cost_max))
    c_srt = np.asarray(ncc_eval_pallas_sorted(
        refside, *args, tuple(offsets), params.cost_max, interpret=True))
    np.testing.assert_allclose(c_srt, c_xla, atol=2e-4)


class TestQuadTexture:
    """Quad-packed 8-bit sampling (params.src_quant8, round 5): one gather
    per (tap, pair-row) fetches all 4 bilinear corners from a prepacked
    int32 texture (solver.pack_source_quads)."""

    def _eval_quad_and_f32(self, images, scale=0):
        from mpmvs_tpu.ops.pallas_ncc import ncc_eval_pallas_multi
        from mpmvs_tpu.ops import random as rnd

        scene = make_plane_scene(num_views=3, height=48, width=128, seed=7)
        params = PatchMatchParams()
        data = build_solve_data(images, scene.cameras, quant8=True)
        offsets = tuple(params.tap_offsets(scale))
        cap = params.cap_radius(scale)
        rows, W = 16, 128
        r0 = 16
        x, y = geo.pixel_grid(rows, W)
        y = y + r0
        refside = ncc_refside(data.ref_img, r0, rows, offsets,
                              params.sigma_spatial, params.sigma_color)
        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        n = rnd.cone_normal_field(k1, data.K_ref, x, y, 0.9)
        d = rnd.smooth_banded_uniform(*jax.random.split(k2), x, y,
                                      data.depth_min, data.depth_max,
                                      1.0 / 16.0)
        planes = geo.plane_from_depth_normal(data.K_ref, x, y, d, n)[None]
        args = (refside, data.src_imgs, data.src_widths, data.src_heights,
                data.A, data.b, data.K_ref, planes, x, y, offsets,
                params.cost_max)
        c_f32 = ncc_eval_pallas_multi(*args, cap_radius=cap, interpret=True)
        c_quad = ncc_eval_pallas_multi(
            *args, cap_radius=cap, interpret=True,
            src_quads=data.src_quads, quad_lo=data.quad_lo,
            quad_iscale=data.quad_iscale)
        return np.asarray(c_f32), np.asarray(c_quad), data

    def test_exact_on_byte_grid_imagery(self):
        """Byte-integer imagery (the reference's input domain) quantizes
        exactly: quad costs match the f32 kernel to accumulation order."""
        scene = make_plane_scene(num_views=3, height=48, width=128, seed=7)
        images = jnp.round(jnp.asarray(scene.images))  # integer 0..255
        c_f32, c_quad, data = self._eval_quad_and_f32(images)
        assert float(data.quad_lo) == 0.0
        assert abs(float(data.quad_iscale) - 1.0) < 1e-6
        np.testing.assert_allclose(c_quad, c_f32, atol=5e-4)

    def test_close_on_continuous_imagery(self):
        """Continuous float imagery: quantization adds ~1/512-of-range
        sample noise; costs agree within a small tolerance."""
        scene = make_plane_scene(num_views=3, height=48, width=128, seed=7)
        c_f32, c_quad, _ = self._eval_quad_and_f32(
            jnp.asarray(scene.images))
        diff = np.abs(c_quad - c_f32)
        assert diff.max() < 3e-2, diff.max()
        assert diff.mean() < 3e-3, diff.mean()

    def test_pack_source_quads_layout(self):
        from mpmvs_tpu.solver import pack_source_quads

        src = jnp.arange(2 * 16 * 128, dtype=jnp.float32).reshape(
            2, 16, 128) % 251.0
        quads, lo, iscale = pack_source_quads(src)
        assert quads.shape == (2, 8, 128) and quads.dtype == jnp.int32
        q = np.asarray(quads)
        s = np.asarray(jnp.round(src)).astype(np.int64)
        r2, c = 3, 17
        expect = (s[1, 2 * r2, c] | (s[1, 2 * r2, c + 1] << 8)
                  | (s[1, 2 * r2 + 1, c] << 16)
                  | (s[1, 2 * r2 + 1, c + 1] << 24))
        assert (np.int64(q[1, r2, c]) & 0xFFFFFFFF) == expect

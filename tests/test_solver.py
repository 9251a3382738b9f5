"""End-to-end solver tests on synthetic ground-truth scenes.

These are the integration ladder of BASELINE.json configs 1-3: single-pair
photometric, multi-view photometric, geometric-consistency joint pass.
Small images + reduced iteration counts keep CPU compile time bounded.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpmvs_tpu.params import PatchMatchParams
from mpmvs_tpu.solver import solve_view, PatchMatchSolver
from mpmvs_tpu.utils.synthetic import make_plane_scene

FAST = PatchMatchParams(max_iterations=2, max_scale=0, geom_iterations=1)


@pytest.fixture(scope="module")
def scene():
    return make_plane_scene(num_views=3, height=64, width=80, seed=3)


@pytest.fixture(scope="module")
def photometric_result(scene):
    return solve_view(jnp.asarray(scene.images), scene.cameras,
                      jax.random.PRNGKey(0), FAST, "photometric")


class TestPhotometric:
    def test_depth_accuracy(self, scene, photometric_result):
        d = np.asarray(photometric_result.depth)
        rel = np.abs(d - scene.gt_depth[0]) / scene.gt_depth[0]
        assert np.median(rel) < 0.005, np.median(rel)
        assert (rel < 0.01).mean() > 0.9

    def test_normals_point_at_cameras(self, scene, photometric_result):
        n = np.asarray(photometric_result.normal)
        align = (n * scene.gt_normal_world).sum(-1)
        assert np.median(align) > 0.98

    def test_costs_low_and_bounded(self, photometric_result):
        c = np.asarray(photometric_result.cost)
        assert np.isfinite(c).all()
        assert c.min() >= 0.0 and c.max() <= 2.0
        assert np.median(c) < 0.2

    def test_reproducible(self, scene, photometric_result):
        again = solve_view(jnp.asarray(scene.images), scene.cameras,
                           jax.random.PRNGKey(0), FAST, "photometric")
        np.testing.assert_array_equal(np.asarray(again.depth),
                                      np.asarray(photometric_result.depth))

    def test_different_seed_different_noise(self, scene, photometric_result):
        other = solve_view(jnp.asarray(scene.images), scene.cameras,
                           jax.random.PRNGKey(42), FAST, "photometric")
        assert not np.array_equal(np.asarray(other.depth),
                                  np.asarray(photometric_result.depth))


class TestGeometric:
    def test_geom_pass_improves_or_holds(self, scene, photometric_result):
        # neighbor depth maps: use GT for the sources (exact oracle input)
        src_depths = jnp.asarray(scene.gt_depth[1:])
        res = solve_view(jnp.asarray(scene.images), scene.cameras,
                         jax.random.PRNGKey(3), FAST, "geom",
                         warm=photometric_result, src_depths=src_depths)
        d = np.asarray(res.depth)
        rel = np.abs(d - scene.gt_depth[0]) / scene.gt_depth[0]
        rel0 = np.abs(np.asarray(photometric_result.depth) - scene.gt_depth[0]) / scene.gt_depth[0]
        assert np.median(rel) <= np.median(rel0) * 1.5
        assert (rel < 0.01).mean() > 0.9
        g = np.asarray(res.geom_cost)
        assert np.isfinite(g).all() and np.median(g) < 0.5


class TestPrior:
    def test_prior_mode_with_gt_prior(self, scene, photometric_result):
        """Prior-regularized run with the GT plane as prior: masked pixels
        should end close to the prior."""
        from mpmvs_tpu import geometry as geo
        cams = scene.cameras
        ref = cams.view(0)
        H, W = 64, 80
        x, y = geo.pixel_grid(H, W)
        n_cam = geo.normal_world_to_cam(ref.R, jnp.asarray(scene.gt_normal_world))
        prior_planes = geo.plane_from_depth_normal(
            ref.K, x, y, jnp.asarray(scene.gt_depth[0]),
            jnp.broadcast_to(n_cam, (H, W, 3)))
        prior_mask = jnp.ones((H, W), bool)
        res = solve_view(jnp.asarray(scene.images), scene.cameras,
                         jax.random.PRNGKey(5), FAST, "prior",
                         warm=photometric_result,
                         prior_planes=prior_planes, prior_mask=prior_mask)
        d = np.asarray(res.depth)
        rel = np.abs(d - scene.gt_depth[0]) / scene.gt_depth[0]
        assert np.median(rel) < 0.01, np.median(rel)


class TestGeomPrior:
    def test_combined_mode_uses_neighbor_depths(self, scene, photometric_result):
        """geom_prior scoring must depend on the source depth maps (the
        0.2-weighted geometric term stays in the prior sub-run)."""
        from mpmvs_tpu import geometry as geo
        cams = scene.cameras
        ref = cams.view(0)
        H, W = 64, 80
        x, y = geo.pixel_grid(H, W)
        n_cam = geo.normal_world_to_cam(ref.R, jnp.asarray(scene.gt_normal_world))
        prior_planes = geo.plane_from_depth_normal(
            ref.K, x, y, jnp.asarray(scene.gt_depth[0]),
            jnp.broadcast_to(n_cam, (H, W, 3)))
        prior_mask = jnp.ones((H, W), bool)
        kw = dict(warm=photometric_result, prior_planes=prior_planes,
                  prior_mask=prior_mask)
        res_good = solve_view(jnp.asarray(scene.images), scene.cameras,
                              jax.random.PRNGKey(9), FAST, "geom_prior",
                              src_depths=jnp.asarray(scene.gt_depth[1:]), **kw)
        res_bad = solve_view(jnp.asarray(scene.images), scene.cameras,
                             jax.random.PRNGKey(9), FAST, "geom_prior",
                             src_depths=jnp.asarray(scene.gt_depth[1:]) * 1.5,
                             **kw)
        assert not np.array_equal(np.asarray(res_good.cost),
                                  np.asarray(res_bad.cost))
        # with consistent neighbors the result stays accurate
        d = np.asarray(res_good.depth)
        rel = np.abs(d - scene.gt_depth[0]) / scene.gt_depth[0]
        assert np.median(rel) < 0.01, np.median(rel)
        assert np.isfinite(np.asarray(res_good.geom_cost)).all()


class TestSolverWrapper:
    def test_lifecycle(self, scene):
        solver = PatchMatchSolver(FAST, seed=7)
        res = solver.photometric(scene.images, scene.cameras)
        assert res.depth.shape == (64, 80)
        res_g = solver.geometric(scene.images, scene.cameras, res,
                                 scene.gt_depth[1:])
        assert res_g.depth.shape == (64, 80)


class TestSteppedDispatch:
    """solve_view_stepped runs the same math with host-driven per-band
    dispatch (for runtimes that bound single-execution wall time — the
    r1/r2 bench "worker crash"). Guarantees tested:

      * a single half-iteration agrees to float-fusion tolerance between
        the fused and stepped paths (same schedule, same per-band PRNG
        fold; XLA compiles the two in different fusion contexts, so
        last-ulp differences can flip a handful of near-tie adoptions);
      * end-to-end results agree statistically."""

    def test_step_matches(self, scene):
        from mpmvs_tpu.ops import propagation as P
        from mpmvs_tpu.solver import build_solve_data, _initial_state

        params = PatchMatchParams(sampler="xla", band_rows=32)
        data = build_solve_data(jnp.asarray(scene.images), scene.cameras)
        st0 = _initial_state(data, params, jax.random.PRNGKey(3),
                             "photometric", None, 32)
        k = jax.random.PRNGKey(9)
        a = P.checkerboard_step(st0, data, params, 0, jnp.int32(1), 0, k,
                                False, False, 32)
        b = P.checkerboard_step_stepped(st0, data, params, 0, 1, 0, k,
                                        False, False, 32)
        for n in ("plane", "cost"):
            av = np.asarray(getattr(a, n))
            bv = np.asarray(getattr(b, n))
            close = np.isclose(av, bv, atol=1e-4, rtol=1e-4)
            assert close.mean() > 0.99, (n, close.mean())
        sel_same = (np.asarray(a.sel) == np.asarray(b.sel)).mean()
        assert sel_same > 0.99, sel_same

    @pytest.mark.slow
    def test_stepped_end_to_end_agrees(self, scene):
        from mpmvs_tpu.solver import solve_view_stepped

        imgs = jnp.asarray(scene.images)
        key = jax.random.PRNGKey(4)
        params = PatchMatchParams(sampler="xla", band_rows=32,
                                  max_iterations=1, max_scale=1)
        rf = solve_view(imgs, scene.cameras, key, params, "photometric")
        rs = solve_view_stepped(imgs, scene.cameras, key, params,
                                "photometric")
        df = np.asarray(rf.depth)
        ds = np.asarray(rs.depth)
        rel = np.abs(df - ds) / np.maximum(df, 1e-6)
        assert np.median(rel) < 1e-4
        assert (rel < 0.01).mean() > 0.97, (rel < 0.01).mean()

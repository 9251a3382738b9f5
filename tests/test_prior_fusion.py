"""Planar-prior subsystem and fusion tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from mpmvs_tpu import geometry as geo
from mpmvs_tpu.io.cams import Scene
from mpmvs_tpu.prior import (build_planar_prior, select_seeds_photometric,
                             select_seeds_geometric, delaunay_triangulate,
                             fit_triangle_planes)
from mpmvs_tpu.fusion import run_fusion
from mpmvs_tpu.utils.synthetic import make_plane_scene


class TestSeeds:
    def test_photometric_block_rule(self):
        cost = np.full((10, 10), 1.5, np.float32)
        cost[2, 3] = 0.05   # block (0,0)
        cost[7, 8] = 0.02   # block (1,1)
        cost[2, 8] = 0.3    # block (0,1): above 0.1 threshold -> no seed
        seeds = select_seeds_photometric(cost)
        assert {(3, 2), (8, 7)} == {tuple(p) for p in seeds}

    def test_geometric_rule_caps_three_per_block(self):
        cost = np.full((5, 5), 1.8, np.float32)
        geom = np.full((5, 5), 1.0, np.float32)
        for i, (r, c) in enumerate([(0, 0), (1, 1), (2, 2), (3, 3)]):
            cost[r, c] = 0.05 + 0.01 * i
            geom[r, c] = 0.1
        seeds = select_seeds_geometric(cost, geom)
        assert len(seeds) == 3
        assert (0, 0) in {tuple(p) for p in seeds}

    def test_delaunay_covers_plane(self):
        pts = np.array([[0, 0], [10, 0], [0, 10], [10, 10], [5, 5]], np.int32)
        tris = delaunay_triangulate(pts)
        assert len(tris) >= 4

    def test_too_few_seeds_none(self):
        cost = np.full((20, 20), 1.9, np.float32)
        depth = np.ones((20, 20), np.float32)
        assert build_planar_prior(depth, cost, np.eye(3), 0.1, 10.0) is None


class TestPlaneFit:
    def test_plane_through_three_points(self):
        scene = make_plane_scene(num_views=1, height=48, width=64, seed=4)
        ref = scene.cameras.view(0)
        K = np.asarray(ref.K, np.float64)
        tris = np.array([[[10, 10], [40, 12], [20, 35]]], np.int32)
        planes = fit_triangle_planes(tris, scene.gt_depth[0], K)
        # the fitted plane must reproduce each vertex's depth
        x, y = geo.pixel_grid(48, 64)
        d = np.asarray(geo.depth_from_plane(
            jnp.asarray(K, jnp.float32),
            jnp.broadcast_to(jnp.asarray(planes[0]), (48, 64, 4)), x, y))
        for vx, vy in tris[0]:
            assert d[vy, vx] == pytest.approx(scene.gt_depth[0][vy, vx], rel=1e-3)
        assert planes[0, 3] >= 0  # sign normalization


class TestPriorEndToEnd:
    def test_gt_prior_reconstruction(self):
        scene = make_plane_scene(num_views=2, height=60, width=75, seed=5)
        ref = scene.cameras.view(0)
        cost = np.full((60, 75), 0.05, np.float32)
        prior = build_planar_prior(scene.gt_depth[0], cost, np.asarray(ref.K),
                                   float(ref.depth_min) * 0.6,
                                   float(ref.depth_max) * 1.2)
        assert prior is not None
        assert prior.mask.mean() > 0.5
        x, y = geo.pixel_grid(60, 75)
        d = np.asarray(geo.depth_from_plane(
            jnp.asarray(ref.K), jnp.asarray(prior.planes), x, y))
        rel = np.abs(d - scene.gt_depth[0]) / scene.gt_depth[0]
        assert np.median(rel[prior.mask]) < 1e-3


class TestFusion:
    def _scenes(self, V):
        return [Scene(ref_id=i, src_ids=[i] + [j for j in range(V) if j != i])
                for i in range(V)]

    def test_gt_inputs_fuse_onto_plane(self):
        scene = make_plane_scene(num_views=3, height=48, width=64, seed=6)
        V = 3
        normals = np.broadcast_to(scene.gt_normal_world, (V, 48, 64, 3)).copy()
        pts, nrm, col = run_fusion(scene.gt_depth, normals, scene.colors,
                                   scene.cameras, self._scenes(V))
        assert len(pts) > 500
        dist = np.abs(pts @ scene.gt_normal_world)
        assert np.percentile(dist, 99) < 1e-3
        assert np.isfinite(pts).all()

    def test_inconsistent_depths_rejected(self):
        scene = make_plane_scene(num_views=3, height=48, width=64, seed=6)
        V = 3
        normals = np.broadcast_to(scene.gt_normal_world, (V, 48, 64, 3)).copy()
        depths = scene.gt_depth.copy()
        depths[1:] *= 1.5  # sources disagree with ref by 50%
        pts, _, _ = run_fusion(depths, normals, scene.colors,
                               scene.cameras, self._scenes(V))
        assert len(pts) == 0

    def test_static_consistency_needs_two(self):
        scene = make_plane_scene(num_views=3, height=48, width=64, seed=6)
        V = 3
        normals = np.broadcast_to(scene.gt_normal_world, (V, 48, 64, 3)).copy()
        depths = scene.gt_depth.copy()
        depths[2] = 0.0  # only one usable source
        pts_dyn, _, _ = run_fusion(depths, normals, scene.colors,
                                   scene.cameras, self._scenes(V),
                                   use_dynamic=True)
        pts_static, _, _ = run_fusion(depths, normals, scene.colors,
                                      scene.cameras, self._scenes(V),
                                      use_dynamic=False)
        # view 2 can produce nothing; ref 0 with a single consistent
        # neighbor passes dynamic (n>=1) but fails static (n>=2)
        assert len(pts_dyn) > len(pts_static)

    def test_consumed_pixels_not_reused(self):
        scene = make_plane_scene(num_views=3, height=48, width=64, seed=6)
        V = 3
        normals = np.broadcast_to(scene.gt_normal_world, (V, 48, 64, 3)).copy()
        pts, _, _ = run_fusion(scene.gt_depth, normals, scene.colors,
                               scene.cameras, self._scenes(V))
        # all views see the same plane; masking must prevent ~3x duplication
        assert len(pts) < 1.2 * 48 * 64

    def test_gate_funnel_consistent_with_accept(self):
        """fusion_gate_funnel's chain must be monotone, and its dynamic
        acceptance count must equal fuse_one_view's (the funnel skips only
        the last-source holdout quirk, which GT-consistent inputs never
        trigger differently: every source is consistent everywhere)."""
        import jax
        from mpmvs_tpu.fusion import (FusionInput, fuse_one_view,
                                      fusion_gate_funnel)

        scene = make_plane_scene(num_views=3, height=48, width=64, seed=6)
        V = 3
        normals = np.broadcast_to(scene.gt_normal_world, (V, 48, 64, 3)).copy()
        inp = FusionInput(depths=jnp.asarray(scene.gt_depth),
                          normals=jnp.asarray(normals),
                          colors=jnp.asarray(scene.colors),
                          cameras=scene.cameras)
        masks = jnp.zeros((V, 48, 64), bool)
        src_idx = jnp.asarray([1, 2], jnp.int32)
        src_valid = jnp.asarray([True, True])
        funnel = fusion_gate_funnel(inp, masks, jnp.int32(0), src_idx,
                                    src_valid)
        funnel = {k: int(v) for k, v in funnel.items()}
        order = ["candidates", "in_bounds", "src_not_consumed",
                 "src_depth_pos", "reproj_lt2", "rel_dd_lt_0.01",
                 "angle_lt_10deg"]
        for a, b in zip(order, order[1:]):
            assert funnel[a] >= funnel[b], (a, b, funnel)
        assert funnel["angle_lt_10deg"] > 0
        out = fuse_one_view(inp, masks, jnp.int32(0), src_idx, src_valid,
                            use_dynamic=True)
        n_accept = int(np.asarray(out.accept).sum())
        # the funnel ignores the last-source holdout gate, so it can only
        # over-count, and only at pixels with exactly one consistent source
        assert funnel["px_dynamic_accept"] >= n_accept
        assert (funnel["px_dynamic_accept"] - n_accept
                <= funnel["px_ncons_ge1"] - funnel["px_ncons_ge2"])

    def test_sky_mask_skips(self):
        scene = make_plane_scene(num_views=3, height=48, width=64, seed=6)
        V = 3
        normals = np.broadcast_to(scene.gt_normal_world, (V, 48, 64, 3)).copy()
        sky = np.ones((V, 48, 64), bool)
        pts, _, _ = run_fusion(scene.gt_depth, normals, scene.colors,
                               scene.cameras, self._scenes(V), sky_masks=sky)
        assert len(pts) == 0

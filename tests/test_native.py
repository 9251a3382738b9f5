"""Native C++ component tests (skipped when the library isn't built)."""

import numpy as np
import pytest

from mpmvs_tpu import native
from mpmvs_tpu.io.cams import Scene
from mpmvs_tpu.fusion import run_fusion
from mpmvs_tpu.utils.synthetic import make_plane_scene

pytestmark = pytest.mark.skipif(
    not (native.available() or native.build()),
    reason="native library not built and toolchain unavailable")


class TestDelaunay:
    def test_triangle_count_close_to_scipy(self):
        from scipy.spatial import Delaunay
        rng = np.random.default_rng(1)
        pts = rng.uniform(0, 50, (120, 2))
        ours = native.delaunay(pts)
        ref = Delaunay(pts)
        assert abs(len(ours) - len(ref.simplices)) <= 3

    def test_delaunay_empty_circumcircles(self):
        """Delaunay property: no point strictly inside any circumcircle."""
        rng = np.random.default_rng(2)
        pts = rng.uniform(0, 10, (60, 2))
        tris = native.delaunay(pts)
        for t in tris[:50]:
            a, b, c = pts[t]
            d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1])
                     + c[0] * (a[1] - b[1]))
            ux = ((a @ a) * (b[1] - c[1]) + (b @ b) * (c[1] - a[1])
                  + (c @ c) * (a[1] - b[1])) / d
            uy = ((a @ a) * (c[0] - b[0]) + (b @ b) * (a[0] - c[0])
                  + (c @ c) * (b[0] - a[0])) / d
            r2 = (a[0] - ux) ** 2 + (a[1] - uy) ** 2
            dist2 = (pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2
            assert (dist2 >= r2 * (1 - 1e-9)).sum() >= len(pts) - 3

    def test_collinear_points_no_crash(self):
        pts = np.stack([np.arange(10.0), np.zeros(10)], 1)
        tris = native.delaunay(pts)
        assert len(tris) == 0  # degenerate: no valid triangles


class TestExactFusion:
    def test_matches_jax_fusion_on_gt(self):
        scene = make_plane_scene(num_views=3, height=48, width=64, seed=6)
        V = 3
        normals = np.broadcast_to(scene.gt_normal_world, (V, 48, 64, 3)).copy()
        scenes = [Scene(ref_id=i, src_ids=[i] + [j for j in range(V) if j != i])
                  for i in range(V)]
        p1, n1, c1 = native.fuse_exact(scene.gt_depth, normals, scene.colors,
                                       scene.cameras, scenes)
        p2, n2, c2 = run_fusion(scene.gt_depth, normals, scene.colors,
                                scene.cameras, scenes)
        # on consistent GT input the ordering relaxation is a no-op
        assert len(p1) == len(p2)
        d1 = np.abs(p1 @ scene.gt_normal_world)
        assert np.percentile(d1, 99) < 1e-3

    def test_sky_mask_and_static_mode(self):
        scene = make_plane_scene(num_views=3, height=32, width=48, seed=7)
        V = 3
        normals = np.broadcast_to(scene.gt_normal_world, (V, 32, 48, 3)).copy()
        scenes = [Scene(ref_id=i, src_ids=[i] + [j for j in range(V) if j != i])
                  for i in range(V)]
        sky = np.ones((V, 32, 48), np.uint8)
        p, _, _ = native.fuse_exact(scene.gt_depth, normals, scene.colors,
                                    scene.cameras, scenes, sky_masks=sky)
        assert len(p) == 0
        p2, _, _ = native.fuse_exact(scene.gt_depth, normals, scene.colors,
                                     scene.cameras, scenes, use_dynamic=False)
        assert len(p2) > 0

"""Geometry unit tests against brute-force NumPy references.

The NumPy oracles below re-derive the math independently (full 3x3 matrix
products per pixel) so the vectorized/factorized jnp implementations in
mpmvs_tpu.geometry are checked against a straight transcription of the
projective equations, not against themselves.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mpmvs_tpu import geometry as geo
from mpmvs_tpu.camera import Camera, CameraStack
from mpmvs_tpu.utils.synthetic import make_plane_scene


def random_camera(rng, width=64, height=48):
    angle = rng.uniform(-0.3, 0.3, 3)

    def rot(ax, ang):
        c, s = np.cos(ang), np.sin(ang)
        m = np.eye(3)
        i, j = [(1, 2), (0, 2), (0, 1)][ax]
        m[i, i] = c; m[j, j] = c; m[i, j] = -s; m[j, i] = s
        return m

    R = rot(0, angle[0]) @ rot(1, angle[1]) @ rot(2, angle[2])
    t = rng.uniform(-1, 1, 3)
    K = np.array([[100.0, 0, width / 2], [0, 110.0, height / 2], [0, 0, 1]])
    return Camera.create(K=K, R=R, t=t, width=width, height=height,
                         depth_min=1.0, depth_max=10.0)


def brute_force_homography(ref: Camera, src: Camera, n, w):
    """Direct transcription of ComputeHomography (PatchMatch.cu:228-279)."""
    Kr = np.array(ref.K, np.float64)
    Ks = np.array(src.K, np.float64)
    Rr = np.array(ref.R, np.float64)
    Rs = np.array(src.R, np.float64)
    Cr = np.array(ref.C, np.float64)
    Cs = np.array(src.C, np.float64)
    R_rel = Rs @ Rr.T
    t_rel = Rs @ (Cr - Cs)
    H = Ks @ (R_rel - np.outer(t_rel, n) / w) @ np.linalg.inv(Kr)
    return H


class TestPlaneDepth:
    def test_depth_plane_roundtrip(self):
        rng = np.random.default_rng(0)
        cam = random_camera(rng)
        x, y = geo.pixel_grid(48, 64)
        depth = jnp.asarray(rng.uniform(2.0, 8.0, (48, 64)), jnp.float32)
        n = rng.standard_normal((48, 64, 3))
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        # orient normals toward the camera so denominators are well-behaved
        view = np.asarray(geo.view_direction(cam.K, x, y))
        n = np.where((n * view).sum(-1, keepdims=True) > 0, -n, n)
        n = jnp.asarray(n, jnp.float32)
        plane = geo.plane_from_depth_normal(cam.K, x, y, depth, n)
        depth2 = geo.depth_from_plane(cam.K, plane, x, y)
        np.testing.assert_allclose(depth2, depth, rtol=2e-3)

    def test_normal_transform_roundtrip(self):
        rng = np.random.default_rng(1)
        cam = random_camera(rng)
        n = rng.standard_normal((5, 3)).astype(np.float32)
        world = geo.normal_cam_to_world(cam.R, jnp.asarray(n))
        back = geo.normal_world_to_cam(cam.R, world)
        np.testing.assert_allclose(back, n, rtol=1e-5, atol=1e-5)


class TestHomography:
    def test_matches_brute_force(self):
        rng = np.random.default_rng(2)
        ref = random_camera(rng)
        src = random_camera(rng)
        n = np.array([0.2, -0.1, -0.97])
        n /= np.linalg.norm(n)
        w = -3.0
        Hbf = brute_force_homography(ref, src, n, w)

        A, b = geo.homography_terms(ref.K, ref.R, ref.C, src.K, src.R, src.C)
        x = jnp.asarray([[10.0]])
        y = jnp.asarray([[20.0]])
        plane = jnp.asarray(np.r_[n, w], jnp.float32).reshape(1, 1, 4)
        pt, col_x, col_y, h_p = geo.homography_apply(A, b, ref.K, plane, x, y)

        hp_bf = Hbf @ np.array([10.0, 20.0, 1.0])
        np.testing.assert_allclose(np.asarray(h_p)[0, 0], hp_bf, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(pt)[0, 0], hp_bf[:2] / hp_bf[2], rtol=1e-4)
        # column shortcut: image of (x+i, y+j) == h_p + i col_x + j col_y
        hp2 = np.asarray(h_p)[0, 0] + 3 * np.asarray(col_x)[0, 0] - 2 * np.asarray(col_y)[0, 0]
        hp2_bf = Hbf @ np.array([13.0, 18.0, 1.0])
        np.testing.assert_allclose(hp2, hp2_bf, rtol=1e-4)

    def test_stacked_views_broadcast(self):
        rng = np.random.default_rng(3)
        cams = CameraStack.stack([random_camera(rng) for _ in range(4)])
        ref = cams.view(0)
        A, b = geo.homography_terms(ref.K, ref.R, ref.C, cams.K, cams.R, cams.C)
        assert A.shape == (4, 3, 3) and b.shape == (4, 3)
        # view 0 homography of the identity plane-to-self should be identity-ish:
        # A[0] = K R_rel K^-1 with R_rel = I
        np.testing.assert_allclose(np.asarray(A[0]), np.eye(3), atol=1e-4)
        np.testing.assert_allclose(np.asarray(b[0]), 0.0, atol=1e-5)


class TestProjection:
    def test_backproject_project_roundtrip(self):
        rng = np.random.default_rng(4)
        cam = random_camera(rng)
        x = jnp.asarray(rng.uniform(0, 63, (7,)), jnp.float32)
        y = jnp.asarray(rng.uniform(0, 47, (7,)), jnp.float32)
        depth = jnp.asarray(rng.uniform(2, 9, (7,)), jnp.float32)
        X = geo.backproject_world(cam.K, cam.R, cam.C, x, y, depth)
        pt, d2 = geo.project_camera(cam.K, cam.R, cam.t, X)
        np.testing.assert_allclose(pt[:, 0], x, rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(pt[:, 1], y, rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(d2, depth, rtol=1e-4)


class TestSyntheticScene:
    def test_consistency_across_views(self):
        """A point backprojected from view 0's GT depth must land on the
        same texture value in every other view (photo-consistency oracle)."""
        scene = make_plane_scene(num_views=3, height=64, width=80, seed=5)
        cams = scene.cameras
        ref = cams.view(0)
        x, y = geo.pixel_grid(64, 80)
        X = geo.backproject_world(ref.K, ref.R, ref.C, x, y,
                                  jnp.asarray(scene.gt_depth[0]))
        for v in range(1, 3):
            src = cams.view(v)
            pt, depth_v = geo.project_camera(src.K, src.R, src.t, X)
            px = np.asarray(pt)
            inb = ((px[..., 0] > 2) & (px[..., 0] < 77)
                   & (px[..., 1] > 2) & (px[..., 1] < 61))
            from mpmvs_tpu.ops.sampling import bilinear_sample
            vals = np.asarray(bilinear_sample(
                jnp.asarray(scene.images[v]), jnp.asarray(px[..., 0]),
                jnp.asarray(px[..., 1])))
            err = np.abs(vals - scene.images[0])[inb]
            assert np.median(err) < 2.0, f"view {v}: median photo error {np.median(err)}"
            # projected depth must equal that view's GT depth at the pixel
            gt_v = np.asarray(bilinear_sample(
                jnp.asarray(scene.gt_depth[v]), jnp.asarray(px[..., 0]),
                jnp.asarray(px[..., 1])))
            rel = (np.abs(gt_v - np.asarray(depth_v)) / gt_v)[inb]
            assert np.median(rel) < 1e-3

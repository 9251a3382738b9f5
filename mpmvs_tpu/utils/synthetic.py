"""Synthetic multi-view scenes with exact ground truth.

The reference repo ships no test data and no tests (SURVEY.md §4); this
module provides deterministic, analytically-correct scenes — textured planes
observed by a ring of pinhole cameras — used by the unit/e2e tests and by
``bench.py``. Depth and normals are exact, so solver output can be scored
without external datasets.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from mpmvs_tpu.camera import Camera, CameraStack


def _smooth_noise(height: int, width: int, rng: np.random.Generator,
                  octaves: int = 4) -> np.ndarray:
    """Multi-octave value noise in [0, 255] — textured enough for NCC."""
    out = np.zeros((height, width), np.float32)
    amp = 1.0
    for o in range(octaves):
        gh = max(2, height // (2 ** (octaves - o + 1)))
        gw = max(2, width // (2 ** (octaves - o + 1)))
        grid = rng.standard_normal((gh, gw)).astype(np.float32)
        ys = np.linspace(0, gh - 1, height, dtype=np.float32)
        xs = np.linspace(0, gw - 1, width, dtype=np.float32)
        y0 = np.floor(ys).astype(np.int32).clip(0, gh - 2)
        x0 = np.floor(xs).astype(np.int32).clip(0, gw - 2)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        g = (grid[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
             + grid[np.ix_(y0, x0 + 1)] * (1 - fy) * fx
             + grid[np.ix_(y0 + 1, x0)] * fy * (1 - fx)
             + grid[np.ix_(y0 + 1, x0 + 1)] * fy * fx)
        out += amp * g
        amp *= 0.6
    out -= out.min()
    out *= 255.0 / max(out.max(), 1e-6)
    return out


def _bilinear_np(img: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    h, w = img.shape
    x0 = np.clip(np.floor(x).astype(np.int64), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y0 = np.clip(np.floor(y).astype(np.int64), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    fx = np.clip(x - np.floor(x), 0, 1)
    fy = np.clip(y - np.floor(y), 0, 1)
    top = img[y0, x0] * (1 - fx) + img[y0, x1] * fx
    bot = img[y1, x0] * (1 - fx) + img[y1, x1] * fx
    return top * (1 - fy) + bot * fy


def _look_at(C: np.ndarray, target: np.ndarray, up=(0.0, -1.0, 0.0)):
    """World->camera rotation for a camera at C looking at target (+z forward)."""
    fwd = target - C
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(np.asarray(up, np.float64), fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)
    return R


@dataclasses.dataclass
class SyntheticScene:
    images: np.ndarray        # (V, H, W) float32 grayscale 0..255
    cameras: CameraStack      # stacked; index order matches images
    gt_depth: np.ndarray      # (V, H, W) exact depth per view
    gt_normal_world: np.ndarray  # (3,) world plane normal (unit, toward cameras)
    colors: np.ndarray        # (V, H, W, 3) float32 BGR (grayscale replicated)


def make_plane_scene(
    num_views: int = 3,
    height: int = 96,
    width: int = 128,
    focal: float = 0.0,   # 0 = auto: max(160, 1.25 * max(width, height))
    plane_normal: Tuple[float, float, float] = (0.0, 0.0, -1.0),
    plane_point: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    camera_distance: float = 4.0,
    baseline: float = 0.5,
    seed: int = 0,
    texture_scale: float = 200.0,
) -> SyntheticScene:
    """Cameras on a ring at z≈-camera_distance looking at a textured plane.

    The plane carries a smooth random texture parameterized by two in-plane
    axes; every rendered pixel and its depth are exact, making this a
    closed-form oracle for homography/NCC/solver tests.
    """
    # A fixed focal at large resolutions means an absurd FOV whose border
    # rays run parallel to the plane (denom->0 below): NaN depths poisoned
    # the 3200x2130 bench scene. Scale with resolution, but never below the
    # historical 160 the small test oracles were tuned against (<=128 px
    # scenes keep their exact pre-change geometry).
    if not focal:
        focal = max(160.0, 1.25 * max(width, height))
    rng = np.random.default_rng(seed)
    n = np.asarray(plane_normal, np.float64)
    n /= np.linalg.norm(n)
    p0 = np.asarray(plane_point, np.float64)
    # in-plane texture axes
    a = np.cross(n, [1.0, 0.0, 0.0])
    if np.linalg.norm(a) < 1e-6:
        a = np.cross(n, [0.0, 1.0, 0.0])
    a /= np.linalg.norm(a)
    b = np.cross(n, a)

    tex = _smooth_noise(1024, 1024, rng)

    K = np.array([[focal, 0.0, width / 2.0],
                  [0.0, focal, height / 2.0],
                  [0.0, 0.0, 1.0]], np.float64)

    images, cams, depths = [], [], []
    for v in range(num_views):
        if v == 0:
            offset = np.zeros(3)
        else:
            ang = 2 * np.pi * (v - 1) / max(num_views - 1, 1)
            offset = baseline * np.array([np.cos(ang), np.sin(ang), 0.12 * np.sin(2 * ang)])
        C = p0 - camera_distance * n + offset
        R = _look_at(C, p0)
        t = -R @ C

        xs, ys = np.meshgrid(np.arange(width, dtype=np.float64),
                             np.arange(height, dtype=np.float64), indexing="xy")
        d_cam = np.stack([(xs - K[0, 2]) / K[0, 0],
                          (ys - K[1, 2]) / K[1, 1],
                          np.ones_like(xs)], axis=-1)
        d_world = d_cam @ R  # R^T applied to each ray
        denom = d_world @ n
        tparam = ((p0 - C) @ n) / denom
        X = C[None, None] + tparam[..., None] * d_world
        # depth along camera z: X_cam = R(X - C) = tparam * R d_world,
        # and R d_world = d_cam, whose z component is 1 -> depth == tparam.
        depth = tparam * (d_world @ R[2])
        u = (X - p0) @ a * texture_scale + tex.shape[1] / 2.0
        w_ = (X - p0) @ b * texture_scale + tex.shape[0] / 2.0
        img = _bilinear_np(tex, u, w_).astype(np.float32)

        z_min, z_max = float(depth.min()), float(depth.max())
        cams.append(Camera.create(K=K, R=R, t=t, width=width, height=height,
                                  depth_min=max(0.2 * z_min, 1e-3) ,
                                  depth_max=1.3 * z_max))
        images.append(img)
        depths.append(depth.astype(np.float32))

    # plane normal oriented toward the cameras (cameras sit at -n side)
    n_vis = -n
    colors = np.repeat(np.stack(images)[..., None], 3, axis=-1)
    return SyntheticScene(
        images=np.stack(images),
        cameras=CameraStack.stack(cams),
        gt_depth=np.stack(depths),
        gt_normal_world=n_vis.astype(np.float32),
        colors=colors,
    )

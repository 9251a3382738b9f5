"""Vectorized camera / plane geometry.

Pure-jnp re-derivations of the device math in the reference
(src/PatchMatch.cu:84-97, 163-195, 228-316, 582-640). Everything operates on
whole (H, W) pixel grids at once — the TPU analogue of one CUDA thread per
pixel — and broadcasts over a leading view axis where noted.

Plane parametrization: a hypothesis is ``(n, w)`` with the plane equation
``n . X + w = 0`` in *reference-camera* coordinates (n a unit normal facing
the camera, w the signed plane-to-origin distance). The reference packs this
as float4 (PatchMatch.cu:171-176, 221-226).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def intrinsics_parts(K: Array):
    """fx, fy, cx, cy from a (…, 3, 3) intrinsic matrix."""
    return K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2]


def pixel_grid(height: int, width: int):
    """Integer pixel coordinate grids x (H, W), y (H, W), float32."""
    y = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    return x, y


def view_direction(K: Array, x: Array, y: Array) -> Array:
    """Unnormalized ray direction K^-1 (x, y, 1) — (…, 3).

    Reference: GetViewDirection (PatchMatch.cu:179-186).
    """
    fx, fy, cx, cy = intrinsics_parts(K)
    return jnp.stack(
        [(x - cx) / fx, (y - cy) / fy, jnp.ones_like(x)], axis=-1
    )


def backproject_cam(K: Array, x: Array, y: Array, depth: Array) -> Array:
    """Pixel + depth -> 3D point in the same camera's frame (…, 3).

    Reference: GetPointI2C (PatchMatch.cu:163-168) / Get3DPointonRefCam
    (PatchMatch.cpp:200-209).
    """
    return depth[..., None] * view_direction(K, x, y)


def plane_to_origin(K: Array, x: Array, y: Array, depth: Array, normal: Array) -> Array:
    """Signed plane-to-origin distance w = -(n . X) for X on the viewing ray.

    Reference: GetPlane2Origin (PatchMatch.cu:171-176).
    """
    X = backproject_cam(K, x, y, depth)
    return -jnp.sum(normal * X, axis=-1)


def depth_from_plane(K: Array, plane: Array, x: Array, y: Array) -> Array:
    """Depth of the plane (n, w) along the ray through pixel (x, y).

    depth = -w * fx / ((x-cx) nx + (fx/fy)(y-cy) ny + fx nz)

    Reference: ComputeDepthfromPlaneHypothesis (PatchMatch.cu:84-87).
    """
    fx, fy, cx, cy = intrinsics_parts(K)
    n, w = plane[..., :3], plane[..., 3]
    denom = (
        (x - cx) * n[..., 0]
        + (fx / fy) * (y - cy) * n[..., 1]
        + fx * n[..., 2]
    )
    return -w * fx / denom


def plane_from_depth_normal(K: Array, x: Array, y: Array, depth: Array, normal: Array) -> Array:
    """(n, w) hypothesis from per-pixel depth + camera-frame normal (…, 4)."""
    w = plane_to_origin(K, x, y, depth, normal)
    return jnp.concatenate([normal, w[..., None]], axis=-1)


def normal_cam_to_world(R: Array, normal: Array) -> Array:
    """n_world = R^T n_cam. Reference: TransformNormal (PatchMatch.cu:89-97)."""
    return jnp.einsum("...ji,...j->...i", R, normal)


def normal_world_to_cam(R: Array, normal: Array) -> Array:
    """n_cam = R n_world. Reference: TransformNormal2RefCam (PatchMatch.cu:308-316)."""
    return jnp.einsum("...ij,...j->...i", R, normal)


def relative_pose(R_ref: Array, C_ref: Array, R_src: Array, C_src: Array):
    """R_rel = R_src R_ref^T ; t_rel = R_src (C_ref - C_src).

    Broadcasts over leading (view) axes of the src arguments.
    Reference: first half of ComputeHomography (PatchMatch.cu:230-247).
    """
    R_rel = jnp.einsum("...ik,jk->...ij", R_src, R_ref)
    t_rel = jnp.einsum("...ij,...j->...i", R_src, C_ref - C_src)
    return R_rel, t_rel


def K_inv_pinhole(K: Array) -> Array:
    """Closed-form inverse of a no-skew pinhole K (…, 3, 3)."""
    fx, fy, cx, cy = intrinsics_parts(K)
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    rows = [
        jnp.stack([1.0 / fx, z, -cx / fx], axis=-1),
        jnp.stack([z, 1.0 / fy, -cy / fy], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def homography_terms(K_ref: Array, R_ref: Array, C_ref: Array,
                     K_src: Array, R_src: Array, C_src: Array):
    """Per-view constants (A, b) of the plane-induced homography.

    H(plane) = A - outer(b, m) / w   with   m = K_ref^-T n  (per pixel),
    A = K_src R_rel K_ref^-1,  b = K_src t_rel.

    This is the factorization of ComputeHomography (PatchMatch.cu:228-279):
    only the rank-1 term depends on the pixel's plane, so A and b are
    precomputed once per source view instead of per pixel per hypothesis.
    Broadcasts over leading view axes of the src arguments.
    """
    R_rel, t_rel = relative_pose(R_ref, C_ref, R_src, C_src)
    Kri = K_inv_pinhole(K_ref)
    A = jnp.einsum("...ij,...jk,kl->...il", K_src, R_rel, Kri)
    b = jnp.einsum("...ij,...j->...i", K_src, t_rel)
    return A, b


def homography_apply(A: Array, b: Array, K_ref: Array, plane: Array,
                     x: Array, y: Array):
    """Project ref pixel (x, y) through the plane homography into src.

    Returns (pt (…, 2), col_x (…, 3), col_y (…, 3), h_p (…, 3)) where
    ``h_p`` is the unnormalized homogeneous image of (x, y, 1) and
    ``col_x``/``col_y`` are the first two columns of H, so the homogeneous
    image of (x+i, y+j, 1) is ``h_p + i*col_x + j*col_y`` — this turns the
    36-tap NCC window projection into FMAs (no per-tap matrix products).

    A, b: per-view terms from :func:`homography_terms`, broadcast against the
    per-pixel plane (…, 4).
    """
    n, w = plane[..., :3], plane[..., 3:4]
    # m = K_ref^-T n  (row vector n^T K_ref^-1)
    m = jnp.einsum("ji,...j->...i", K_inv_pinhole(K_ref), n)
    scale = m / w  # (…, 3)
    # H = A - b scale^T ; columns H[:, k] = A[:, k] - b * scale[k]
    col_x = A[..., :, 0] - b * scale[..., 0:1]
    col_y = A[..., :, 1] - b * scale[..., 1:2]
    col_1 = A[..., :, 2] - b * scale[..., 2:3]
    h_p = col_x * x[..., None] + col_y * y[..., None] + col_1
    pt = h_p[..., :2] / h_p[..., 2:3]
    return pt, col_x, col_y, h_p


def backproject_world(K: Array, R: Array, C: Array, x: Array, y: Array, depth: Array) -> Array:
    """Pixel + depth -> world point: R^T (depth K^-1 p) + C.

    Reference: BackProjectPoint2W (PatchMatch.cu:582-602) /
    Get3DPointonWorld (PatchMatch.cpp:211-230).
    """
    Xc = backproject_cam(K, x, y, depth)
    return jnp.einsum("...ji,...j->...i", R, Xc) + C


def project_camera(K: Array, R: Array, t: Array, X: Array):
    """World point -> (pixel (…, 2), depth). Uses the full K rows like the
    reference (ProjectPoint, PatchMatch.cu:605-615), so skew would be honored
    here even though the homography fast path assumes none.
    """
    Xc = jnp.einsum("...ij,...j->...i", R, X) + t
    h = jnp.einsum("...ij,...j->...i", K, Xc)
    depth = h[..., 2]
    return h[..., :2] / depth[..., None], depth

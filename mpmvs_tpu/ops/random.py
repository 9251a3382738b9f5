"""Reproducible per-pixel random hypothesis generation.

Replaces the reference's per-pixel curand state seeded with ``clock64()``
(PatchMatch.cu:546 — non-reproducible by construction) with counter-based
`jax.random`: every draw is a pure function of (seed, pass, iteration,
phase), so runs are bit-reproducible and independent of device count.

Distributional equivalence with the reference:
  * GenerateRandomNormal (PatchMatch.cu:197-219) draws uniformly on the
    sphere via Marsaglia rejection; here a normalized 3D Gaussian draw gives
    the identical distribution without data-dependent loops.
  * GeneratePerturbedNormal (PatchMatch.cu:460-495) applies an XYZ Euler
    rotation with angles ~ U(-perturbation/2, perturbation/2).
  * Depth draws are U(depth_min, depth_max); the refinement perturbation is
    U(1-p, 1+p) * depth — the reference's do/while re-draw condition
    (PatchMatch.cu:668-670) uses `&&` of mutually-exclusive bounds and thus
    never loops, so a single draw is exact, not an approximation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpmvs_tpu import geometry as geo

Array = jax.Array


def random_unit_sphere(key, shape) -> Array:
    v = jax.random.normal(key, shape + (3,), jnp.float32)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True).clip(1e-12)


def face_camera(normal: Array, K: Array, x: Array, y: Array) -> Array:
    """Flip normals pointing away from the camera (dot with the viewing ray
    must be negative), then renormalize — PatchMatch.cu:210-217."""
    view = geo.view_direction(K, x, y)
    dot = jnp.sum(normal * view, axis=-1, keepdims=True)
    flipped = jnp.where(dot > 0.0, -normal, normal)
    return flipped / jnp.linalg.norm(flipped, axis=-1, keepdims=True).clip(1e-12)


def random_normal_field(key, K: Array, x: Array, y: Array) -> Array:
    """(H, W, 3) random unit normals facing the camera."""
    return face_camera(random_unit_sphere(key, x.shape), K, x, y)


def random_plane_field(key, K: Array, x: Array, y: Array,
                       depth_min, depth_max) -> Array:
    """(H, W, 4) random plane hypotheses — GenerateRandomPlaneHypothesis
    (PatchMatch.cu:221-226)."""
    k_n, k_d = jax.random.split(key)
    normal = random_normal_field(k_n, K, x, y)
    depth = jax.random.uniform(k_d, x.shape, jnp.float32,
                               minval=depth_min, maxval=depth_max)
    return geo.plane_from_depth_normal(K, x, y, depth, normal)


def banded_uniform(key, shape, minval, maxval, frac: float,
                   tile=(8, 128)) -> Array:
    """Tile-coherent uniform draw over [minval, maxval].

    Each ``tile`` block draws one band center c ~ U(min+h, max-h) with
    h = frac*(max-min)/2; its pixels then draw U(c-h, c+h). The marginal
    per-pixel law is the trapezoidal uniform⊛uniform with full support on
    [min, max] (flat except ramps of width 2h at the edges), but the values
    inside one tile span at most ``frac`` of the range — which keeps the
    Pallas sweep kernel's per-tile projected footprint small (a per-pixel
    full-range draw, the reference's semantics at PatchMatch.cu:221-224 and
    :655, makes every 8x128 tile's footprint cover the whole projected depth
    range: measured 3.7 Mtaps/s vs 687 coherent at 3200x2130 on v5e).
    Documented deviation; ``PatchMatchParams.coherent_random`` controls it.
    """
    assert len(shape) == 2, shape
    k_c, k_j = jax.random.split(key)
    th, tw = tile
    nty, ntx = -(-shape[0] // th), -(-shape[1] // tw)
    rng = maxval - minval
    half = 0.5 * frac * rng
    centers = jax.random.uniform(k_c, (nty, ntx), jnp.float32,
                                 minval=minval + half, maxval=maxval - half)
    centers = jnp.repeat(jnp.repeat(centers, th, 0), tw, 1)[:shape[0], :shape[1]]
    jitter = jax.random.uniform(k_j, shape, jnp.float32,
                                minval=-half, maxval=half)
    return jnp.clip(centers + jitter, minval, maxval)


def euler_xyz(a1: Array, a2: Array, a3: Array) -> Array:
    """(…, 3, 3) rotation from XYZ Euler angles — the exact matrix of
    GeneratePerturbedNormal (PatchMatch.cu:475-484)."""
    s1, s2, s3 = jnp.sin(a1), jnp.sin(a2), jnp.sin(a3)
    c1, c2, c3 = jnp.cos(a1), jnp.cos(a2), jnp.cos(a3)
    row0 = jnp.stack([c2 * c3, c3 * s1 * s2 - c1 * s3, s1 * s3 + c1 * c3 * s2], -1)
    row1 = jnp.stack([c2 * s3, c1 * c3 + s1 * s2 * s3, c1 * s2 * s3 - c3 * s1], -1)
    row2 = jnp.stack([-s2, c2 * s1, c1 * c2], -1)
    return jnp.stack([row0, row1, row2], -2)


def perturbed_normal_field(key, K: Array, x: Array, y: Array,
                           normal: Array, perturbation) -> Array:
    """Randomly rotated normals; draws that would face away from the camera
    keep the original normal (PatchMatch.cu:489-491)."""
    ang = (jax.random.uniform(key, x.shape + (3,), jnp.float32) - 0.5) * perturbation
    R = euler_xyz(ang[..., 0], ang[..., 1], ang[..., 2])
    rotated = jnp.einsum("...ij,...j->...i", R, normal)
    view = geo.view_direction(K, x, y)
    away = jnp.sum(rotated * view, axis=-1, keepdims=True) >= 0.0
    rotated = rotated / jnp.linalg.norm(rotated, axis=-1, keepdims=True).clip(1e-12)
    return jnp.where(away, normal, rotated)

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


def cone_normal_field(key, K: Array, x: Array, y: Array,
                      max_angle_rad: float) -> Array:
    """(H, W, 3) random unit normals within ``max_angle_rad`` of the
    anti-viewing direction (uniform in cos over the cone).

    Used for the INIT field only (documented deviation): the reference
    seeds full-hemisphere normals (PatchMatch.cu:197-219), but near-grazing
    seeds stretch the NCC window across the image and dominate the sweep
    kernel's footprint for the first iterations until adoption replaces
    them. Steep surfaces remain reachable — the refinement trials draw
    full-hemisphere normals every half-iteration, and propagation spreads
    them. ``PatchMatchParams.init_normal_cone_deg`` controls it."""
    view = geo.view_direction(K, x, y)
    axis = -view / jnp.linalg.norm(view, axis=-1, keepdims=True).clip(1e-12)
    k_c, k_p = jax.random.split(key)
    import math
    cos_t = jax.random.uniform(k_c, x.shape, jnp.float32,
                               minval=math.cos(max_angle_rad), maxval=1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = jax.random.uniform(k_p, x.shape, jnp.float32, maxval=2.0 * jnp.pi)
    # orthonormal frame around the per-pixel axis
    h = jnp.where(jnp.abs(axis[..., 0:1]) < 0.9,
                  jnp.asarray([1.0, 0.0, 0.0]),
                  jnp.asarray([0.0, 1.0, 0.0]))
    u = jnp.cross(axis, jnp.broadcast_to(h, axis.shape))
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True).clip(1e-12)
    v = jnp.cross(axis, u)
    n = (axis * cos_t[..., None]
         + (u * jnp.cos(phi)[..., None] + v * jnp.sin(phi)[..., None])
         * sin_t[..., None])
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True).clip(1e-12)


def random_plane_field(key, K: Array, x: Array, y: Array,
                       depth_min, depth_max) -> Array:
    """(H, W, 4) random plane hypotheses — GenerateRandomPlaneHypothesis
    (PatchMatch.cu:221-226)."""
    k_n, k_d = jax.random.split(key)
    normal = random_normal_field(k_n, K, x, y)
    depth = jax.random.uniform(k_d, x.shape, jnp.float32,
                               minval=depth_min, maxval=depth_max)
    return geo.plane_from_depth_normal(K, x, y, depth, normal)


def _hash_u01(a: Array, b: Array, seed: Array) -> Array:
    """Stateless vectorized integer hash -> float in [0, 1). Quality is
    sufficient for band placement (the per-pixel jitter rides a real
    counter-based PRNG); determinism in GLOBAL coordinates is the point —
    every processing band computes identical values for the same tile."""
    x = (a.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
         ^ b.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)) ^ seed
    x = (x ^ (x >> 15)) * jnp.uint32(0x2C1B3C6D)
    x = (x ^ (x >> 12)) * jnp.uint32(0x297A2D39)
    x = x ^ (x >> 15)
    return (x >> 8).astype(jnp.float32) / jnp.float32(1 << 24)


def smooth_banded_uniform(seed_key, jitter_key, x: Array, y: Array,
                          minval, maxval, frac: float,
                          tile=(8, 256), knot_tiles=(32, 8),
                          tile_noise: float = 2.0) -> Array:
    """Spatially-smooth tile-banded uniform draw over [minval, maxval].

    Band centers are a bilinear interpolation of uniform random knots every
    ``knot_tiles`` tiles (tile = ``tile`` px in global (x, y) coordinates),
    plus an iid per-tile offset of ±``tile_noise`` half-bands, plus a
    per-pixel jitter of ±half a band (band width = ``frac`` x range).

    Why smooth: a per-tile *iid* banded field (``banded_uniform``) keeps the
    drawn field's own evaluation fast, but one checkerboard half-iteration
    later the CANDIDATE fields gather planes from ≤23 px away — mixing up to
    ~4 uncorrelated bands per kernel tile, whose bounding box spans most of
    the projected depth range (measured: 106 s for one 128-row band's
    9-candidate eval at 3200x2130 on v5e). With smooth centers, nearby tiles
    carry nearby bands, so shifted/gathered fields stay locally coherent in
    *every* iteration. Knot and tile-noise values are stateless hashes of
    global tile indices (``_hash_u01``) so separately-processed row bands
    agree; only ``seed_key`` (one per draw, shared by all bands of a
    half-iteration) selects the field. Full-range coverage comes from
    re-drawing every half-iteration. Documented deviation from the
    reference's per-pixel full-range draws (PatchMatch.cu:221-224, :655);
    ``PatchMatchParams.coherent_random`` controls it.
    """
    if frac >= 1.0:
        # degenerate band = the reference's plain full-range uniform draw
        return jax.random.uniform(jitter_key, x.shape, jnp.float32,
                                  minval=minval, maxval=maxval)
    seeds = jax.random.bits(seed_key, (2,), jnp.uint32)
    th, tw = tile
    kty, ktx = knot_tiles
    ty = (y.astype(jnp.int32) // th).astype(jnp.float32)
    tx = (x.astype(jnp.int32) // tw).astype(jnp.float32)
    gy = ty / kty
    gx = tx / ktx
    i0 = jnp.floor(gy)
    j0 = jnp.floor(gx)
    fy = gy - i0
    fx = gx - j0
    u = lambda di, dj: _hash_u01(i0 + di, j0 + dj, seeds[0])
    c = ((1 - fy) * ((1 - fx) * u(0, 0) + fx * u(0, 1))
         + fy * ((1 - fx) * u(1, 0) + fx * u(1, 1)))
    rng = maxval - minval
    half = 0.5 * frac * rng
    center = minval + half + c * (rng - 2.0 * half)
    noise = (_hash_u01(ty, tx, seeds[1]) * 2.0 - 1.0) * tile_noise * half
    jitter = jax.random.uniform(jitter_key, x.shape, jnp.float32,
                                minval=-half, maxval=half)
    return jnp.clip(center + noise + jitter, minval, maxval)


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

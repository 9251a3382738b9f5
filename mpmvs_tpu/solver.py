"""PatchMatch MVS solver: state, schedules and the public per-view API.

TPU-native equivalent of class PatchMatchCUDA + ProcessProblem (reference:
src/PatchMatch.cpp:506-638, src/PatchMatch.cu:1188-1254). The three run
types of the reference map to:

  * photometric: random init, coarse-to-fine scales ``max_scale..0``,
    ``max_iterations`` red+black iterations each (PatchMatch.cu:1222-1236).
  * geometric:   warm-start from a previous result + neighbor depth maps,
    single scale 0, ``geom_iterations`` iterations (PatchMatch.cu:1211-1221).
  * prior:       perturbed planar-prior init on masked pixels, single scale
    0, ``max_iterations`` iterations, prior-regularized scoring.

Initialization always scores with the coarsest (scale ``max_scale``) window,
like the reference's ``InitializeScore<<<...>>>(..., maxScale)``
(PatchMatch.cu:1200).

Everything is jit-compiled once per (image shape, num views, mode); state is
a pytree, randomness is an explicit key, and the whole run — init,
iterations, depth/normal conversion, median filter — is a single XLA
program with `lax.fori_loop` over iterations.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpmvs_tpu import geometry as geo
from mpmvs_tpu.camera import CameraStack
from mpmvs_tpu.params import PatchMatchParams
from mpmvs_tpu.ops import random as pmrand
from mpmvs_tpu.ops.ncc import ncc_cost
from mpmvs_tpu.ops.filters import checkerboard_median_filter
from mpmvs_tpu.ops.propagation import (PatchMatchState, SolveData,
                                       checkerboard_step)
from mpmvs_tpu.ops.view_selection import initial_cost_and_views

Array = jax.Array


class SolveResult(NamedTuple):
    """Per-view solver output, reference-frame-compatible: depth map, world
    normals, matching cost, geometric cost (zeros unless geom mode)."""

    depth: Array        # (H, W)
    normal: Array       # (H, W, 3) world frame
    cost: Array         # (H, W)
    geom_cost: Array    # (H, W)


def build_solve_data(
    images: Array,            # (V, H, W) float32, index 0 = reference
    cameras: CameraStack,     # V stacked cameras, index 0 = reference
    src_depths: Optional[Array] = None,   # (V-1, H, W) neighbor depths
    prior_planes: Optional[Array] = None,
    prior_mask: Optional[Array] = None,
) -> SolveData:
    """Assemble per-view constants. Depth range is widened to
    [0.6*min, 1.2*max] like the reference (PatchMatch.cpp:929-930)."""
    ref = cameras.view(0)
    A, b = geo.homography_terms(ref.K, ref.R, ref.C,
                                cameras.K[1:], cameras.R[1:], cameras.C[1:])
    return SolveData(
        ref_img=images[0],
        src_imgs=images[1:],
        src_widths=cameras.width[1:],
        src_heights=cameras.height[1:],
        K_ref=ref.K, R_ref=ref.R, t_ref=ref.t, C_ref=ref.C,
        K_src=cameras.K[1:], R_src=cameras.R[1:],
        t_src=cameras.t[1:], C_src=cameras.C[1:],
        A=A, b=b,
        depth_min=ref.depth_min * 0.6,
        depth_max=ref.depth_max * 1.2,
        src_depths=src_depths,
        prior_planes=prior_planes,
        prior_mask=prior_mask,
    )


def _initial_state(data: SolveData, params: PatchMatchParams, key: Array,
                   mode: str,
                   warm: Optional[SolveResult]) -> PatchMatchState:
    """InitializeScore equivalent (PatchMatch.cu:536-573)."""
    H, W = data.ref_img.shape
    x, y = geo.pixel_grid(H, W)

    if mode == "photometric":
        plane = pmrand.random_plane_field(key, data.K_ref, x, y,
                                          data.depth_min, data.depth_max)
        prev_cost = None
    else:
        # warm start: stored maps are (world normal, depth) — convert back
        # to (camera normal, plane offset) (PatchMatch.cu:563-571).
        n_cam = geo.normal_world_to_cam(data.R_ref, warm.normal)
        plane = geo.plane_from_depth_normal(data.K_ref, x, y, warm.depth, n_cam)
        prev_cost = warm.cost
        if mode == "prior":
            # masked, still-uncertain pixels restart from a perturbed prior
            # plane (PatchMatch.cu:552-562): offset +-6%, normal +-0.06*pi.
            k_d, k_n = jax.random.split(key)
            pert = 0.02 * 3.0
            w0 = data.prior_planes[..., 3]
            w_pert = w0 * (1.0 + (jax.random.uniform(k_d, (H, W)) * 2.0 - 1.0) * pert)
            n_pert = pmrand.perturbed_normal_field(
                k_n, data.K_ref, x, y, data.prior_planes[..., :3],
                pert * np.pi)
            prior_plane = jnp.concatenate([n_pert, w_pert[..., None]], -1)
            use_prior = data.prior_mask & (warm.cost >= 0.1)
            plane = jnp.where(use_prior[..., None], prior_plane, plane)

    costs_v = ncc_cost(
        data.ref_img, data.src_imgs, data.src_widths, data.src_heights,
        data.A, data.b, data.K_ref, plane,
        params.tap_offsets(params.max_scale),
        params.sigma_spatial, params.sigma_color, params.cost_max)
    cost, sel = initial_cost_and_views(costs_v, params.top_k, params.cost_max)
    geom_cost = jnp.zeros((H, W), jnp.float32)
    return PatchMatchState(plane=plane, cost=cost, geom_cost=geom_cost, sel=sel)


def solve_view_impl(
    images: Array,
    cameras: CameraStack,
    key: Array,
    params: PatchMatchParams,
    mode: str = "photometric",
    warm: Optional[SolveResult] = None,
    src_depths: Optional[Array] = None,
    prior_planes: Optional[Array] = None,
    prior_mask: Optional[Array] = None,
    state_sharding=None,
) -> SolveResult:
    """Compute one reference view's depth/normal/cost maps.

    mode: "photometric" | "geom" | "prior" (see module docstring).
    Pure (un-jitted) implementation — vmap/shard_map-able; use
    :func:`solve_view` for the cached single-view entry point.

    ``state_sharding``: optional `jax.sharding.NamedSharding` pinning the
    leading (row) axis of every state map, e.g. P("tile") — XLA's SPMD
    partitioner then splits each iteration across devices and inserts the
    halo exchanges the propagation stencils need (parallel.tile_sharding).
    """
    assert mode in ("photometric", "geom", "prior")
    geom = mode == "geom"
    prior = mode == "prior"
    data = build_solve_data(images, cameras, src_depths, prior_planes,
                            prior_mask)
    H, W = data.ref_img.shape

    def constrain(st: PatchMatchState) -> PatchMatchState:
        if state_sharding is None:
            return st
        return jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(a, state_sharding), st)

    k_init, k_iter = jax.random.split(key)
    state = constrain(_initial_state(data, params, k_init, mode, warm))

    n_iter = params.geom_iterations if geom else params.max_iterations
    scales = list(range(params.max_scale, -1, -1)) if mode == "photometric" else [0]

    for si, scale in enumerate(scales):
        def body(i, st, _scale=scale, _si=si):
            iteration = i // 2
            phase = i % 2
            k = jax.random.fold_in(jax.random.fold_in(k_iter, _si), i)
            return constrain(checkerboard_step(st, data, params, _scale,
                                               iteration, phase, k, geom,
                                               prior))
        state = jax.lax.fori_loop(0, 2 * n_iter, body, state)

    # plane -> (depth, world normal) (GetDepthandNormal, PatchMatch.cu:1021-1034)
    x, y = geo.pixel_grid(H, W)
    depth = geo.depth_from_plane(data.K_ref, state.plane, x, y)
    normal = geo.normal_cam_to_world(data.R_ref, state.plane[..., :3])
    depth = checkerboard_median_filter(depth, state.cost)
    return SolveResult(depth=depth, normal=normal, cost=state.cost,
                       geom_cost=state.geom_cost)


solve_view = jax.jit(solve_view_impl,
                     static_argnames=("params", "mode", "state_sharding"))


class PatchMatchSolver:
    """Convenience stateful wrapper around :func:`solve_view`.

    Owns the params and PRNG seed; exposes the reference's
    PatchMatchCUDA-style lifecycle without the manual memory management
    (AllocatePatchMatch/CudaMemInit/Release are subsumed by XLA).
    """

    def __init__(self, params: PatchMatchParams = PatchMatchParams(),
                 seed: int = 0):
        self.params = params
        self.key = jax.random.PRNGKey(seed)

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def photometric(self, images, cameras) -> SolveResult:
        return solve_view(jnp.asarray(images), cameras, self._next_key(),
                          self.params, mode="photometric")

    def geometric(self, images, cameras, warm: SolveResult,
                  src_depths) -> SolveResult:
        return solve_view(jnp.asarray(images), cameras, self._next_key(),
                          self.params, mode="geom", warm=warm,
                          src_depths=jnp.asarray(src_depths))

    def planar_prior(self, images, cameras, warm: SolveResult,
                     prior_planes, prior_mask) -> SolveResult:
        return solve_view(jnp.asarray(images), cameras, self._next_key(),
                          self.params, mode="prior", warm=warm,
                          prior_planes=jnp.asarray(prior_planes),
                          prior_mask=jnp.asarray(prior_mask))

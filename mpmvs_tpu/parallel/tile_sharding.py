"""Spatial (tile) parallelism: one view's solve split across devices.

The reference's intra-view parallelism is the CUDA thread grid; the TPU
analogue shards the state maps (plane/cost/selection) by image rows over a
mesh axis "tile" and lets XLA's SPMD partitioner turn the propagation
stencils (static shifts of up to ±23 px, PatchMatch.cu:769-779) into halo
exchanges over ICI. Images are replicated — they are read-only sampling
sources — so the gather-heavy NCC stays communication-free; only the thin
state maps ride the interconnect between half-iterations.

Composes with view sharding: a ("view", "tile") mesh runs scene-batches on
the view axis with each scene's rows split on the tile axis.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpmvs_tpu.params import PatchMatchParams
from mpmvs_tpu.solver import SolveResult, solve_view_impl


def solve_view_spatial(images, cameras, key, params: PatchMatchParams,
                       mode: str, mesh: Mesh, axis: str = "tile",
                       warm=None, src_depths=None,
                       prior_planes=None, prior_mask=None) -> SolveResult:
    """solve_view with the state row-sharded over ``mesh`` axis ``axis``."""
    sharding = NamedSharding(mesh, P(axis))
    fn = jax.jit(solve_view_impl,
                 static_argnames=("params", "mode", "state_sharding"))
    return fn(images, cameras, key, params=params, mode=mode, warm=warm,
              src_depths=src_depths, prior_planes=prior_planes,
              prior_mask=prior_mask, state_sharding=sharding)

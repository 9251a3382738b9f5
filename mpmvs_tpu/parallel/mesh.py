"""Device mesh helpers.

The reference is single-GPU with `cudaSetDevice(0)` hard-coded
(src/PatchMatch.cpp:509) and exchanges cross-view data through the
filesystem. Here scale-out is a first-class `jax.sharding.Mesh`:

  * axis "view": embarrassingly-parallel per-view depth-map jobs (the
    reference's serial outer loop, main.cpp:21-26);
  * axis "tile": spatial bands of one view with halo exchange (the
    reference's intra-view CUDA grid).

Cross-view exchange (neighbor depths for geometric consistency, all maps
for fusion) rides XLA collectives over ICI instead of .dmb files.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_view_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("view",))


def make_view_tile_mesh(num_view: int, num_tile: int,
                        devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    assert len(devices) >= num_view * num_tile, (
        f"need {num_view * num_tile} devices, have {len(devices)}")
    grid = np.asarray(devices[: num_view * num_tile]).reshape(num_view, num_tile)
    return Mesh(grid, axis_names=("view", "tile"))


def view_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis split over the view axis, rest replicated."""
    return NamedSharding(mesh, P("view"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

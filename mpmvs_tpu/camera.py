"""Pinhole camera model.

Replaces the reference's ``Camera`` struct and ``ReadCamera``
(reference: include/PatchMatch.h:35-46, src/PatchMatch.cpp:111-143) with a
JAX pytree. Cameras for one scene are kept *stacked* (leading view axis) so
per-view math vectorizes; the reference instead copies an array of structs to
the GPU (src/PatchMatch.cpp:1025).

Conventions (identical to the reference):
  - ``R``/``t`` are world->camera: ``x_cam = R @ X_world + t``.
  - camera center ``C = -R^T @ t``.
  - ``K`` is the 3x3 pinhole intrinsic matrix (no skew is assumed by the
    homography fast path, matching PatchMatch.cu:228-279).
  - the ``_cam.txt`` depth range line is ``depth_min interval depth_num
    depth_max``; only min/max are used by the solver, and the solver widens
    them to ``[0.6*min, 1.2*max]`` (src/PatchMatch.cpp:929-930).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A single pinhole camera. Arrays are float32."""

    K: jax.Array  # (3, 3)
    R: jax.Array  # (3, 3)
    t: jax.Array  # (3,)
    width: jax.Array  # () float32 — array so it can be traced/stacked
    height: jax.Array  # ()
    depth_min: jax.Array  # ()
    depth_max: jax.Array  # ()

    @property
    def C(self) -> jax.Array:
        """Camera center in world coordinates: -R^T t."""
        return -self.R.T @ self.t

    @staticmethod
    def create(K, R, t, width, height, depth_min=0.0, depth_max=1.0) -> "Camera":
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        return Camera(
            K=f32(K).reshape(3, 3),
            R=f32(R).reshape(3, 3),
            t=f32(t).reshape(3),
            width=f32(width),
            height=f32(height),
            depth_min=f32(depth_min),
            depth_max=f32(depth_max),
        )

    def rescale(self, scale_x: float, scale_y: float, new_width, new_height) -> "Camera":
        """Adjust intrinsics after an image resize (PatchMatch.cpp:919-924)."""
        K = np.array(self.K, np.float32).copy()
        K[0, 0] *= scale_x
        K[0, 2] *= scale_x
        K[1, 1] *= scale_y
        K[1, 2] *= scale_y
        return dataclasses.replace(
            self,
            K=jnp.asarray(K),
            width=jnp.float32(new_width),
            height=jnp.float32(new_height),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraStack:
    """V cameras stacked along a leading axis. Index 0 is the reference view."""

    K: jax.Array  # (V, 3, 3)
    R: jax.Array  # (V, 3, 3)
    t: jax.Array  # (V, 3)
    width: jax.Array  # (V,)
    height: jax.Array  # (V,)
    depth_min: jax.Array  # (V,)
    depth_max: jax.Array  # (V,)

    @property
    def C(self) -> jax.Array:  # (V, 3)
        return -jnp.einsum("vji,vj->vi", self.R, self.t)

    @property
    def num_views(self) -> int:
        return self.K.shape[0]

    def view(self, i: int) -> Camera:
        return Camera(
            K=self.K[i], R=self.R[i], t=self.t[i],
            width=self.width[i], height=self.height[i],
            depth_min=self.depth_min[i], depth_max=self.depth_max[i],
        )

    @staticmethod
    def stack(cams: Sequence[Camera]) -> "CameraStack":
        return CameraStack(
            K=jnp.stack([c.K for c in cams]),
            R=jnp.stack([c.R for c in cams]),
            t=jnp.stack([c.t for c in cams]),
            width=jnp.stack([c.width for c in cams]),
            height=jnp.stack([c.height for c in cams]),
            depth_min=jnp.stack([c.depth_min for c in cams]),
            depth_max=jnp.stack([c.depth_max for c in cams]),
        )

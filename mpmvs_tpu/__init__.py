"""MP-MVS TPU: a TPU-native PatchMatch Multi-View Stereo framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of MP-MVS
(RongxuanTan/MP-MVS, arXiv:2309.13294): multi-scale-window bilateral NCC
PatchMatch with adaptive checkerboard propagation, planar priors, geometric
consistency, sky masking and multi-view fusion — expressed as vectorized
whole-image array programs (one lane per pixel instead of one CUDA thread per
pixel), with reproducible `jax.random` PRNG, `shard_map` view/tile parallelism
over a device mesh, and Pallas kernels for the hot sampling loops.
"""

__version__ = "0.1.0"

from mpmvs_tpu.camera import Camera, CameraStack
from mpmvs_tpu.params import PatchMatchParams, ConfigParams

__all__ = [
    "Camera",
    "CameraStack",
    "PatchMatchParams",
    "ConfigParams",
    "PatchMatchSolver",
    "PatchMatchState",
]


def __getattr__(name):
    # Lazy to keep `import mpmvs_tpu` light; solver pulls in the full op set.
    if name in ("PatchMatchSolver", "PatchMatchState"):
        from mpmvs_tpu import solver
        return getattr(solver, name)
    raise AttributeError(name)

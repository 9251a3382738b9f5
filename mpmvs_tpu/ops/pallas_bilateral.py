"""Pallas TPU kernel: 37x37 joint bilateral filter for sky-mask refinement.

TPU-native replacement for the reference's CUDA Pixel_bilateral_filter
(SkySegment/src/SkyRegionDetect.cu:3-66): a probability mask is smoothed by
a large joint bilateral window guided by the BGR image,
    w(t) = exp(-|dxy(t)| / sigma_spatial - |dBGR(t)| / sigma_color),
    out = sum w p' / sum w,
taps falling outside the image excluded.

Design: the guide image and mask are edge-padded by the window radius with
a huge color sentinel (so out-of-image taps underflow to weight 0 exactly)
and processed in 8-row bands. Per band one DMA brings the
(4, 8 + 2*radius, Wp) slab (B, G, R, prob planes) into VMEM; the 37x37 tap
loop then runs entirely on VMEM with dynamic sublane/lane slicing — each
input pixel is read once from HBM per band instead of once per tap (the
jnp.roll formulation this replaces moved ~150 GB per 3200 px view; this
moves ~0.6 GB and is VPU-transcendental-bound).

The tap loop is a fori_loop over the 37 row offsets with an unrolled inner
loop over column offsets, keeping the Mosaic program small. The spatial
weight exp(-dist/sigma_s) is a per-tap constant folded in from an SMEM
table, so only the color exp remains per pixel per tap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TR = 8          # band height (sublane tile)
PAD_COLOR = 1e6  # sentinel: |dBGR| ~ 1e6 -> exp underflows to exactly 0


def _kernel(sw_ref,          # (1, n_off**2) SMEM: spatial weights, row-major (dy, dx) — indexed iy*n_off+ix below
            planes_ref,      # (4, Hp, Wp) HBM: B, G, R, prob (padded)
            out_ref,         # (TR, Wp_out) refined probability band
            slab_ref,        # (4, TR + 2R, Wp) VMEM scratch
            sem,
            *,
            radius: int,
            n_off: int,
            wp_out: int,
            sigma_color: float):
    band = pl.program_id(0)
    copy = pltpu.make_async_copy(
        planes_ref.at[:, pl.ds(band * TR, TR + 2 * radius), :],
        slab_ref, sem)
    copy.start()
    copy.wait()

    # center pixels of this band (radius offset into the slab)
    cb = slab_ref[0, pl.ds(radius, TR), pl.ds(radius, wp_out)]
    cg = slab_ref[1, pl.ds(radius, TR), pl.ds(radius, wp_out)]
    cr = slab_ref[2, pl.ds(radius, TR), pl.ds(radius, wp_out)]

    def row_body(iy, carry):
        num, den = carry
        # unrolled inner loop over column offsets; spatial weights come from
        # the SMEM table at [iy * n_off + ix]
        for ix in range(n_off):
            sb = slab_ref[0, pl.ds(iy, TR), pl.ds(ix, wp_out)]
            sg = slab_ref[1, pl.ds(iy, TR), pl.ds(ix, wp_out)]
            sr = slab_ref[2, pl.ds(iy, TR), pl.ds(ix, wp_out)]
            sp = slab_ref[3, pl.ds(iy, TR), pl.ds(ix, wp_out)]
            dc = jnp.sqrt((sb - cb) ** 2 + (sg - cg) ** 2 + (sr - cr) ** 2)
            w = sw_ref[0, iy * n_off + ix] * jnp.exp(-dc / sigma_color)
            num = num + w * sp
            den = den + w
        return num, den

    zero = jnp.zeros((TR, wp_out), jnp.float32)
    num, den = jax.lax.fori_loop(0, n_off, row_body, (zero, zero))
    out_ref[:] = num / jnp.maximum(den, 1e-12)


@functools.partial(jax.jit, static_argnames=(
    "radius", "sigma_spatial", "sigma_color", "interpret"))
def bilateral_refine_pallas(
    bgr: Array,            # (H, W, 3) float32
    prob: Array,           # (H, W) float32
    radius: int = 18,
    sigma_spatial: float = 2.0 * 6.0 * 6.0,
    sigma_color: float = 2.0 * 2.0 * 2.0,
    interpret: bool = False,
) -> Array:
    """Refined probability map (H, W); threshold outside."""
    H, W = prob.shape
    Hb = -(-H // TR) * TR
    Wp_out = -(-W // 128) * 128
    # slab must cover every tap column of every output column: Wp_out + 2R
    Wp = -(-(Wp_out + 2 * radius) // 128) * 128

    n_off = 2 * radius + 1
    planes = jnp.concatenate(
        [jnp.moveaxis(bgr, -1, 0), prob[None]], axis=0)  # (4, H, W)
    planes = jnp.pad(
        planes, ((0, 0), (radius, radius + (Hb - H)), (radius, Wp - W - radius)),
        constant_values=PAD_COLOR)
    # the prob plane's padding must be 0 (its value rides a 0 weight anyway,
    # but keep the arithmetic finite)
    planes = planes.at[3].set(
        jnp.pad(prob, ((radius, radius + (Hb - H)), (radius, Wp - W - radius)),
                constant_values=0.0))

    offs = np.arange(-radius, radius + 1)
    dist = np.sqrt(offs[:, None] ** 2 + offs[None, :] ** 2)
    sw = np.exp(-dist / sigma_spatial).astype(np.float32).reshape(1, -1)

    out = pl.pallas_call(
        functools.partial(_kernel, radius=radius, n_off=n_off,
                          wp_out=Wp_out, sigma_color=sigma_color),
        grid=(Hb // TR,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((TR, Wp_out), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hb, Wp_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, TR + 2 * radius, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(jnp.asarray(sw), planes)
    return out[:H, :W]

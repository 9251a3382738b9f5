"""Checkerboard (quincunx) packing.

The reference updates one checkerboard color per half-iteration with a
half-height CUDA grid (BlackPixelUpdate/RedPixelUpdate thread->pixel remap,
src/PatchMatch.cu:1000-1019) so it only ever *computes* the active color.
Round 1 of this framework computed both colors densely and masked one out —
2x redundant work and memory. These helpers restore the half-grid economy
the TPU way: the active color's pixels are packed into a dense (H, W//2)
array (row y keeps columns x with (x + y) % 2 == phase), all per-pixel math
runs on the packed array, and the result is scattered back.

Packing is pure slicing/interleaving — XLA compiles it to copies, no
gathers. Requires even H and W (the solver pads to even and crops).
"""

from __future__ import annotations

import jax.numpy as jnp


def pack_quincunx(F, phase: int):
    """(…, H, W) -> (…, H, W//2): keep pixels with (x + y) % 2 == phase.

    Row r of the output holds F[r, o::2] with o = (phase + r) % 2. H and W
    must be even; ``phase`` must be a static Python int.
    """
    H, W = F.shape[-2], F.shape[-1]
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    even = F[..., 0::2, phase::2]
    odd = F[..., 1::2, (1 - phase)::2]
    stacked = jnp.stack([even, odd], axis=-2)  # (…, H/2, 2, W/2)
    return stacked.reshape(*F.shape[:-2], H, W // 2)


def _col_interleave(A, B, a_first: bool):
    """Interleave columns of two (…, H, W/2) arrays into (…, H, W)."""
    pair = jnp.stack([A, B] if a_first else [B, A], axis=-1)
    return pair.reshape(*A.shape[:-1], A.shape[-1] * 2)


def unpack_quincunx(P, phase: int, like):
    """Scatter packed values P (…, H, W//2) back onto the ``phase`` color of
    a full array; the other color keeps ``like``'s values."""
    H, W = like.shape[-2], like.shape[-1]
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    P_even, P_odd = P[..., 0::2, :], P[..., 1::2, :]
    L_even = like[..., 0::2, (1 - phase)::2]  # inactive columns, even rows
    L_odd = like[..., 1::2, phase::2]
    even_rows = _col_interleave(P_even, L_even, a_first=(phase == 0))
    odd_rows = _col_interleave(P_odd, L_odd, a_first=(phase == 1))
    stacked = jnp.stack([even_rows, odd_rows], axis=-2)  # (…, H/2, 2, W)
    return stacked.reshape(like.shape)


def packed_coords(y0, H: int, Wh: int, phase: int):
    """Global pixel coordinates of the packed grid.

    ``y0``: global row of packed row 0 (must be even so local parity equals
    global parity — the solver's bands start at even rows). Returns float32
    (x (H, Wh), y (H, Wh)).
    """
    import jax

    r = jax.lax.broadcasted_iota(jnp.float32, (H, Wh), 0)
    k = jax.lax.broadcasted_iota(jnp.float32, (H, Wh), 1)
    parity = jnp.mod(r + phase, 2.0)
    return 2.0 * k + parity, r + y0

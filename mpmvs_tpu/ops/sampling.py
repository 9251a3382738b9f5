"""Image sampling primitives.

TPUs have no texture units, so the reference's ``tex2D`` bilinear fetches
(PatchMatch.cu:363-377) become explicit gathers. Coordinates follow the
CUDA convention used by the reference: it samples at ``(px + 0.5, py + 0.5)``
with linear filtering, i.e. plain bilinear interpolation in pixel-index
space. With unnormalized coordinates CUDA forces clamp-to-edge addressing,
so out-of-range taps clamp to the image border here too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def gather_2d(img: Array, iy: Array, ix: Array) -> Array:
    """img (H, W), integer index arrays of any shape -> values. Indices must
    already be in range."""
    H, W = img.shape
    return jnp.take(img.reshape(-1), iy * W + ix, axis=0)


def gather_2d_batched(imgs: Array, view: Array, iy: Array, ix: Array) -> Array:
    """imgs (V, H, W); per-element view/iy/ix indices of a common shape.

    Flattens to one gather so XLA emits a single fused take — views are a
    batch dimension of the same hot loop, not an outer loop.
    """
    V, H, W = imgs.shape
    flat_idx = (view * H + iy) * W + ix
    return jnp.take(imgs.reshape(-1), flat_idx, axis=0)


def bilinear_sample(img: Array, x: Array, y: Array,
                    width=None, height=None) -> Array:
    """Bilinear sample img (H, W) at float pixel coords, clamp addressing.

    ``width``/``height`` optionally give the *valid* extent (the image may be
    padded beyond it); clamping uses the valid extent.
    """
    H, W = img.shape
    w_lim = (width if width is not None else W) - 1
    h_lim = (height if height is not None else H) - 1
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w_lim)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w_lim)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h_lim)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h_lim)
    v00 = gather_2d(img, y0, x0)
    v01 = gather_2d(img, y0, x1)
    v10 = gather_2d(img, y1, x0)
    v11 = gather_2d(img, y1, x1)
    top = v00 + fx * (v01 - v00)
    bot = v10 + fx * (v11 - v10)
    return top + fy * (bot - top)


def bilinear_sample_batched(imgs: Array, view: Array, x: Array, y: Array,
                            widths: Array, heights: Array) -> Array:
    """Bilinear sample from stacked per-view images.

    imgs: (V, H, W) (padded to a common shape); view: integer view index per
    element; widths/heights: (V,) valid extents used for clamping.
    All of view/x/y share a common broadcastable shape.
    """
    w_lim = jnp.take(widths, view).astype(jnp.int32) - 1
    h_lim = jnp.take(heights, view).astype(jnp.int32) - 1
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w_lim)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w_lim)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h_lim)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h_lim)
    v00 = gather_2d_batched(imgs, view, y0, x0)
    v01 = gather_2d_batched(imgs, view, y0, x1)
    v10 = gather_2d_batched(imgs, view, y1, x0)
    v11 = gather_2d_batched(imgs, view, y1, x1)
    top = v00 + fx * (v01 - v00)
    bot = v10 + fx * (v11 - v10)
    return top + fy * (bot - top)


def nearest_sample_batched(imgs: Array, view: Array, x: Array, y: Array,
                           widths: Array, heights: Array) -> Array:
    """Truncating nearest sample, matching the reference's geometric-
    consistency depth fetch ``tex2D(depth, (int)x + 0.5, (int)y + 0.5)``
    (PatchMatch.cu:626): C-style truncation toward zero, then clamp."""
    w_lim = jnp.take(widths, view).astype(jnp.int32) - 1
    h_lim = jnp.take(heights, view).astype(jnp.int32) - 1
    ix = jnp.clip(x.astype(jnp.int32), 0, w_lim)
    iy = jnp.clip(y.astype(jnp.int32), 0, h_lim)
    return gather_2d_batched(imgs, view, iy, ix)


def shift_2d(img: Array, dx: int, dy: int, fill=None) -> Array:
    """Return an array whose value at (y, x) is img[y+dy, x+dx].

    ``fill=None`` clamps to the border (texture clamp semantics); otherwise
    out-of-range positions take the fill value. Static shifts compile to
    pad+slice — no gathers.
    """
    H, W = img.shape[-2], img.shape[-1]
    pad_top, pad_bottom = max(-dy, 0), max(dy, 0)
    pad_left, pad_right = max(-dx, 0), max(dx, 0)
    pad_widths = [(0, 0)] * (img.ndim - 2) + [(pad_top, pad_bottom), (pad_left, pad_right)]
    if fill is None:
        padded = jnp.pad(img, pad_widths, mode="edge")
    else:
        padded = jnp.pad(img, pad_widths, mode="constant", constant_values=fill)
    ys = pad_top + dy
    xs = pad_left + dx
    return jax.lax.slice(
        padded,
        [0] * (img.ndim - 2) + [ys, xs],
        list(img.shape[:-2]) + [ys + H, xs + W],
    )

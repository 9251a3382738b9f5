"""Fusion-gate and depth-outlier diagnosis (VERDICT r4 #5).

Replays the fusion pass over a completed workspace (the synthetic_eval
layout: ``<workdir>/ws`` with MPMVS/ results, ``<workdir>/gt`` with GT
.dmb depths), recording:

  * per reference view, the gate funnel — how many (source, pixel)
    candidates survive each successive acceptance gate of
    fuse_one_view (reference: src/PatchMatch.cpp:403-496) — plus the
    marginal single-gate kill counts (candidates failing ONLY reproj /
    rel-depth / angle), so the binding gate is identified, not guessed;
  * per view, depth-map error structure vs GT: MAE, the bad-pixel
    fraction (|err| > 0.1 m), its sign bias, and — the occlusion probe —
    the mean number of source views in which each pixel's GT point is
    actually visible (GT-projected depth within 1% of the source's own GT
    depth). Bad pixels that are GT-occluded in most sources are
    structurally unsolvable under the reference's photometric model; bad
    pixels with high GT visibility indicate solver failures.

Run after tools/synthetic_eval.py with the same --workdir:

    python tools/fusion_diagnose.py --workdir /tmp/mpmvs_eval_scene \
        --views 7 --out FUSION_DIAG_r05.json
"""

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/mpmvs_eval_scene")
    p.add_argument("--views", type=int, default=7)
    p.add_argument("--bad-thresh", type=float, default=0.1)
    p.add_argument("--out", default=os.path.join(HERE, "FUSION_DIAG_r05.json"))
    args = p.parse_args()

    import numpy as np
    import jax.numpy as jnp

    from mpmvs_tpu.camera import CameraStack
    from mpmvs_tpu.fusion import (FusionInput, _mark_used, fuse_one_view,
                                  fusion_gate_funnel)
    from mpmvs_tpu.io.cams import Scene
    from mpmvs_tpu.io.dmb import read_dmb
    from mpmvs_tpu.params import ConfigParams
    from mpmvs_tpu.pipeline import Pipeline, _pad_stack

    ws = os.path.join(args.workdir, "ws")
    gt_dir = os.path.join(args.workdir, "gt")
    cfg = ConfigParams(input_folder=ws, output_folder=ws)
    pipe = Pipeline(cfg).load()
    for s in pipe.scenes:
        if s.estimate and not pipe.load_view_result(s.ref_id):
            raise FileNotFoundError(f"no solved result for view {s.ref_id} "
                                    f"under {ws}/MPMVS — run synthetic_eval "
                                    "first")

    estimable = [s for s in pipe.scenes if s.estimate]
    ids = sorted({v for s in estimable for v in ([s.ref_id] + s.src_ids)})
    H = max(pipe.views[i].image.shape[0] for i in ids)
    W = max(pipe.views[i].image.shape[1] for i in ids)
    depths = _pad_stack([np.asarray(pipe.views[i].result.depth)
                         for i in ids], (H, W))
    normals = _pad_stack([np.asarray(pipe.views[i].result.normal)
                          for i in ids], (H, W, 3))
    colors = _pad_stack([pipe.views[i].color for i in ids], (H, W, 3))
    cams = CameraStack.stack([pipe.views[i].camera for i in ids])
    remap = {vid: k for k, vid in enumerate(ids)}
    scenes_r = [Scene(ref_id=remap[s.ref_id],
                      src_ids=[remap[v] for v in s.src_ids if v in remap],
                      estimate=True) for s in estimable]

    gt = np.stack([read_dmb(os.path.join(gt_dir, f"{v:08d}.dmb"))
                   for v in ids])

    inp = FusionInput(depths=jnp.asarray(depths), normals=jnp.asarray(normals),
                      colors=jnp.asarray(colors), cameras=cams)
    masks = jnp.zeros((len(ids), H, W), bool)
    max_src = max(len(s.src_ids) - 1 for s in scenes_r)

    # --- GT visibility probe (independent of the solver): for each view,
    # project each pixel's exact GT point into each source's GT depth map ---
    from mpmvs_tpu import geometry as geo
    x, y = geo.pixel_grid(H, W)
    gt_j = jnp.asarray(gt)
    vis_count = []
    for s in scenes_r:
        i = s.ref_id
        K_r, R_r, t_r = cams.K[i], cams.R[i], cams.t[i]
        C_r = -R_r.T @ t_r
        Xw = geo.backproject_world(K_r, R_r, C_r, x, y, gt_j[i])
        cnt = jnp.zeros((H, W), jnp.int32)
        for j in s.src_ids[1:]:
            pt, pd = geo.project_camera(cams.K[j], cams.R[j], cams.t[j], Xw)
            cc = jnp.clip(jnp.round(pt[..., 0]).astype(jnp.int32), 0, W - 1)
            rr = jnp.clip(jnp.round(pt[..., 1]).astype(jnp.int32), 0, H - 1)
            inb = ((pt[..., 0] >= 0) & (pt[..., 0] < W)
                   & (pt[..., 1] >= 0) & (pt[..., 1] < H))
            d_src = gt_j[j][rr, cc]
            visible = inb & (d_src > 0) & (jnp.abs(pd - d_src)
                                           / jnp.maximum(d_src, 1e-9) < 0.01)
            cnt = cnt + visible.astype(jnp.int32)
        vis_count.append(np.asarray(cnt))

    report = {"views": {}, "totals": {}}
    tot = {}
    for s in scenes_r:
        i = s.ref_id
        src = s.src_ids[1:]
        src_valid = np.zeros(max_src, bool)
        src_valid[:len(src)] = True
        src_idx = np.zeros(max_src, np.int32)
        src_idx[:len(src)] = src

        funnel = fusion_gate_funnel(inp, masks, jnp.int32(i),
                                    jnp.asarray(src_idx),
                                    jnp.asarray(src_valid))
        funnel = {k: int(v) for k, v in funnel.items()}
        out = fuse_one_view(inp, masks, jnp.int32(i), jnp.asarray(src_idx),
                            jnp.asarray(src_valid), use_dynamic=True)
        n_acc = int(np.asarray(out.accept).sum())
        masks = _mark_used(masks, out, jnp.int32(i), jnp.asarray(src_idx))

        est = depths[i]
        err = est - gt[i]
        bad = np.abs(err) > args.bad_thresh
        vc = vis_count[scenes_r.index(s)]
        dd = {
            "mae": float(np.abs(err).mean()),
            "bad_frac": float(bad.mean()),
            "bad_sign_mean": float(np.sign(err[bad]).mean()) if bad.any() else 0.0,
            "bad_mean_err": float(err[bad].mean()) if bad.any() else 0.0,
            "gt_visibility_mean_all": float(vc.mean()),
            "gt_visibility_mean_bad": float(vc[bad].mean()) if bad.any() else None,
            "gt_visibility_mean_good": float(vc[~bad].mean()),
            "bad_frac_where_gt_occluded(le1 src)": (
                float(bad[vc <= 1].mean()) if (vc <= 1).any() else None),
            "bad_frac_where_gt_visible(ge2 src)": (
                float(bad[vc >= 2].mean()) if (vc >= 2).any() else None),
        }
        report["views"][ids[i]] = {"funnel": funnel,
                                   "accepted_points": n_acc,
                                   "depth": dd}
        for k, v in funnel.items():
            tot[k] = tot.get(k, 0) + v
        tot["accepted_points"] = tot.get("accepted_points", 0) + n_acc
    report["totals"] = tot
    report["bad_thresh_m"] = args.bad_thresh

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"totals": tot}))
    for vid, r in report["views"].items():
        f = r["funnel"]
        print(f"view {vid}: accepted {r['accepted_points']:7d}  "
              f"cand {f['candidates']:9d} -> inb {f['in_bounds']:9d} -> "
              f"reproj {f['reproj_lt2']:8d} -> dd {f['rel_dd_lt_0.01']:8d} "
              f"-> ang {f['angle_lt_10deg']:8d}  "
              f"| only-kills r/d/a {f['only_reproj_fails']}/"
              f"{f['only_rel_dd_fails']}/{f['only_angle_fails']}  "
              f"| mae {r['depth']['mae']:.3f} bad% "
              f"{100 * r['depth']['bad_frac']:.1f} "
              f"vis(bad) {r['depth']['gt_visibility_mean_bad']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""A/B: round-4/5 performance deviations vs reference semantics (VERDICT r4 #4).

The perf-critical defaults deviate from the reference's search semantics:
tile-banded random draws (``coherent_random``), the footprint cap box
(``footprint_cap_mult``), the disparity extrapolation clamp
(``disp_clamp_frac``), the init normal cone (``init_normal_cone_deg``) and
8-bit quad-packed source sampling (``src_quant8``). The reference draws
full-range per-pixel randoms every iteration with unbounded footprints
(src/PatchMatch.cu:197-226, 642-722) — the mechanism by which PatchMatch
escapes local minima. This harness measures what the deviations cost (or
don't) in accuracy: the full pipeline (photometric + planar prior + 2
geometric passes + fusion) runs twice on the raytraced shapes scene, once
per arm, and reports depth MAE + cloud F1 for both.

    python tools/ab_deviations.py --height 240 --width 320 --views 7 \
        --out AB_r05.json

Results land in BASELINE.md; if the deviations cost >0.02 F1 the
reference-semantics arm becomes the accuracy default.
"""

import argparse
import json
import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

ARMS = {
    # solver defaults = the perf deviations, all on
    "deviations_on": {},
    # the reference's search semantics: full-range per-pixel randoms,
    # unbounded footprints, full-hemisphere init normals, f32 sampling
    "reference_semantics": dict(coherent_random=False,
                                footprint_cap_mult=0.0,
                                disp_clamp_frac=0.0,
                                init_normal_cone_deg=90.0,
                                src_quant8=False),
}


def run_arm(name, overrides, scene, args):
    import numpy as np

    from mpmvs_tpu.eval import eval_point_cloud, eval_scene_depths
    from mpmvs_tpu.io.dmb import write_dmb
    from mpmvs_tpu.io.ply import read_ply_binary
    from mpmvs_tpu.params import ConfigParams, PatchMatchParams
    from mpmvs_tpu.pipeline import Pipeline
    from mpmvs_tpu.utils.synthetic import gt_point_cloud
    from mpmvs_tpu.utils.workspace import write_workspace

    workdir = os.path.join(args.workdir, name)
    shutil.rmtree(workdir, ignore_errors=True)
    ws = os.path.join(workdir, "ws")
    write_workspace(scene, ws)
    gt_dir = os.path.join(workdir, "gt")
    os.makedirs(gt_dir, exist_ok=True)
    for v in range(args.views):
        write_dmb(os.path.join(gt_dir, f"{v:08d}.dmb"), scene.gt_depth[v])

    cfg = ConfigParams(input_folder=ws, output_folder=ws,
                       geom_iterations=1 if args.fast else 2,
                       planar_prior=True,
                       geom_planar_prior=True, use_dynamic_consistency=True)
    if args.fast:  # plumbing smoke test only — not a valid A/B
        overrides = dict(overrides, max_iterations=1, max_scale=0,
                         geom_iterations=1)
    params = PatchMatchParams(**overrides)
    t0 = time.time()
    pipe = Pipeline(cfg, params=params)
    ply = pipe.run(log=lambda *a: None)
    wall = time.time() - t0

    depth = eval_scene_depths(os.path.join(ws, "MPMVS"), gt_dir,
                              list(range(args.views)),
                              thresholds=(0.01, 0.02, 0.1))
    pts, _, _ = read_ply_binary(ply)
    cloud = eval_point_cloud(pts, gt_point_cloud(scene, stride=2),
                             tau=args.tau)
    return {
        "params": overrides,
        "wall_s": round(wall, 1),
        "depth_mae": depth["mean"]["mae"],
        "depth_frac_within_2cm": depth["mean"]["frac_within"]["0.02"],
        "cloud": cloud.to_dict(),
        "n_fused_points": int(len(pts)),
        "per_view_mae": {v: depth[str(v)]["mae"] for v in range(args.views)},
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--views", type=int, default=7)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--tau", type=float, default=0.02)
    p.add_argument("--workdir", default="/tmp/mpmvs_ab")
    p.add_argument("--out", default=os.path.join(HERE, "AB_r05.json"))
    p.add_argument("--arms", default="deviations_on,reference_semantics")
    p.add_argument("--fast", action="store_true",
                   help="reduced schedule: plumbing smoke test only")
    args = p.parse_args()

    from mpmvs_tpu.utils.synthetic import make_shapes_scene

    scene = make_shapes_scene(num_views=args.views, height=args.height,
                              width=args.width)
    out = {"scene": {"kind": "raytraced shapes", "views": args.views,
                     "resolution": [args.width, args.height],
                     "tau": args.tau},
           "arms": {}}
    for name in args.arms.split(","):
        res = run_arm(name, ARMS[name], scene, args)
        out["arms"][name] = res
        print(json.dumps({"arm": name, "f1": res["cloud"]["f1"],
                          "mae": res["depth_mae"],
                          "wall_s": res["wall_s"]}), flush=True)
    if len(out["arms"]) == 2:
        a, b = (out["arms"]["deviations_on"],
                out["arms"]["reference_semantics"])
        out["delta"] = {
            "f1_deviations_minus_reference": round(
                a["cloud"]["f1"] - b["cloud"]["f1"], 4),
            "mae_deviations_minus_reference": round(
                a["depth_mae"] - b["depth_mae"], 4),
        }
        print(json.dumps(out["delta"]))
    out["backend"] = __import__("jax").default_backend()
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())

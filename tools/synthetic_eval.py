"""End-to-end accuracy evaluation on the raytraced multi-object scene.

VERDICT r2 missing #2: the eval harness existed but no full-pipeline
accuracy number had ever been recorded. No real dataset is reachable from
this environment (zero egress), so the richest available stand-in is the
raytraced shapes scene (utils/synthetic.make_shapes_scene): textured
wall/floor/slanted-slab/box/sphere geometry with true occlusions, depth
discontinuities and curved surfaces, exact GT depth per view and an exact
GT surface cloud. Units are meters, so F1@2cm is meaningful.

Flow (exactly the user-facing path):
  workspace written in the reference's on-disk contract (images/, cams/,
  pair.txt) -> Pipeline.run (full schedule: photometric + planar prior +
  geometric passes + fusion) -> eval.eval_scene_depths on the .dmb outputs
  + eval.eval_point_cloud on the fused PLY vs the GT cloud.

Writes EVAL_r<N>.json at the repo root (see --out default).
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--views", type=int, default=7)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--workdir", default="/tmp/mpmvs_eval_scene")
    p.add_argument("--out", default=os.path.join(HERE, "EVAL_r05.json"))
    p.add_argument("--geom-iterations", type=int, default=2)
    p.add_argument("--tau", type=float, default=0.02)
    p.add_argument("--fast", action="store_true",
                   help="reduced schedule for smoke testing")
    args = p.parse_args()

    import numpy as np

    from mpmvs_tpu.eval import eval_point_cloud, eval_scene_depths
    from mpmvs_tpu.io.dmb import write_dmb
    from mpmvs_tpu.io.ply import read_ply_binary
    from mpmvs_tpu.params import ConfigParams, PatchMatchParams
    from mpmvs_tpu.pipeline import Pipeline
    from mpmvs_tpu.utils.synthetic import gt_point_cloud, make_shapes_scene
    from mpmvs_tpu.utils.workspace import write_workspace

    t0 = time.time()
    scene = make_shapes_scene(num_views=args.views, height=args.height,
                              width=args.width)
    ws = os.path.join(args.workdir, "ws")
    write_workspace(scene, ws)
    gt_dir = os.path.join(args.workdir, "gt")
    os.makedirs(gt_dir, exist_ok=True)
    for v in range(args.views):
        write_dmb(os.path.join(gt_dir, f"{v:08d}.dmb"), scene.gt_depth[v])
    gt_cloud = gt_point_cloud(scene, stride=2)

    cfg = ConfigParams(input_folder=ws, output_folder=ws,
                       geom_iterations=args.geom_iterations,
                       planar_prior=True, geom_planar_prior=True,
                       use_dynamic_consistency=True)
    params = None
    if args.fast:
        params = PatchMatchParams(max_iterations=1, max_scale=0,
                                  geom_iterations=1)
    pipe = Pipeline(cfg, params=params)
    ply = pipe.run()
    wall = time.time() - t0

    result_dir = os.path.join(ws, "MPMVS")
    depth_metrics = eval_scene_depths(result_dir, gt_dir,
                                      list(range(args.views)),
                                      thresholds=(0.01, 0.02, 0.1))
    pts, _, _ = read_ply_binary(ply)
    cloud = eval_point_cloud(pts, gt_cloud, tau=args.tau)

    out = {
        "scene": {
            "kind": "raytraced shapes (wall/floor/slab/box/sphere)",
            "views": args.views,
            "resolution": [args.width, args.height],
            "schedule": {"planar_prior": True, "geom_planar_prior": True,
                         "geom_iterations": args.geom_iterations,
                         "fast": bool(args.fast)},
        },
        "depth": depth_metrics,
        "cloud_f1": cloud.to_dict(),
        "n_fused_points": int(len(pts)),
        "wall_s": round(wall, 1),
        "backend": __import__("jax").default_backend(),
        "note": "synthetic-but-nonplanar stand-in for ETH3D (no dataset "
                "egress); GT is exact so these are true accuracy numbers "
                "for occluded/discontinuous/curved geometry",
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"f1": cloud.f1, "accuracy": cloud.accuracy,
                      "completeness": cloud.completeness,
                      "depth_mean": depth_metrics.get("mean"),
                      "wall_s": out["wall_s"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

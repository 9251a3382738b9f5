"""A/B microbenchmark for the Pallas NCC sampling kernel on the live chip.

Measures Mtaps/s of :func:`mpmvs_tpu.ops.pallas_ncc.ncc_eval_pallas_multi`
on one solver-shaped row band at the bench operating point, for the two
field classes that dominate the solve (BASELINE.md):

  * ``coherent`` — the init field: cone normals + smooth tile-banded depth
    (what `_initial_score` evaluates).
  * ``trials``  — the refinement-trial field: full-hemisphere random
    normals + smooth banded depth (what the per-half-iteration random
    trials evaluate; the footprint-cap-bound worst case).

Run twice with the kernel's window-granularity env toggle to A/B it:

    MPMVS_NCC_WIN_BLOCKS=1 python tools/kernel_bench.py
    MPMVS_NCC_WIN_BLOCKS=2 python tools/kernel_bench.py

Each run prints one JSON line per case with compile time, steady-state
seconds per eval, and Mtaps/s. Kernel changes must be measured here on the
chip before landing (an unmeasured kernel change regresses the bench).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=2130)
    ap.add_argument("--width", type=int, default=3200)
    ap.add_argument("--views", type=int, default=11)
    ap.add_argument("--band-rows", type=int, default=64)
    ap.add_argument("--k", type=int, default=9,
                    help="stacked hypothesis fields per call")
    ap.add_argument("--scale", type=int, default=0)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cases", default="coherent,trials")
    ap.add_argument("--cap-mult", type=float, default=None,
                    help="override params.footprint_cap_mult")
    ap.add_argument("--quad", action="store_true",
                    help="sample from the quad-packed 8-bit texture")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpmvs_tpu.ops import random as rnd
    from mpmvs_tpu.ops.ncc import ncc_refside
    from mpmvs_tpu.ops.pallas_ncc import WIN_BLOCKS, ncc_eval_pallas_multi
    from mpmvs_tpu.ops.propagation import step_halo
    from mpmvs_tpu.params import PatchMatchParams
    from mpmvs_tpu.solver import build_solve_data
    from mpmvs_tpu.utils.synthetic import make_plane_scene

    interp = jax.default_backend() != "tpu"
    pkw = {}
    if args.cap_mult is not None:
        pkw["footprint_cap_mult"] = args.cap_mult
    params = PatchMatchParams(band_rows=args.band_rows, **pkw)
    scene = make_plane_scene(num_views=args.views, height=args.height,
                             width=args.width, seed=0)
    data = build_solve_data(jnp.asarray(scene.images), scene.cameras,
                            quant8=args.quad)

    H, W = args.height, args.width
    br = args.band_rows
    scale = args.scale
    offsets = params.tap_offsets(scale)
    halo = step_halo(scale)
    cap = params.cap_radius(scale)
    y0 = (H // 2 // br) * br                    # a middle band

    ref_pad = jnp.pad(data.ref_img, ((halo, halo), (0, 0)), mode="edge")
    ref_s = jax.lax.dynamic_slice(ref_pad, (y0, 0), (br + 2 * halo, W))
    refside = ncc_refside(ref_s, halo, br, offsets,
                          params.sigma_spatial, params.sigma_color)
    xb = jax.lax.broadcasted_iota(jnp.float32, (br, W), 1)
    yb = jax.lax.broadcasted_iota(jnp.float32, (br, W), 0) + y0

    def stack_planes(key, normal_fn):
        ks = jax.random.split(key, args.k)
        fields = []
        for i in range(args.k):
            kn, kd = jax.random.split(ks[i])
            n = normal_fn(kn)
            d = rnd.smooth_banded_uniform(
                *jax.random.split(kd), xb, yb, data.depth_min,
                data.depth_max, params.random_band_frac)
            from mpmvs_tpu import geometry as geo
            fields.append(geo.plane_from_depth_normal(data.K_ref, xb, yb,
                                                      d, n))
        return jnp.stack(fields)

    import math
    cone = math.radians(params.init_normal_cone_deg)
    cases = {
        "coherent": lambda key: stack_planes(
            key, lambda k: rnd.cone_normal_field(k, data.K_ref, xb, yb,
                                                 cone)),
        "trials": lambda key: stack_planes(
            key, lambda k: rnd.random_normal_field(k, data.K_ref, xb, yb)),
    }

    S = args.views - 1
    T = len(offsets)
    taps = args.k * S * br * W * T

    for name in args.cases.split(","):
        planes = jax.block_until_ready(cases[name](jax.random.PRNGKey(7)))
        qkw = (dict(src_quads=data.src_quads, quad_lo=data.quad_lo,
                    quad_iscale=data.quad_iscale) if args.quad else {})
        call = lambda p: ncc_eval_pallas_multi(
            refside, data.src_imgs, data.src_widths, data.src_heights,
            data.A, data.b, data.K_ref, p, xb, yb, tuple(offsets),
            params.cost_max, cap_radius=cap, interpret=interp, **qkw)
        # a tiny device fetch forces completion — block_until_ready lies on
        # tunneled runtimes (same workaround as bench.py's _Recorder)
        fetch = lambda o: np.asarray(o[0, 0, 0:1, 0:1])
        t0 = time.perf_counter()
        out = call(planes)
        fetch(out)
        t_compile = time.perf_counter() - t0
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fetch(call(planes))
            ts.append(time.perf_counter() - t0)
        t_eval = min(ts)
        print(json.dumps({
            "case": name, "win_blocks": WIN_BLOCKS, "k": args.k,
            "quad": args.quad,
            "band_rows": br, "shape": f"{args.width}x{args.height}x{S}src",
            "scale": scale, "cap_radius": cap,
            "t_compile_s": round(t_compile, 2),
            "t_eval_s": round(t_eval, 4),
            "mtaps_per_s": round(taps / t_eval / 1e6, 1),
            "mean_cost": round(float(jnp.mean(out)), 6),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""On-chip time decomposition of one stepped half-iteration (VERDICT r4 #1).

Attributes a half-iteration's wall time to its components, with the REAL
fields and the real surrounding glue:

  * kernel share  = (full band) - (same band with params.debug_skip_ncc):
    the stub keeps every field construction alive (it depends on the
    hypothesis planes) so the difference is exactly the Pallas/XLA sampling
    work;
  * gcost share   = (full band) - (band with debug_skip_gcost), geom mode;
  * dispatch/tunnel overhead = sum of per-band serialized walls (a host
    fetch after each band) - the async wall of dispatching the same bands
    and fetching once at the end;
  * pad + merge are timed as their own device executions.

Each case prints one JSON line; the final line aggregates an estimated
full half-iteration decomposition. Run on the bench chip:

    python tools/solve_trace.py --height 2130 --width 3200 --max-bands 6
    python tools/solve_trace.py --geom --state converged --max-bands 6

Findings land in BASELINE.md (the round-5 "where the 3.3x lives" table).
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
    ap.add_argument("--scales", default="0")
    ap.add_argument("--state", default="init", choices=["init", "converged"])
    ap.add_argument("--geom", action="store_true")
    ap.add_argument("--max-bands", type=int, default=6,
                    help="bands actually timed (extrapolated to all)")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/mpmvs_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import dataclasses

    from mpmvs_tpu import geometry as geo
    from mpmvs_tpu.ops.propagation import (PatchMatchState, _band_call_jit,
                                           _band_geometry, _merge_concat_jit,
                                           _pad_step_jit)
    from mpmvs_tpu.params import PatchMatchParams
    from mpmvs_tpu.solver import _init_plane_jit, build_solve_data
    from mpmvs_tpu.utils.synthetic import make_plane_scene

    emit = lambda o: print(json.dumps(o), flush=True)

    def fetch(tree):
        # Slice ON DEVICE before converting: np.asarray on a full leaf
        # transfers the whole array through the tunnel (~45 MB/s D2H) and
        # inflates every timing it is part of (round-5 bug, caught when an
        # elementwise add on (2130, 3200) "took" 633 ms).
        l = jax.tree.leaves(tree)[0]
        return np.asarray(l[(slice(0, 1),) * l.ndim])

    # --- dispatch/tunnel round-trip latency ---
    trivial = jax.jit(lambda a: a + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    fetch(trivial(z))
    lats = []
    for _ in range(20):
        t0 = time.perf_counter()
        fetch(trivial(z))
        lats.append(time.perf_counter() - t0)
    lat = float(np.median(lats))
    emit({"case": "dispatch_latency", "median_s": round(lat, 4),
          "min_s": round(min(lats), 4)})

    H, W, V = args.height, args.width, args.views
    S = V - 1
    params0 = PatchMatchParams(sampler="pallas", band_rows=args.band_rows)
    scene = make_plane_scene(num_views=V, height=H, width=W, seed=0)
    images = jnp.asarray(scene.images)
    src_depths = jnp.asarray(scene.gt_depth[1:]) if args.geom else None
    # pad like solve_view_stepped does
    pad_h, pad_w = H % 2, W % 2
    assert pad_h == 0 and pad_w == 0, "use even dims for the trace"
    data = build_solve_data(images, scene.cameras, src_depths,
                            quant8=params0.src_quant8)

    key = jax.random.PRNGKey(3)
    if args.state == "init":
        plane = _init_plane_jit(data, params0, key, "photometric", None)
        cost = jax.random.uniform(key, (H, W), jnp.float32, 0.05, 1.9)
    else:
        x, y = geo.pixel_grid(H, W)
        d = jnp.asarray(scene.gt_depth[0]) * (
            1.0 + 0.003 * jax.random.normal(key, (H, W)))
        n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0], jnp.float32),
                             (H, W, 3))
        plane = geo.plane_from_depth_normal(data.K_ref, x, y, d, n)
        cost = jax.random.uniform(key, (H, W), jnp.float32, 0.02, 0.3)
    sel = jax.random.randint(key, (H, W), 1, 2 ** S, jnp.int32)
    state = PatchMatchState(plane=plane, cost=cost,
                            geom_cost=jnp.zeros((H, W), jnp.float32),
                            sel=sel)
    jax.block_until_ready(state)

    geom = bool(args.geom)
    variants = [("full", {})]
    variants.append(("skip_ncc", {"debug_skip_ncc": True}))
    if geom:
        variants.append(("skip_gcost", {"debug_skip_gcost": True}))
        variants.append(("skip_both", {"debug_skip_ncc": True,
                                       "debug_skip_gcost": True}))

    summary = []
    for scale in [int(s) for s in args.scales.split(",")]:
        halo, br, n_bands, pad_b = _band_geometry(H, W, S, scale, geom,
                                                  args.band_rows)
        nb = min(args.max_bands, n_bands)
        for name, over in variants:
            params = dataclasses.replace(params0, **over)
            t0 = time.perf_counter()
            pads = _pad_step_jit(state, data, halo=halo, pad_b=pad_b,
                                 prior=False)
            fetch(pads["cost_pad"])
            t_pad = time.perf_counter() - t0

            call = lambda b: _band_call_jit(
                pads, data, params, scale=scale, iteration=jnp.int32(1),
                phase=0, key_b=jax.random.fold_in(key, b), key_step=key,
                geom=geom, prior=False, halo=halo, br=br,
                y0=jnp.int32(b * br))
            t0 = time.perf_counter()
            fetch(call(0))
            t_compile = time.perf_counter() - t0

            # serialized per-band timing (middle bands)
            b0 = max(0, (n_bands - nb) // 2)
            per_band = []
            for rep in range(args.reps):
                for b in range(b0, b0 + nb):
                    t0 = time.perf_counter()
                    fetch(call(b))
                    per_band.append(time.perf_counter() - t0)
            t_band = float(np.median(per_band))

            # async: dispatch the same bands, fetch once
            outs = []
            t0 = time.perf_counter()
            for b in range(b0, b0 + nb):
                outs.append(call(b))
            fetch(outs[-1])
            t_async = time.perf_counter() - t0

            # merge (with dummy repeats of the outs to n_bands)
            full_outs = (outs * ((n_bands + nb - 1) // nb))[:n_bands]
            t0 = time.perf_counter()
            m = _merge_concat_jit(state, 0, geom, full_outs, H=H)
            fetch(m)
            t_merge = time.perf_counter() - t0

            row = {"case": f"half:scale{scale}:{name}", "state": args.state,
                   "geom": geom, "band_rows": br, "n_bands": n_bands,
                   "bands_timed": nb, "t_pad_s": round(t_pad, 3),
                   "t_compile_s": round(t_compile, 1),
                   "t_band_serial_s": round(t_band, 3),
                   "t_async_per_band_s": round(t_async / nb, 3),
                   "t_merge_s": round(t_merge, 3),
                   "est_half_serial_s": round(
                       t_pad + n_bands * t_band + t_merge, 2),
                   "est_half_async_s": round(
                       t_pad + n_bands * t_async / nb + t_merge, 2)}
            emit(row)
            summary.append(row)

    emit({"case": "summary", "dispatch_latency_s": round(lat, 4),
          "rows": [{k: r[k] for k in ("case", "t_band_serial_s",
                                      "t_async_per_band_s",
                                      "est_half_async_s")}
                   for r in summary]})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Headline benchmark: photometric PatchMatch depth maps per second per chip.

Runs the full photometric pass (multi-scale, all iterations, init, median
filter) of the flagship solver on a synthetic multi-view scene on the
available accelerator and prints ONE JSON line.

Baseline note: the reference repo publishes no numbers (BASELINE.md). The
``vs_baseline`` ratio is computed against an *estimated* A100 figure for the
reference CUDA code at the same operating point, derived from the
per-pixel work model in SURVEY.md §3.3 (ACMMP-class implementations run a
photometric pass over a 3200x2130 view with ~10 source images in roughly
1-2 s on A100-class hardware). We use 0.67 depth-maps/s (1.5 s/view) as the
nominal baseline until the real A100 measurement lands (BASELINE.md TODO 1).
Scale-invariant comparison: the benchmark size below is smaller than
3200x2130, so the baseline is scaled by pixel count.
"""

import json
import os
import sys
import time

# Benchmark operating point (overridable via env for experiments).
HEIGHT = int(os.environ.get("BENCH_HEIGHT", 1080))
WIDTH = int(os.environ.get("BENCH_WIDTH", 1600))
NUM_VIEWS = int(os.environ.get("BENCH_VIEWS", 11))  # 1 ref + 10 sources
REPEATS = int(os.environ.get("BENCH_REPEATS", 3))

REF_PIXELS = 3200 * 2130
REF_A100_DM_PER_S = 0.67  # estimated, see module docstring


def main():
    import jax
    import jax.numpy as jnp
    from mpmvs_tpu.params import PatchMatchParams
    from mpmvs_tpu.solver import solve_view
    from mpmvs_tpu.utils.synthetic import make_plane_scene

    scene = make_plane_scene(num_views=NUM_VIEWS, height=HEIGHT, width=WIDTH,
                             seed=0)
    params = PatchMatchParams()
    images = jnp.asarray(scene.images)
    key = jax.random.PRNGKey(0)

    # compile (excluded from timing)
    res = solve_view(images, scene.cameras, key, params, "photometric")
    res.depth.block_until_ready()

    times = []
    for i in range(REPEATS):
        k = jax.random.PRNGKey(i + 1)
        t0 = time.perf_counter()
        res = solve_view(images, scene.cameras, k, params, "photometric")
        res.depth.block_until_ready()
        times.append(time.perf_counter() - t0)

    best = min(times)
    dm_per_s = 1.0 / best
    # scale the estimated baseline to this operating point by pixel count
    pixels = HEIGHT * WIDTH
    baseline_here = REF_A100_DM_PER_S * REF_PIXELS / pixels
    print(json.dumps({
        "metric": f"photometric depth-maps/s @ {WIDTH}x{HEIGHT}x{NUM_VIEWS - 1}src",
        "value": round(dm_per_s, 4),
        "unit": "depth-maps/s/chip",
        "vs_baseline": round(dm_per_s / baseline_here, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

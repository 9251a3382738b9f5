"""Multi-host execution: mesh = (hosts x chips), view jobs sharded globally.

The reference is strictly single-process/single-GPU (cudaSetDevice(0),
src/PatchMatch.cpp:509). SURVEY.md §2.7/§7.8 calls for the TPU-native
scale-out: ``jax.distributed`` process initialization, one global device
mesh spanning all hosts, per-view solve jobs sharded over it, and the
cross-view depth exchange riding ICI/DCN collectives instead of the
filesystem.

Design:
  * every process loads the (shared) workspace and builds identical
    process-local numpy batches; global arrays are assembled with
    ``jax.make_array_from_callback`` so each host only materializes its own
    shards on device;
  * all processes execute the same jit'd sharded solves (SPMD), including
    the planar-prior sub-runs: each process triangulates its addressable
    views host-side and the prior arrays are re-assembled as global arrays;
  * each process writes .dmb checkpoints for its addressable views (resume
    path); for fusion the final results are all-gathered over DCN to
    process 0, so a shared filesystem is NOT required;
  * sky masks (optional) are computed on process 0 right before fusion —
    every process loads the full workspace, so the images are present.

Launch (one command per host/process):
    python -m mpmvs_tpu.parallel.multihost \
        --coordinator HOST:PORT --num-processes N --process-id I \
        --input WORKSPACE [--cpu-devices K] [--preset fast]

On a real TPU pod slice, omit --coordinator/--num-processes/--process-id:
``jax.distributed.initialize()`` auto-detects the slice topology. The
``--cpu-devices`` flag exists for testing the multi-host path on CPU
(K virtual devices per process, gloo collectives) — tests/test_multihost.py
runs 2 localhost processes x 4 devices.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional

import numpy as np


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               cpu_devices: Optional[int] = None):
    """jax.distributed bring-up. Call before any other jax use.

    With ``cpu_devices`` set, forces the CPU backend with that many virtual
    devices per process and gloo cross-process collectives (the test
    configuration); otherwise uses the platform defaults (TPU pod).
    """
    import jax

    if cpu_devices:
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", cpu_devices)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if coordinator is None:
        jax.distributed.initialize()  # auto-detected (TPU pod slice)
    else:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)

    # Establish the cross-process collective context NOW with a trivial
    # psum: the context rendezvous has a short (~30 s) key-value deadline,
    # and the first *real* collective sits behind minutes of compilation
    # whose duration can skew between processes. A warm-up collective
    # compiles in seconds on every process, so the rendezvous always lands
    # inside the deadline.
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()), ("d",))
    x = jax.make_array_from_callback(
        (len(jax.devices()),), NamedSharding(mesh, P("d")),
        lambda idx: np.zeros(1, np.float32))
    jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(
        x).block_until_ready()
    return jax


class MultiHostPipeline:
    """Thin orchestrator over ShardedPipeline for multi-process runs."""

    def __init__(self, config, params=None):
        import jax
        from mpmvs_tpu.parallel.view_sharding import ShardedPipeline

        # the global mesh spans every process's devices
        self.jax = jax
        self.inner = ShardedPipeline(config, params=params,
                                     devices=jax.devices())
        self.process_id = jax.process_index()

    def _make_global(self, arr):
        """np array -> global jax.Array sharded over the batch axis."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(self.inner.mesh, P("view"))
        return jax.make_array_from_callback(arr.shape, sharding,
                                            lambda idx: np.asarray(arr[idx]))

    @staticmethod
    def _barrier(name: str, timeout_ms: int = 1_800_000):
        """Coordination-service barrier (control plane, not a device
        collective): safe even when processes' workloads are asymmetric —
        e.g. process 0 fusing for minutes while the others idle — where a
        psum-style barrier can hit the collective transport's timeout."""
        import jax
        from jax._src import distributed

        client = distributed.global_state.client
        if client is not None:
            client.wait_at_barrier(name, timeout_ms)
        else:  # single-process fallback
            pass

    def _addressable_rows(self, arr):
        """Sorted global row indices of `arr` addressable on this process."""
        owned = set()
        for s in arr.addressable_shards:
            idx = s.index[0]
            lo = (idx.start or 0) if isinstance(idx, slice) else int(idx)
            n = s.data.shape[0] if isinstance(idx, slice) else 1
            owned.update(range(lo, lo + n))
        return sorted(owned)

    def _global_from_rows(self, rows: dict, shape, dtype):
        """Assemble a ("view",)-sharded global array from per-row host data
        (every addressable row must be present in ``rows``)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(self.inner.mesh, P("view"))

        def cb(idx):
            sl = idx[0]
            lo = sl.start or 0
            hi = sl.stop if sl.stop is not None else shape[0]
            return np.stack([rows[i] for i in range(lo, hi)]).astype(dtype)

        return jax.make_array_from_callback(shape, sharding, cb)

    def _prior_subrun_mh(self, batch, res, keys, geom, src_d, plog):
        """Multi-host planar-prior sub-run: each process triangulates the
        views whose result rows it holds (host-side Delaunay, tiny), prior
        arrays are assembled as ("view",)-sharded global arrays, and one
        SPMD prior-regularized solve runs over the full mesh — parity with
        ShardedPipeline._prior_subrun (single-host)."""
        import cv2
        import jax
        import jax.numpy as jnp
        from jax.experimental import multihost_utils
        from mpmvs_tpu.parallel import view_sharding as vs
        from mpmvs_tpu.prior import build_planar_prior, draw_triangulation

        inner = self.inner
        Np, _, H, W = batch.images.shape
        N = len(batch.ref_ids)
        plane_rows, mask_rows = {}, {}
        has_local = np.zeros((Np,), bool)
        for i in self._addressable_rows(res.depth):
            plane_rows[i] = np.zeros((H, W, 4), np.float32)
            mask_rows[i] = np.zeros((H, W), bool)
            if i >= N:
                continue  # batch padding row
            vid = batch.ref_ids[i]
            h, w = batch.orig_sizes[i]
            cam = inner.views[vid].camera
            depth_i = self._fetch_row(res.depth, i)
            cost_i = self._fetch_row(res.cost, i)
            geomc_i = self._fetch_row(res.geom_cost, i) if geom else None
            pr = build_planar_prior(
                depth_i[:h, :w], cost_i[:h, :w], np.asarray(cam.K),
                float(cam.depth_min) * 0.6, float(cam.depth_max) * 1.2,
                geom_cost=geomc_i[:h, :w] if geom else None)
            if pr is None:
                continue
            plane_rows[i][:h, :w] = pr.planes
            mask_rows[i][:h, :w] = pr.mask
            has_local[i] = True
            cv2.imwrite(os.path.join(inner.result_dir(vid),
                                     "triangulation.png"),
                        draw_triangulation(inner.views[vid].image, pr))
        # global agreement on which views have a prior. Align processes
        # first: the allgather creates a fresh gloo/DCN communicator whose
        # rendezvous has a ~30 s deadline, while the preceding per-process
        # work (solve completion, triangulation) is unsynchronized.
        self._barrier("mpmvs_prior_gather")
        has = multihost_utils.process_allgather(has_local).reshape(
            -1, Np).max(axis=0).astype(bool)
        if not has.any():
            return res
        planes = self._global_from_rows(plane_rows, (Np, H, W, 4), np.float32)
        masks = self._global_from_rows(mask_rows, (Np, H, W), bool)
        geom_prior = geom and inner.config.geom_prior_consistency
        res2 = vs.solve_scenes_sharded(
            batch.images, batch.cameras, keys, inner.params,
            "geom_prior" if geom_prior else "prior", inner.mesh,
            warm=res, src_depths=src_d if geom_prior else None,
            prior_planes=planes, prior_mask=masks)
        keep = jnp.asarray(has)
        pick = jax.jit(lambda r2, r1: jax.tree.map(
            lambda a2, a1: jnp.where(
                keep.reshape((Np,) + (1,) * (a2.ndim - 1)), a2, a1), r2, r1))
        plog(f"prior sub-run: {int(has.sum())}/{N} views triangulated")
        return pick(res2, res)

    def run(self, log=print, resume: bool = False):
        import jax
        import jax.numpy as jnp
        from jax.experimental import multihost_utils
        from mpmvs_tpu.parallel import view_sharding as vs
        from mpmvs_tpu.solver import SolveResult

        inner = self.inner
        pid = self.process_id
        plog = (lambda *a: log(f"[proc {pid}]", *a)) if pid == 0 else (
            lambda *a: None)

        if not inner.scenes:
            inner.load()
        batch = vs.build_scene_batch(inner)
        # pad the batch axis to a multiple of the mesh size (explicit global
        # arrays, unlike in-jit sharding constraints, need even division);
        # padding rows duplicate scene 0 and are dropped at save time
        N = len(batch.ref_ids)
        D = len(jax.devices())
        Np = -(-N // D) * D
        pad0 = lambda a: np.concatenate(
            [np.asarray(a)] + [np.asarray(a[:1])] * (Np - N), axis=0)
        batch = vs.SceneBatch(
            images=self._make_global(pad0(batch.images)),
            cameras=jax.tree.map(
                lambda a: self._make_global(pad0(a)), batch.cameras),
            src_indices=pad0(batch.src_indices),
            ref_ids=batch.ref_ids, orig_sizes=batch.orig_sizes)
        plog(f"{N} views over {jax.process_count()} processes x "
             f"{len(jax.local_devices())} devices")

        def keys(tag):
            inner.key, sub = jax.random.split(inner.key)
            return jax.random.split(jax.random.fold_in(sub, tag), Np)

        res = None
        for pi, (tag, geom, prior) in enumerate(inner.pass_schedule()):
            if geom:
                src_d = vs.gather_src_depths(
                    res.depth, jnp.asarray(batch.src_indices))
                res = vs.solve_scenes_sharded(
                    batch.images, batch.cameras, keys(2 * pi), inner.params,
                    "geom", inner.mesh, warm=res, src_depths=src_d)
            else:
                src_d = None
                res = vs.solve_scenes_sharded(batch.images, batch.cameras,
                                              keys(2 * pi), inner.params,
                                              "photometric", inner.mesh)
            if prior:
                res = self._prior_subrun_mh(batch, res, keys(2 * pi + 1),
                                            geom, src_d, plog)
            self._store_addressable(batch, res, inner)
            plog(f"pass {tag} done")

        # Collective result gather: every process contributes its shards,
        # process 0 ends up with the full stacked results in host RAM — no
        # shared filesystem required for fusion (the per-process .dmb writes
        # above remain as resume checkpoints). Cost: one DCN all-gather of
        # (Np, H, W) x4-ish — small next to a pass's solve time. Barrier
        # first: fresh communicator rendezvous needs bounded skew (above).
        self._barrier("mpmvs_passes_done")
        full = jax.tree.map(
            lambda a: multihost_utils.process_allgather(a, tiled=True), res)
        ply = None
        if pid == 0:
            for i, vid in enumerate(batch.ref_ids):
                h, w = batch.orig_sizes[i]
                inner.views[vid].result = SolveResult(
                    depth=np.asarray(full.depth[i])[:h, :w],
                    normal=np.asarray(full.normal[i])[:h, :w],
                    cost=np.asarray(full.cost[i])[:h, :w],
                    geom_cost=np.asarray(full.geom_cost[i])[:h, :w])
            if inner.config.sky_seg:
                # all images are loaded on every process; masks are cheap
                # 384x384 inferences — run them where fusion runs
                inner._compute_sky_masks(plog)
            ply = inner.fuse(log=plog)
        # hold every process until fusion finishes so they exit together
        # (the runtime's shutdown barrier expects all tasks within its
        # deadline)
        self._barrier("mpmvs_fusion_done")
        return ply

    def _store_addressable(self, batch, res, inner):
        """Write .dmb checkpoints for the batch rows this process holds."""
        from mpmvs_tpu.solver import SolveResult

        owned = set()
        for s in res.depth.addressable_shards:
            idx = s.index[0]
            lo = (idx.start or 0) if isinstance(idx, slice) else int(idx)
            n = s.data.shape[0] if isinstance(idx, slice) else 1
            owned.update(range(lo, lo + n))
        for i in sorted(owned):
            if i >= len(batch.ref_ids):
                continue
            vid = batch.ref_ids[i]
            h, w = batch.orig_sizes[i]
            row = {name: self._fetch_row(getattr(res, name), i)
                   for name in ("depth", "normal", "cost", "geom_cost")}
            inner.views[vid].result = SolveResult(
                depth=row["depth"][:h, :w], normal=row["normal"][:h, :w],
                cost=row["cost"][:h, :w], geom_cost=row["geom_cost"][:h, :w])
            inner.save_view(vid)

    @staticmethod
    def _fetch_row(arr, i):
        """Host copy of global array row i (must be addressable here)."""
        for s in arr.addressable_shards:
            idx = s.index[0]
            lo = (idx.start or 0) if isinstance(idx, slice) else int(idx)
            n = s.data.shape[0] if isinstance(idx, slice) else 1
            if lo <= i < lo + n:
                return np.asarray(s.data)[i - lo]
        raise KeyError(f"row {i} not addressable on this process")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="mpmvs-multihost",
        description="Multi-host (hosts x chips) MP-MVS runner")
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (omit on a TPU pod slice)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--cpu-devices", type=int, default=None,
                   help="test mode: CPU backend with K virtual devices")
    p.add_argument("--input", required=True)
    p.add_argument("--output", default=None)
    p.add_argument("--geom-iterations", type=int, default=None)
    p.add_argument("--preset", choices=["full", "fast"], default="full")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--planar-prior", action="store_true",
                   help="enable the planar-prior schedule (main.cpp:20-41)")
    p.add_argument("--geom-planar-prior", action="store_true",
                   help="prior sub-runs inside geometric passes")
    p.add_argument("--sky-seg", action="store_true")
    args = p.parse_args(argv)

    initialize(args.coordinator, args.num_processes, args.process_id,
               args.cpu_devices)

    from mpmvs_tpu.params import ConfigParams, PatchMatchParams

    cfg = ConfigParams(input_folder=args.input,
                       output_folder=args.output or args.input,
                       planar_prior=args.planar_prior,
                       geom_planar_prior=args.geom_planar_prior,
                       sky_seg=args.sky_seg,
                       seed=args.seed)
    if args.geom_iterations is not None:
        cfg.geom_iterations = args.geom_iterations
    params = None
    if args.preset == "fast":
        params = PatchMatchParams(max_iterations=1, geom_iterations=1,
                                  max_scale=0)
    pipe = MultiHostPipeline(cfg, params=params)
    ply = pipe.run()
    if ply:
        print(f"point cloud: {ply}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""View-parallel multi-scene solving over a device mesh.

The reference computes depth maps serially on one GPU (main.cpp:21-26,
cudaSetDevice(0)). Here N per-view jobs are a *batch dimension* sharded over
the mesh's "view" axis: photometric passes need zero communication, and the
geometric pass's neighbor-depth exchange — a filesystem round-trip in the
reference (PatchMatch.cpp:938-949) — becomes `jnp.take` across the sharded
batch, which XLA lowers to ICI collectives.

Scenes are padded to a uniform (V, H, W): dummy source views get zero-sized
camera extents so every NCC sample is out of bounds -> cost 2.0 -> they are
never selected (the same mechanism the solver uses for real out-of-range
projections), and padded pixels are cropped after the solve.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpmvs_tpu.camera import Camera, CameraStack
from mpmvs_tpu.params import PatchMatchParams
from mpmvs_tpu.parallel.mesh import make_view_mesh
from mpmvs_tpu.pipeline import Pipeline, _pad_stack
from mpmvs_tpu.solver import SolveResult, solve_view_impl


def _batched_solve(images, cameras, keys, params, mode, warm, src_depths,
                   prior_planes, prior_mask):
    fn = partial(solve_view_impl, params=params, mode=mode)

    def one(img, cam, key, w, sd, pp, pm):
        return fn(img, cam, key, warm=w, src_depths=sd, prior_planes=pp,
                  prior_mask=pm)

    return jax.vmap(one)(images, cameras, keys, warm, src_depths,
                         prior_planes, prior_mask)


@partial(jax.jit, static_argnames=("params", "mode", "mesh"))
def solve_scenes_sharded(images, cameras, keys, params: PatchMatchParams,
                         mode: str, mesh: Mesh,
                         warm=None, src_depths=None,
                         prior_planes=None, prior_mask=None):
    """Solve N scenes at once, batch axis sharded over mesh axis "view".

    images: (N, V, H, W); cameras: CameraStack with (N, V, ...) leaves;
    keys: (N, 2) uint32. Optional warm/src_depths/prior_* are batched
    pytrees or None.
    """
    shard = NamedSharding(mesh, P("view"))
    images = jax.lax.with_sharding_constraint(images, shard)
    return _batched_solve(images, cameras, keys, params, mode, warm,
                          src_depths, prior_planes, prior_mask)


def gather_src_depths(depths, src_indices):
    """(N, H, W) sharded depths + (N, S) source indices -> (N, S, H, W).

    The cross-shard gather is the TPU-native replacement for the
    reference's per-view .dmb reads before a geometric pass.
    """
    return jnp.take(depths, src_indices, axis=0)


@dataclasses.dataclass
class SceneBatch:
    """Uniformly padded multi-scene arrays ready for sharded solving."""

    images: jnp.ndarray        # (N, V, H, W)
    cameras: CameraStack       # (N, V, ...) leaves
    src_indices: np.ndarray    # (N, V-1) batch indices of source scenes
    ref_ids: List[int]
    orig_sizes: List[tuple]    # per scene (h, w)


def build_scene_batch(pipeline: Pipeline) -> SceneBatch:
    scenes = [s for s in pipeline.scenes if s.estimate]
    id2batch = {s.ref_id: i for i, s in enumerate(scenes)}
    V = max(len(s.src_ids) for s in scenes)
    H = max(pipeline.views[v].image.shape[0]
            for s in scenes for v in s.src_ids)
    W = max(pipeline.views[v].image.shape[1]
            for s in scenes for v in s.src_ids)

    imgs, cams, src_idx, sizes = [], [], [], []
    for s in scenes:
        recs = [pipeline.views[v] for v in s.src_ids]
        stack = _pad_stack([r.image for r in recs], (H, W))
        cam_list = [r.camera for r in recs]
        while len(cam_list) < V:  # dummy views: zero extent -> always OOB
            stack = np.concatenate([stack, np.zeros((1, H, W), np.float32)])
            cam_list.append(Camera.create(K=np.eye(3), R=np.eye(3),
                                          t=np.zeros(3), width=0, height=0))
        imgs.append(stack)
        cams.append(CameraStack.stack(cam_list))
        # source scene batch indices for depth gathering (self-pad with own id)
        sidx = [id2batch.get(v, id2batch[s.ref_id]) for v in s.src_ids[1:]]
        sidx += [id2batch[s.ref_id]] * (V - 1 - len(sidx))
        src_idx.append(sidx)
        sizes.append(pipeline.views[s.ref_id].image.shape)
    batched_cams = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    return SceneBatch(images=jnp.asarray(np.stack(imgs)), cameras=batched_cams,
                      src_indices=np.asarray(src_idx, np.int32),
                      ref_ids=[s.ref_id for s in scenes], orig_sizes=sizes)


class ShardedPipeline(Pipeline):
    """Pipeline that runs each pass as one sharded batch over all devices."""

    def __init__(self, config, params=None, devices="all"):
        super().__init__(config, params)
        if isinstance(devices, str):
            devs = jax.devices() if devices == "all" else [
                jax.devices()[int(i)] for i in devices.split(",")]
        else:
            devs = devices
        self.mesh = make_view_mesh(devs)

    def _store_batch(self, batch: SceneBatch, res: SolveResult, tag: str):
        """Crop each view's result out of the padded batch, update records,
        write the .dmb checkpoints and mark the pass completed."""
        for i, vid in enumerate(batch.ref_ids):
            h, w = batch.orig_sizes[i]
            self.views[vid].result = SolveResult(
                depth=res.depth[i, :h, :w], normal=res.normal[i, :h, :w],
                cost=res.cost[i, :h, :w], geom_cost=res.geom_cost[i, :h, :w])
            self.save_view(vid)
        self._mark_pass_done(tag)

    def _batch_from_records(self, batch: SceneBatch) -> SolveResult:
        """Re-assemble a padded batched SolveResult from per-view records
        (used when resuming from .dmb checkpoints)."""
        N, _, H, W = batch.images.shape
        stack = lambda leaf, shape: jnp.asarray(_pad_stack(
            [np.asarray(getattr(self.views[v].result, leaf))
             for v in batch.ref_ids], shape))
        return SolveResult(depth=stack("depth", (H, W)),
                           normal=stack("normal", (H, W, 3)),
                           cost=stack("cost", (H, W)),
                           geom_cost=stack("geom_cost", (H, W)))

    def _prior_subrun(self, batch: SceneBatch, res: SolveResult, keys,
                      geom: bool, src_d, log):
        """Sharded planar-prior sub-run: Delaunay/plane-fit per view on the
        host (tiny, CPU — SURVEY §7.6), then one batched prior-regularized
        solve. Views whose prior construction fails keep their result, like
        the single-device path (pipeline.process_view)."""
        from mpmvs_tpu.prior import build_planar_prior, draw_triangulation
        import cv2
        import os

        N, _, H, W = batch.images.shape
        planes = np.zeros((N, H, W, 4), np.float32)
        masks = np.zeros((N, H, W), bool)
        has = np.zeros((N,), bool)
        depth_h = np.asarray(res.depth)
        cost_h = np.asarray(res.cost)
        geomc_h = np.asarray(res.geom_cost) if geom else None
        for i, vid in enumerate(batch.ref_ids):
            h, w = batch.orig_sizes[i]
            cam = self.views[vid].camera
            pr = build_planar_prior(
                depth_h[i, :h, :w], cost_h[i, :h, :w], np.asarray(cam.K),
                float(cam.depth_min) * 0.6, float(cam.depth_max) * 1.2,
                geom_cost=geomc_h[i, :h, :w] if geom else None)
            if pr is None:
                continue
            planes[i, :h, :w] = pr.planes
            masks[i, :h, :w] = pr.mask
            has[i] = True
            cv2.imwrite(os.path.join(self.result_dir(vid),
                                     "triangulation.png"),
                        draw_triangulation(self.views[vid].image, pr))
        if not has.any():
            return res
        geom_prior = geom and self.config.geom_prior_consistency
        res2 = solve_scenes_sharded(
            batch.images, batch.cameras, keys, self.params,
            "geom_prior" if geom_prior else "prior", self.mesh,
            warm=res, src_depths=src_d if geom_prior else None,
            prior_planes=jnp.asarray(planes), prior_mask=jnp.asarray(masks))
        keep = jnp.asarray(has)
        pick = lambda a2, a1: jnp.where(
            keep.reshape((N,) + (1,) * (a2.ndim - 1)), a2, a1)
        log(f"prior sub-run: {int(has.sum())}/{N} views triangulated")
        return jax.tree.map(pick, res2, res)

    def run(self, log=print, resume: bool = False):
        cfg = self.config
        if not self.scenes:
            self.load()
        batch = build_scene_batch(self)
        N = len(batch.ref_ids)
        log(f"{N} views sharded over {len(self.mesh.devices)} devices")

        def keys(tag):
            self.key, sub = jax.random.split(self.key)
            return jax.random.split(jax.random.fold_in(sub, tag), N)

        sched = self.pass_schedule()
        skip, loaded = self._resume_point(resume)
        if loaded:
            log(f"resume: skipping {skip} completed pass(es)")
            res = self._batch_from_records(batch)
        else:
            import os
            if os.path.exists(self._manifest_path()):
                os.remove(self._manifest_path())
            res = None

        for pi, (tag, geom, prior) in enumerate(sched):
            if pi < skip:
                continue
            if geom:
                src_d = gather_src_depths(res.depth,
                                          jnp.asarray(batch.src_indices))
                res = solve_scenes_sharded(
                    batch.images, batch.cameras, keys(2 * pi), self.params,
                    "geom", self.mesh, warm=res, src_depths=src_d)
            else:
                src_d = None
                res = solve_scenes_sharded(batch.images, batch.cameras,
                                           keys(2 * pi), self.params,
                                           "photometric", self.mesh)
            if prior:
                res = self._prior_subrun(batch, res, keys(2 * pi + 1), geom,
                                         src_d, log)
            self._store_batch(batch, res, tag)
            log(f"pass {tag} done")

        if cfg.sky_seg:
            self._compute_sky_masks(log)
        return self.fuse(log=log)

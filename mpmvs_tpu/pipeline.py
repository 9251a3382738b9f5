"""Full-pipeline driver: the reference's main() + ProcessProblem as a
library (reference: src/main.cpp:6-55, src/PatchMatch.cpp:506-638).

Phases, matching the reference schedule exactly:
  1. photometric pass over all estimable views (with a prior sub-run when
     ``planar_prior`` and not ``geom_planar_prior``);
  2. ``geom_iterations`` geometric passes over all views, with a prior
     sub-run inside every non-final pass when ``geom_planar_prior``;
  3. optional sky masking;
  4. multi-view fusion to a colored PLY.

Unlike the reference — which round-trips every pass through .dmb files
(SURVEY.md §1 "file-based wire protocol") — results flow pass-to-pass in
memory (device arrays); .dmb/.jpg files are written as checkpoints and for
drop-in output compatibility, and a crashed run resumes from them
(``resume=True``), making the reference's incidental restartability an
explicit feature (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mpmvs_tpu.camera import Camera, CameraStack
from mpmvs_tpu.io import (read_cam_txt, read_pair_txt, write_dmb, read_dmb,
                          write_ply_binary)
from mpmvs_tpu.io.cams import Scene
from mpmvs_tpu.params import ConfigParams, PatchMatchParams
from mpmvs_tpu.prior import build_planar_prior, draw_triangulation
from mpmvs_tpu.solver import SolveResult, solve_view
from mpmvs_tpu.fusion import run_fusion
from mpmvs_tpu.utils import visualize
from mpmvs_tpu.utils.trace import StageTimer, device_sync


@dataclasses.dataclass
class ViewRecord:
    """One view's loaded inputs + evolving results."""

    index: int
    image: np.ndarray          # (h, w) float32 grayscale
    color: np.ndarray          # (h, w, 3) float32 BGR
    camera: Camera
    result: Optional[SolveResult] = None
    sky_mask: Optional[np.ndarray] = None


def _load_view(input_folder: str, view_id: int, max_image_size: int) -> ViewRecord:
    """imread grayscale float32 + rescale >max_image_size with K adjustment
    (PatchMatchInit, PatchMatch.cpp:873-925)."""
    import cv2
    img_path = os.path.join(input_folder, "images", f"{view_id:08d}.jpg")
    gray = cv2.imread(img_path, cv2.IMREAD_GRAYSCALE)
    if gray is None:
        raise FileNotFoundError(img_path)
    color = cv2.imread(img_path, cv2.IMREAD_COLOR)
    cam = read_cam_txt(os.path.join(input_folder, "cams", f"{view_id:08d}_cam.txt"))
    h, w = gray.shape
    if max(h, w) > max_image_size:
        factor = min(max_image_size / w, max_image_size / h)
        nw, nh = round(w * factor), round(h * factor)
        gray = cv2.resize(gray, (nw, nh), interpolation=cv2.INTER_LINEAR)
        color = cv2.resize(color, (nw, nh), interpolation=cv2.INTER_LINEAR)
        cam = cam.rescale(nw / w, nh / h, nw, nh)
        h, w = nh, nw
    else:
        cam = cam.rescale(1.0, 1.0, w, h)
    return ViewRecord(index=view_id, image=gray.astype(np.float32),
                      color=color.astype(np.float32), camera=cam)


def _pad_stack(arrays: List[np.ndarray], shape, fill=0.0) -> np.ndarray:
    out = np.full((len(arrays),) + tuple(shape), fill, np.float32)
    for i, a in enumerate(arrays):
        sl = tuple(slice(0, s) for s in a.shape)
        out[i][sl] = a
    return out


class Pipeline:
    """End-to-end MP-MVS pipeline over a COLMAP-converted dense workspace."""

    def __init__(self, config: ConfigParams,
                 params: Optional[PatchMatchParams] = None):
        self.config = config
        self.params = params or PatchMatchParams(
            max_image_size=config.max_image_size)
        self.key = jax.random.PRNGKey(config.seed)
        self.scenes: List[Scene] = []
        self.views: Dict[int, ViewRecord] = {}
        # per-stage tracing (SURVEY.md §5); set MPMVS_PROFILE_DIR for XLA
        # device traces on top of the wall-clock spans (utils/trace.py)
        self.timer = StageTimer()

    # ---------------- data ----------------

    def load(self):
        cfg = self.config
        self.scenes = read_pair_txt(os.path.join(cfg.input_folder, "pair.txt"),
                                    cfg.max_source_images)
        for s in self.scenes:
            if not s.estimate:
                continue
            for vid in s.src_ids:
                if vid not in self.views:
                    self.views[vid] = _load_view(cfg.input_folder, vid,
                                                 cfg.max_image_size)
        return self

    def result_dir(self, view_id: int) -> str:
        d = os.path.join(self.config.output_folder, "MPMVS",
                         f"2333_{view_id:08d}")
        os.makedirs(d, exist_ok=True)
        return d

    # ---------------- per-view solve ----------------

    def _scene_stack(self, scene: Scene):
        recs = [self.views[v] for v in scene.src_ids]
        H = max(r.image.shape[0] for r in recs)
        W = max(r.image.shape[1] for r in recs)
        images = _pad_stack([r.image for r in recs], (H, W))
        cams = CameraStack.stack([r.camera for r in recs])
        return jnp.asarray(images), cams, (H, W)

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def process_view(self, scene: Scene, geom: bool, prior: bool,
                     log=print) -> SolveResult:
        """ProcessProblem equivalent: one view's solve (+ prior sub-run).

        The prior sub-run reproduces the reference exactly by default:
        photometric scoring, ``max_iterations`` iterations at scale 0
        (SetGeomConsistencyParams(false, true), PatchMatch.cpp:533, 655-663).
        With ``config.geom_prior_consistency`` and ``geom=True`` it instead
        keeps the geometric term + iteration count ("geom_prior" mode).
        """
        t0 = time.time()
        images, cams, (H, W) = self._scene_stack(scene)
        rec = self.views[scene.ref_id]
        h, w = rec.image.shape
        warm = rec.result

        src_depths = None
        if geom:
            src_depths = jnp.asarray(_pad_stack(
                [np.asarray(self.views[v].result.depth)
                 for v in scene.src_ids[1:]], (H, W)))
            with self.timer.span("solve_geom"):
                res = solve_view(images, cams, self._next_key(), self.params,
                                 "geom", warm=_pad_result(warm, H, W),
                                 src_depths=src_depths)
                device_sync(res.depth)
        else:
            with self.timer.span("solve_photometric"):
                res = solve_view(images, cams, self._next_key(), self.params,
                                 "photometric")
                device_sync(res.depth)
        res = _crop_result(res, h, w)

        if prior:
            ref_cam = rec.camera
            geom_cost = np.asarray(res.geom_cost) if geom else None
            with self.timer.span("prior_build"):
                pr = build_planar_prior(
                    np.asarray(res.depth), np.asarray(res.cost),
                    np.asarray(ref_cam.K),
                    float(ref_cam.depth_min) * 0.6,
                    float(ref_cam.depth_max) * 1.2,
                    geom_cost=geom_cost)
            if pr is not None:
                import cv2
                cv2.imwrite(os.path.join(self.result_dir(scene.ref_id),
                                         "triangulation.png"),
                            draw_triangulation(rec.image, pr))
                if self.config.save_prior_dmb:
                    self._save_prior(scene.ref_id, pr, (h, w))
                geom_prior = geom and self.config.geom_prior_consistency
                with self.timer.span("solve_prior"):
                    res2 = solve_view(
                        images, cams, self._next_key(), self.params,
                        "geom_prior" if geom_prior else "prior",
                        warm=_pad_result(res, H, W),
                        src_depths=src_depths if geom_prior else None,
                        prior_planes=jnp.asarray(
                            _pad_stack([pr.planes], (H, W, 4))[0]),
                        prior_mask=jnp.asarray(_pad_stack(
                            [pr.mask.astype(np.float32)], (H, W))[0] > 0))
                    device_sync(res2.depth)
                res = _crop_result(res2, h, w)

        rec.result = res
        log(f"view {scene.ref_id:08d}: geom={geom} prior={prior} "
            f"{time.time() - t0:.1f}s")
        return res

    def _save_prior(self, view_id: int, pr, shape):
        """Rasterized prior depth/normal maps (the reference sketches this as
        commented-out depths_prior.dmb/normal_prior.dmb writes,
        PatchMatch.cpp:600-605); enabled by ``save_prior_dmb``."""
        from mpmvs_tpu import geometry as geo
        h, w = shape
        cam = self.views[view_id].camera
        x, y = np.meshgrid(np.arange(w, dtype=np.float32),
                           np.arange(h, dtype=np.float32))
        pl = pr.planes[:h, :w]
        mask = pr.mask[:h, :w]
        d = np.asarray(geo.depth_from_plane(jnp.asarray(cam.K),
                                            jnp.asarray(pl),
                                            jnp.asarray(x), jnp.asarray(y)))
        d = np.where(mask, d, 0.0).astype(np.float32)
        dirn = self.result_dir(view_id)
        write_dmb(os.path.join(dirn, "depths_prior.dmb"), d)
        write_dmb(os.path.join(dirn, "normal_prior.dmb"),
                  np.where(mask[..., None], pl[..., :3], 0.0).astype(np.float32))

    def save_view(self, view_id: int):
        """Reference-layout .dmb outputs + costs.jpg (PatchMatch.cpp:620-633)."""
        import cv2
        rec = self.views[view_id]
        res = rec.result
        d = self.result_dir(view_id)
        write_dmb(os.path.join(d, "depths.dmb"), np.asarray(res.depth))
        write_dmb(os.path.join(d, "normals.dmb"), np.asarray(res.normal))
        write_dmb(os.path.join(d, "costs.dmb"), np.asarray(res.cost))
        cv2.imwrite(os.path.join(d, "costs.jpg"),
                    visualize.cost_to_img(np.asarray(res.cost)))

    def load_view_result(self, view_id: int) -> bool:
        d = self.result_dir(view_id)
        try:
            depth = read_dmb(os.path.join(d, "depths.dmb"))
            normal = read_dmb(os.path.join(d, "normals.dmb"))
            cost = read_dmb(os.path.join(d, "costs.dmb"))
        except (FileNotFoundError, ValueError):
            return False
        self.views[view_id].result = SolveResult(
            depth=jnp.asarray(depth), normal=jnp.asarray(normal),
            cost=jnp.asarray(cost), geom_cost=jnp.zeros_like(jnp.asarray(cost)))
        return True

    # ---------------- pass manifest (checkpoint/resume) ----------------
    # The reference resumes only *incidentally* (geom passes re-read .dmb
    # files, PatchMatch.cpp:1052-1086) and only into a geometric pass. Here
    # every completed pass is recorded in a manifest next to the .dmb
    # checkpoints, so a killed run resumes after the last *completed* pass —
    # photometric or any geometric iteration (SURVEY.md §5).

    def _manifest_path(self) -> str:
        d = os.path.join(self.config.output_folder, "MPMVS")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, "progress.json")

    def completed_passes(self) -> List[str]:
        import json
        try:
            with open(self._manifest_path()) as f:
                return json.load(f).get("completed", [])
        except (FileNotFoundError, ValueError):
            return []

    def _mark_pass_done(self, tag: str):
        import json
        done = self.completed_passes()
        if tag not in done:
            done.append(tag)
        with open(self._manifest_path(), "w") as f:
            json.dump({"completed": done}, f)

    def pass_schedule(self):
        """[(tag, geom, prior), ...] — the reference's main.cpp:20-41 order."""
        cfg = self.config
        photo_prior = cfg.planar_prior and not cfg.geom_planar_prior
        sched = [("photometric", False, photo_prior)]
        for git in range(cfg.geom_iterations):
            prior = (cfg.planar_prior and cfg.geom_planar_prior
                     and git != cfg.geom_iterations - 1)
            sched.append((f"geom_{git}", True, prior))
        return sched

    def _resume_point(self, resume: bool):
        """(number of passes to skip, whether stored results were loaded)."""
        if not resume:
            return 0, False
        done = self.completed_passes()
        sched = self.pass_schedule()
        skip = 0
        for tag, _, _ in sched:
            if tag in done:
                skip += 1
            else:
                break
        if skip == 0:
            return 0, False
        ok = all(self.load_view_result(s.ref_id)
                 for s in self.scenes if s.estimate)
        if not ok:
            return 0, False  # checkpoints missing — recompute from scratch
        return skip, True

    # ---------------- passes ----------------

    def run(self, log=print, resume: bool = False):
        cfg = self.config
        if not self.scenes:
            self.load()
        estimable = [s for s in self.scenes if s.estimate]
        log(f"{len(estimable)} depth maps to compute")

        sched = self.pass_schedule()
        skip, loaded = self._resume_point(resume)
        if loaded:
            log(f"resume: skipping {skip} completed pass(es) "
                f"({', '.join(t for t, _, _ in sched[:skip])})")
        elif os.path.exists(self._manifest_path()):
            os.remove(self._manifest_path())  # fresh run: drop stale manifest

        for pi, (tag, geom, prior) in enumerate(sched):
            if pi < skip:
                continue
            for s in estimable:
                # within-pass resume for the (long) photometric pass only:
                # per-view .dmb results exist but the pass isn't marked done
                if (resume and not geom and skip == 0
                        and self.load_view_result(s.ref_id)):
                    continue
                self.process_view(s, geom=geom, prior=prior, log=log)
                with self.timer.span("checkpoint"):
                    self.save_view(s.ref_id)
            self._mark_pass_done(tag)

        # sky masks (main.cpp:43-47)
        if cfg.sky_seg:
            with self.timer.span("sky_masks"):
                self._compute_sky_masks(log)

        ply = self.fuse(log=log)
        log(self.timer.summary())
        self.timer.dump_json(os.path.join(cfg.output_folder, "MPMVS",
                                          "timing.json"))
        return ply

    def _compute_sky_masks(self, log=print):
        from mpmvs_tpu.models.sky import generate_sky_masks
        generate_sky_masks(self, log=log)

    def fuse(self, log=print) -> str:
        """RunFusion + PLY (PatchMatch.cpp:287-504)."""
        cfg = self.config
        estimable = [s for s in self.scenes if s.estimate]
        ids = sorted({v for s in estimable for v in ([s.ref_id] + s.src_ids)
                      if self.views.get(v) and self.views[v].result is not None})
        H = max(self.views[i].image.shape[0] for i in ids)
        W = max(self.views[i].image.shape[1] for i in ids)
        depths = _pad_stack([np.asarray(self.views[i].result.depth) for i in ids], (H, W))
        normals = _pad_stack([np.asarray(self.views[i].result.normal) for i in ids], (H, W, 3))
        colors = _pad_stack([self.views[i].color for i in ids], (H, W, 3))
        sky = None
        if any(self.views[i].sky_mask is not None for i in ids):
            sky = _pad_stack(
                [np.asarray(self.views[i].sky_mask, np.float32)
                 if self.views[i].sky_mask is not None else np.zeros((H, W), np.float32)
                 for i in ids], (H, W)) > 0.5
        remap = {vid: k for k, vid in enumerate(ids)}
        scenes_r = [Scene(ref_id=remap[s.ref_id],
                          src_ids=[remap[v] for v in s.src_ids if v in remap],
                          estimate=True)
                    for s in estimable if s.ref_id in remap]
        cams = CameraStack.stack([self.views[i].camera for i in ids])
        t0 = time.time()
        with self.timer.span("fusion"):
            pts, nrm, col = run_fusion(depths, normals, colors, cams, scenes_r,
                                       use_dynamic=cfg.use_dynamic_consistency,
                                       sky_masks=sky)
        log(f"fusion: {len(pts)} points in {time.time() - t0:.1f}s")
        out_dir = os.path.join(cfg.output_folder, "MPMVS")
        os.makedirs(out_dir, exist_ok=True)
        ply_path = os.path.join(out_dir, "MPMVS_model.ply")
        write_ply_binary(ply_path, pts, nrm, col)
        if any([cfg.save_dmb, cfg.save_cost_dmb, cfg.save_normal_dmb]):
            self.save_visualizations()
        return ply_path

    def save_visualizations(self):
        """saveDmbAsJpg equivalent (utility.cpp:479-520)."""
        import cv2
        cfg = self.config
        for s in self.scenes:
            if not s.estimate or self.views[s.ref_id].result is None:
                continue
            d = self.result_dir(s.ref_id)
            res = self.views[s.ref_id].result
            if cfg.save_dmb:
                cv2.imwrite(os.path.join(d, "depths.jpg"),
                            visualize.depth_to_jet(np.asarray(res.depth)))
            if cfg.save_cost_dmb:
                cv2.imwrite(os.path.join(d, "costs.jpg"),
                            visualize.cost_to_img(np.asarray(res.cost)))
            if cfg.save_normal_dmb:
                cv2.imwrite(os.path.join(d, "normals.jpg"),
                            visualize.normal_to_img(np.asarray(res.normal)))


def _pad_result(res: SolveResult, H: int, W: int) -> SolveResult:
    def pad(a, extra_dims=0):
        a = np.asarray(a)
        pads = [(0, H - a.shape[0]), (0, W - a.shape[1])] + [(0, 0)] * extra_dims
        return jnp.asarray(np.pad(a, pads))
    if res.depth.shape == (H, W):
        return res
    return SolveResult(depth=pad(res.depth), normal=pad(res.normal, 1),
                       cost=pad(res.cost), geom_cost=pad(res.geom_cost))


def _crop_result(res: SolveResult, h: int, w: int) -> SolveResult:
    if res.depth.shape == (h, w):
        return res
    return SolveResult(depth=res.depth[:h, :w], normal=res.normal[:h, :w],
                       cost=res.cost[:h, :w], geom_cost=res.geom_cost[:h, :w])

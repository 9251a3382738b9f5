"""Solver and pipeline configuration.

``PatchMatchParams`` mirrors the algorithmic constants of the reference
(include/PatchMatch.h:48-67 plus kernel literals), ``ConfigParams`` the YAML
pipeline config (include/utility.h:28-47, config/config.yaml). Unlike the
reference — which bakes the config path in at compile time
(include/ProjectPath.h.in) — the config here is a plain dataclass loadable
from YAML or CLI flags.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import yaml


@dataclasses.dataclass(frozen=True)
class PatchMatchParams:
    """Static solver hyperparameters (hashable: used as a jit static arg)."""

    max_iterations: int = 3          # photometric iters per scale (PatchMatch.cpp:664)
    geom_iterations: int = 2         # iters in a geometric pass (PatchMatch.cpp:659)
    ncc_taps_per_axis: int = 6       # NCC taps per axis (6x6 = 36, PatchMatch.cu:341-373)
    sigma_spatial: float = 5.0       # bilateral weights (PatchMatch.h:54)
    sigma_color: float = 3.0         # (PatchMatch.h:55)
    top_k: int = 4                   # initial view selection (PatchMatch.h:56)
    max_scale: int = 2               # coarse-to-fine scales 2..0 (PatchMatch.h:59)
    max_image_size: int = 3200       # (PatchMatch.h:52)
    cost_max: float = 2.0            # NCC invalid cost (PatchMatch.cu:341)
    geom_cost_max: float = 3.0       # reprojection error clamp (PatchMatch.cu:619)
    geom_weight: float = 0.2         # geometric cost weight (PatchMatch.cu:687,886)
    # (no geom_fail_cost knob: the reference's missing-candidate penalty
    # 0.1*3.0 on top of an *uninitialized* cost read (PatchMatch.cu:889) is
    # replaced by +inf — invalid candidates are never adopted. Documented
    # deviation, see ops/propagation.py.)
    num_mc_samples: int = 15         # Monte-Carlo view draws (PatchMatch.cu:856)
    prior_gamma: float = 0.5         # planar-prior score floor (PatchMatch.cu:926)
    prior_beta: float = 0.18         # cost->score temperature (PatchMatch.cu:932)
    prior_angle_sigma_deg: float = 5.0  # (PatchMatch.cu:929)
    prior_depth_sigma_frac: float = 1.0 / 64.0  # of depth range (PatchMatch.cu:927)
    refine_perturbation: float = 0.02   # ±2% depth / 0.02π normal (PatchMatch.cu:644)
    # Deviations from reference quirks (SURVEY.md §7e), defaults documented:
    # reference's refinement always overwrites the prior-guided random sample
    # (missing `else`, PatchMatch.cu:660-663); True reproduces that behavior.
    legacy_prior_refinement: bool = True
    # rows per processing band; 0 = automatic (auto_band_rows). Banding
    # bounds peak memory of the (candidates x views x H x W) cost tensors.
    band_rows: int = 0
    # Source-sampling implementation for the NCC hot loop:
    #   "auto"   — Pallas kernel on TPU, XLA gathers elsewhere;
    #   "pallas" — Pallas sweep kernel for coherent evals, XLA for random;
    #   "pallas_sorted" — additionally route random-depth fields (init +
    #                     2 refinement trials, which project incoherently)
    #                     through the bucket-sorted kernel (opt-in);
    #   "xla"    — force XLA gathers everywhere.
    sampler: str = "auto"
    # Footprint cap (documented deviation, round 4): hypotheses whose
    # projected NCC window leaves a box of ±footprint_cap_mult * (window
    # radius 5*2^scale) around the center projection cost cost_max. Applied
    # identically by both samplers (ops/ncc.ncc_eval, ops/pallas_ncc). This
    # bounds the Pallas sweep kernel's per-tile work arithmetically — a
    # single near-grazing random normal otherwise poisons its whole tile's
    # footprint (measured ~5 Mtaps/s vs ~690 coherent on v5e). Capped
    # hypotheses are extreme >cap_mult x anisotropic stretches whose
    # bilateral ZNCC is meaningless; the reference simply pays the texture
    # fetches for them (PatchMatch.cu:363-377). 0 disables.
    footprint_cap_mult: float = 4.0
    # Tile-coherent random depth draws (documented deviation, round 4): init
    # and the 2 random-depth refinement trials draw depths banded per 8x128
    # kernel tile (ops/random.banded_uniform) instead of per-pixel over the
    # full range, so their evals run in the sweep kernel instead of the
    # ~33 Mtaps/s XLA gather fallback (~80% of projected solve time in r3).
    # Full-range coverage comes from re-drawing every half-iteration.
    coherent_random: bool = True
    random_band_frac: float = 1.0 / 32.0  # band width as a range fraction
    # Disparity extrapolation clamp for candidate EVALUATION (documented
    # deviation, round 4 — see ops/propagation._band_step): candidates are
    # scored at a disparity within ±disp_clamp_frac x (disparity range) of
    # their source pixel's stored depth. Never engages for plausible
    # surfaces (a legit plane moves disparity ≲1% of the range over the
    # ≤23 px propagation reach); bounds the sweep kernel's footprint for
    # junk random-normal extrapolations in not-yet-converged regions.
    # Adoption still stores the original plane. 0 disables.
    disp_clamp_frac: float = 1.0 / 16.0
    # Quad-packed source sampling (documented deviation, round 5): the
    # Pallas sweep kernel samples sources from a prepacked texture holding
    # each 2x2 bilinear patch as 4 x uint8 in one 32-bit lane, so ONE
    # lane-gather fetches all four corners (vs 4 gathers), sweep steps
    # cover 16 source rows (vs 8), and slab DMA halves. Sample values are
    # quantized to 256 levels on a per-stack affine grid — EXACT for
    # imagery decoded from 8-bit files (the reference's input domain,
    # colmap2mvsnet_acm.py images; the reference itself scores uint8
    # texels, PatchMatch.cpp:73-77 CV_8U + tex2D<uint8_t>), and ~0.2%
    # sample noise for synthetic float imagery. ZNCC is invariant to the
    # affine rescale itself. Off = round-4 f32 sampling.
    src_quant8: bool = True
    # Init normals drawn within a cone of this half-angle around the
    # anti-viewing ray (documented deviation — ops/random.cone_normal_field):
    # near-grazing seeds dominate the sweep kernel's early footprints; the
    # refinement trials keep the reference's full-hemisphere draw so steep
    # surfaces stay reachable. >= 90 restores the reference's init too.
    init_normal_cone_deg: float = 60.0
    # Execution granularity of solve_view:
    #   "fused"   — the whole run is one XLA program (CPU tests, vmapped
    #               batches, real pod chips);
    #   "stepped" — host-driven per-band device executions (runtimes that
    #               bound single-execution wall time, e.g. the tunneled
    #               bench chip kills executions over ~1 min — the round-1/2
    #               "TPU worker crashed"; also the reference's granularity,
    #               PatchMatch.cu:1200-1244);
    #   "auto"    — stepped on TPU, fused elsewhere.
    dispatch: str = "auto"
    # INTERNAL instrumentation (tools/solve_trace.py): replace the NCC
    # sampling kernels / the geometric-consistency cost with near-free
    # plane-dependent stubs, so (full band) - (stubbed band) isolates that
    # component's share of a half-iteration with the real fields and the
    # real surrounding glue. Results are meaningless for reconstruction.
    debug_skip_ncc: bool = False
    debug_skip_gcost: bool = False

    @property
    def ncc_taps(self) -> int:
        return self.ncc_taps_per_axis * self.ncc_taps_per_axis

    def effective_band_frac(self) -> float:
        """Band width for cold (random-init photometric) schedules. Banded
        draws rely on re-drawing every half-iteration to cover the range;
        smoke schedules (< 4 draw rounds, e.g. the CLI "fast" preset) have
        too few redraws, so they fall back to full-range draws (the
        reference's semantics). Warm-started modes (geom/prior) always use
        ``random_band_frac`` — their trials explore around a converged
        field."""
        rounds = (self.max_scale + 1) * self.max_iterations
        if rounds < 4:
            return 1.0
        return self.random_band_frac

    def cap_radius(self, scale: int) -> float:
        """Footprint-cap box half-width in px for one scale (0 = off).

        The per-scale growth is clamped at 2x: an uncapped 2**scale factor
        gave scale 2 an 80 px cap box, and random-normal trial fields at
        that box ran at ~3 Mtaps/s on v5e vs 213 Mtaps/s at 40 px
        (tools/kernel_bench.py --scale 2, round 4b) — the 88-154 s scale-2
        half-iterations of BENCH r4 were exactly this. A 40 px box still
        allows ~2x the nominal scale-2 window half-extent (~20 px), i.e.
        ~60 deg of slant-induced stretch; steeper hypotheses score
        cost_max at the coarsest scale only and remain reachable at
        scales 1/0 (caps 40/20 px vs 10/5 px nominal)."""
        if self.footprint_cap_mult <= 0.0:
            return 0.0
        cap = self.footprint_cap_mult * 5.0 * min(2 ** scale, 2)
        if scale > 2:
            # Floor for user-set max_scale >= 3 (ADVICE r4): the 2x growth
            # clamp above would otherwise shrink the cap box to at-or-below
            # the nominal window half-extent (5*2^scale), scoring nearly
            # every hypothesis cost_max at the coarsest scales. Keep at
            # least 2x the nominal extent so moderate magnification and
            # slant survive; the box still bounds grazing stretches.
            cap = max(cap, 2.0 * 5.0 * (2 ** scale))
        return cap

    def tap_offsets(self, scale: int):
        """Static window offsets for one scale: step 2*2^scale, 6 taps per
        axis at ±{0.5, 1.5, 2.5}*step (PatchMatch.cu:341-373: radius
        5*step/2, stride step). Returns a list of (dx, dy) ints."""
        step = 2 * (2 ** scale)
        radius = 5 * step // 2
        axis = list(range(-radius, radius + 1, step))
        assert len(axis) == self.ncc_taps_per_axis
        return [(dx, dy) for dx in axis for dy in axis]


@dataclasses.dataclass
class ConfigParams:
    """Pipeline configuration (the reference's config/config.yaml schema)."""

    input_folder: str = ""
    output_folder: str = ""
    geom_iterations: int = 2        # number of geometric passes over all views
    planar_prior: bool = True
    geom_planar_prior: bool = True
    sky_seg: bool = False
    use_dynamic_consistency: bool = True
    save_dmb: bool = False
    save_prior_dmb: bool = False
    save_cost_dmb: bool = False
    save_normal_dmb: bool = False
    max_source_images: int = 20
    max_image_size: int = 3200
    seed: int = 0
    # Extension (not in the reference YAML schema): make the prior sub-run
    # inside geometric passes keep the 0.2-weighted geometric-consistency
    # term and the geometric iteration count. The reference *drops* both —
    # its prior Run always calls SetGeomConsistencyParams(false, true)
    # (PatchMatch.cpp:533, 655-663), i.e. photometric scoring with
    # max_iterations=3 — so False reproduces the reference exactly and True
    # enables the paper's arguably-intended geom+prior coupling.
    geom_prior_consistency: bool = False

    # Reference YAML keys (config/config.yaml:1-18, utility.cpp:8-35).
    _YAML_KEYS = {
        "Input-folder": "input_folder",
        "Output-folder": "output_folder",
        "Geometric consistency iterations": "geom_iterations",
        "Planer prior": "planar_prior",
        "Geometric consistency planer prior": "geom_planar_prior",
        "Sky segment": "sky_seg",
        "Use dynamic_consistency to fuse": "use_dynamic_consistency",
        "Save Dmb as JPG": "save_dmb",
        "Save Prior Dmb as JPG": "save_prior_dmb",
        "Save Cost Map": "save_cost_dmb",
        "Save Normal Map": "save_normal_dmb",
        "Max source images num": "max_source_images",
        "Max image size": "max_image_size",
        # extension keys (accepted, not produced by the reference)
        "Geometric prior consistency": "geom_prior_consistency",
    }

    @classmethod
    def from_yaml(cls, path: str) -> "ConfigParams":
        with open(path) as f:
            text = f.read()
        # The reference config starts with an OpenCV FileStorage directive
        # ("%YAML:1.0") that PyYAML rejects; strip it for compatibility.
        lines = [l for l in text.splitlines() if not l.startswith("%YAML")]
        raw = yaml.safe_load("\n".join(lines)) or {}
        cfg = cls()
        for key, value in raw.items():
            attr = cls._YAML_KEYS.get(key, key if hasattr(cls, key) else None)
            if attr is None or not hasattr(cfg, attr):
                continue
            cur = getattr(cfg, attr)
            if isinstance(cur, bool):
                value = bool(int(value))
            elif isinstance(cur, int):
                value = int(value)
            setattr(cfg, attr, value)
        cfg.input_folder = cfg.input_folder.rstrip("/")
        cfg.output_folder = cfg.output_folder.rstrip("/")
        return cfg

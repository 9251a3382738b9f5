"""Sky-region masking.

Pipeline parity with the reference (GenerateSkyRegionMask,
src/PatchMatch.cpp:4-57): pyramid-downscale the RGB image to <= 768 px,
run the segmentation net (the reference's own ncnn fp16 model, executed
natively in JAX — models/ncnn.py), resize the probability mask to working
resolution, refine it with a 37x37 joint bilateral filter guided by the
RGB image, and threshold at 0.6 (SkySegment/src/SkyRegionDetect.cu:3-35).

The bilateral refinement is expressed as a static-offset accumulation
(shift + FMA per tap) — vectorized over the whole image, no gathers.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import numpy as np

# Weight resolution order: explicit env override (an ncnn model dir or a
# vendored .npz) -> the .npz vendored in this package (models/weights/) ->
# an ncnn checkout. The vendored file makes `sky_seg: 1` work without any
# external model directory (the reference hard-depends on its checkout's
# segment_model/, SkySegment/src/SkyRegionDetect.cpp:620-640).
VENDORED_NPZ = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "weights", "skyseg_fp16.npz")
SKY_MODEL_DIR = os.environ.get("MPMVS_SKY_MODEL_DIR", VENDORED_NPZ)
PARAM_NAME = "skysegsmall_sim-opt-fp16.param"
BIN_NAME = "skysegsmall_sim-opt-fp16.bin"

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32) * 255.0
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32) * 255.0

_executor_cache = {}


def sky_model_available(model_dir: str = SKY_MODEL_DIR) -> bool:
    if model_dir.endswith(".npz"):
        return os.path.exists(model_dir) or os.path.exists(VENDORED_NPZ)
    return (os.path.exists(os.path.join(model_dir, PARAM_NAME))
            and os.path.exists(os.path.join(model_dir, BIN_NAME)))


def _load_layers(model_dir: str):
    from mpmvs_tpu.models.ncnn import load_ncnn, load_npz
    if model_dir.endswith(".npz"):
        path = model_dir if os.path.exists(model_dir) else VENDORED_NPZ
        return load_npz(path)
    return load_ncnn(os.path.join(model_dir, PARAM_NAME),
                     os.path.join(model_dir, BIN_NAME))


def _get_executor(model_dir: str):
    import jax
    if model_dir not in _executor_cache:
        from mpmvs_tpu.models.ncnn import make_executor
        _executor_cache[model_dir] = jax.jit(
            make_executor(_load_layers(model_dir), "input.1", "1959"))
    return _executor_cache[model_dir]


def segment_sky(bgr: np.ndarray, model_dir: str = SKY_MODEL_DIR) -> np.ndarray:
    """(H, W, 3) BGR uint8/float -> (H, W) float sky probability.

    Matches SkySegment::maskExtractor (SkyRegionDetect.cpp:626-640):
    pyrDown to <= 768, resize to 384x384 RGB, ImageNet normalization.
    """
    import cv2
    import jax.numpy as jnp
    dst = np.asarray(bgr, np.uint8)
    while dst.shape[0] > 768 and dst.shape[1] > 768:
        dst = cv2.pyrDown(dst)
    rgb = cv2.cvtColor(cv2.resize(dst, (384, 384),
                                  interpolation=cv2.INTER_LINEAR),
                       cv2.COLOR_BGR2RGB).astype(np.float32)
    x = (rgb - _IMAGENET_MEAN) / _IMAGENET_STD
    fwd = _get_executor(model_dir)
    prob = np.asarray(fwd(jnp.asarray(x.transpose(2, 0, 1))))[0]
    return cv2.resize(prob, (bgr.shape[1], bgr.shape[0]),
                      interpolation=cv2.INTER_LINEAR)


def bilateral_refine(bgr, prob, half_window: int = 18,
                     sigma_spatial: float = 2.0 * 6.0 * 6.0,
                     sigma_color: float = 2.0 * 2.0 * 2.0,
                     threshold: float = 0.6,
                     use_pallas: Optional[bool] = None):
    """Joint bilateral mask refinement + threshold -> bool mask.

    Re-derivation of Pixel_bilateral_filter (SkyRegionDetect.cu:3-35):
    w = exp(-|dx,dy| / sigma_spatial - |dBGR| / sigma_color), taps outside
    the image excluded, output = (weighted prob > threshold).

    On TPU the 37x37 window runs as a Pallas band kernel
    (ops/pallas_bilateral.py — SURVEY §2.4 requires a kernel here); the
    jnp.roll scan below is the portable oracle used everywhere else.
    """
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    if use_pallas is None:
        use_pallas = on_tpu
    if use_pallas:
        from mpmvs_tpu.ops.pallas_bilateral import bilateral_refine_pallas
        refined = bilateral_refine_pallas(
            jnp.asarray(bgr, jnp.float32), jnp.asarray(prob, jnp.float32),
            radius=half_window, sigma_spatial=sigma_spatial,
            sigma_color=sigma_color, interpret=not on_tpu)
        return np.asarray(refined) > threshold

    bgr = jnp.asarray(bgr, jnp.float32)
    prob = jnp.asarray(prob, jnp.float32)
    offs = np.arange(-half_window, half_window + 1)
    dxy = np.stack(np.meshgrid(offs, offs, indexing="ij"), -1).reshape(-1, 2)
    dists = np.sqrt((dxy ** 2).sum(1)).astype(np.float32)

    @jax.jit
    def refine(bgr, prob):
        H, W = prob.shape
        yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

        def tap(carry, inputs):
            num, den = carry
            dy, dx, dist = inputs
            dyi = dy.astype(jnp.int32)
            dxi = dx.astype(jnp.int32)
            # roll so value at (y, x) is img[y+dy, x+dx]; mask out-of-range
            sh_bgr = jnp.roll(bgr, (-dyi, -dxi), axis=(0, 1))
            sh_prob = jnp.roll(prob, (-dyi, -dxi), axis=(0, 1))
            inb = ((xx + dxi >= 0) & (xx + dxi < W)
                   & (yy + dyi >= 0) & (yy + dyi < H))
            dc = jnp.sqrt(jnp.sum((sh_bgr - bgr) ** 2, -1))
            w = jnp.where(inb,
                          jnp.exp(-dist / sigma_spatial - dc / sigma_color),
                          0.0)
            return (num + w * sh_prob, den + w), None

        init = (jnp.zeros((H, W), jnp.float32), jnp.zeros((H, W), jnp.float32))
        (num, den), _ = jax.lax.scan(
            tap, init, (jnp.asarray(dxy[:, 0], jnp.float32),
                        jnp.asarray(dxy[:, 1], jnp.float32),
                        jnp.asarray(dists)))
        return num / jnp.maximum(den, 1e-12) > threshold

    return np.asarray(refine(bgr, prob))


def generate_sky_masks(pipeline, log=print, model_dir: str = SKY_MODEL_DIR):
    """Compute + store refined sky masks for every estimable view; writes
    skymask.jpg / skymask_refine.jpg next to the view results
    (GenerateSkyRegionMask, PatchMatch.cpp:36-54)."""
    import cv2
    if not sky_model_available(model_dir):
        log("sky segmentation model not found — skipping sky masks")
        return
    for s in pipeline.scenes:
        if not s.estimate:
            continue
        rec = pipeline.views[s.ref_id]
        prob = segment_sky(rec.color, model_dir)
        mask = bilateral_refine(rec.color, prob)
        rec.sky_mask = mask
        d = pipeline.result_dir(s.ref_id)
        cv2.imwrite(os.path.join(d, "skymask.jpg"),
                    (prob * 255.0).astype(np.uint8))
        cv2.imwrite(os.path.join(d, "skymask_refine.jpg"),
                    mask.astype(np.uint8) * 255)
        # green-overlay visualization (image_mask_fuse,
        # SkyRegionDetect.cpp:462-476, written at PatchMatch.cpp:50-53)
        fuse = np.asarray(rec.color, np.uint8).copy()
        fuse[mask] = (0, 255, 0)
        cv2.imwrite(os.path.join(d, "skymask_fuse.jpg"), fuse)
        log(f"sky mask {s.ref_id:08d}: {mask.mean() * 100:.1f}% sky")

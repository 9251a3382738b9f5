"""ncnn parser/executor + sky segmentation tests.

Model-dependent tests run only when the reference's public sky model files
are present (they are read-only inputs, never copied into this repo).
"""

import os

import numpy as np
import pytest

from mpmvs_tpu.models.sky import (SKY_MODEL_DIR, bilateral_refine,
                                  segment_sky, sky_model_available)

needs_model = pytest.mark.skipif(not sky_model_available(),
                                 reason="sky model files not available")


class TestNcnnParser:
    @needs_model
    def test_bin_fully_consumed(self):
        from mpmvs_tpu.models.ncnn import load_ncnn
        layers = load_ncnn(os.path.join(SKY_MODEL_DIR,
                                        "skysegsmall_sim-opt-fp16.param"),
                           os.path.join(SKY_MODEL_DIR,
                                        "skysegsmall_sim-opt-fp16.bin"))
        assert len(layers) == 331
        convs = [l for l in layers if l.type == "Convolution"]
        assert len(convs) == 119
        assert all("weight" in c.weights for c in convs)

    def test_param_parsing(self, tmp_path):
        from mpmvs_tpu.models.ncnn import load_ncnn
        p = tmp_path / "m.param"
        b = tmp_path / "m.bin"
        p.write_text("7767517\n2 2\n"
                     "Input    input0  0 1 data\n"
                     "Sigmoid  sig0    1 1 data out\n")
        b.write_bytes(b"")
        layers = load_ncnn(str(p), str(b))
        assert layers[1].type == "Sigmoid"
        assert layers[1].inputs == ["data"]


class TestSkySegmentation:
    @needs_model
    def test_sky_vs_ground(self):
        rng = np.random.default_rng(0)
        img = np.zeros((160, 240, 3), np.uint8)
        img[:70] = [235, 180, 135]  # BGR sky blue
        img[70:] = rng.uniform(30, 120, (90, 240, 3)).astype(np.uint8)
        prob = segment_sky(img)
        assert prob.shape == (160, 240)
        assert prob[:60].mean() > 0.8
        assert prob[90:].mean() < 0.2

    @needs_model
    def test_bilateral_refine_thresholds(self):
        rng = np.random.default_rng(1)
        img = np.zeros((40, 50, 3), np.uint8)
        img[:20] = 220
        img[20:] = rng.uniform(30, 90, (20, 50, 3)).astype(np.uint8)
        prob = np.zeros((40, 50), np.float32)
        prob[:20] = 0.95
        mask = bilateral_refine(img, prob)
        assert mask.dtype == bool
        assert mask[:15].mean() > 0.9
        assert mask[28:].mean() < 0.1

"""ncnn parser/executor + sky segmentation tests.

Sky-segmentation tests run against the weights vendored in-package
(models/weights/skyseg_fp16.npz); the raw-ncnn parse/conversion tests
additionally need the reference's public model files (read-only inputs).
"""

import os

import numpy as np
import pytest

from mpmvs_tpu.models.sky import (SKY_MODEL_DIR, VENDORED_NPZ,
                                  bilateral_refine, segment_sky,
                                  sky_model_available)

NCNN_DIR = os.environ.get("MPMVS_NCNN_MODEL_DIR",
                          "/root/reference/segment_model")
PARAM = os.path.join(NCNN_DIR, "skysegsmall_sim-opt-fp16.param")
BIN = os.path.join(NCNN_DIR, "skysegsmall_sim-opt-fp16.bin")

needs_model = pytest.mark.skipif(not sky_model_available(),
                                 reason="sky model files not available")
needs_ncnn = pytest.mark.skipif(not os.path.exists(PARAM),
                                reason="raw ncnn model files not available")


class TestNcnnParser:
    @needs_ncnn
    def test_bin_fully_consumed(self):
        from mpmvs_tpu.models.ncnn import load_ncnn
        layers = load_ncnn(PARAM, BIN)
        assert len(layers) == 331
        convs = [l for l in layers if l.type == "Convolution"]
        assert len(convs) == 119
        assert all("weight" in c.weights for c in convs)

    def test_vendored_npz_loads(self):
        from mpmvs_tpu.models.ncnn import load_npz
        assert os.path.exists(VENDORED_NPZ)
        layers = load_npz(VENDORED_NPZ)
        assert len(layers) == 331
        assert sum(l.type == "Convolution" for l in layers) == 119

    @needs_ncnn
    def test_npz_roundtrip_identical(self, tmp_path):
        """The .npz roundtrip must preserve the graph and every weight
        bit-exactly (fp16 storage is lossless for the fp16 source weights),
        so the vendored model executes identically to the raw ncnn one.
        (Full 384x384 executor equality was verified once at conversion
        time; here we check the storage itself, which implies it.)"""
        from mpmvs_tpu.models.ncnn import load_ncnn, load_npz, save_npz
        layers = load_ncnn(PARAM, BIN)
        path = str(tmp_path / "m.npz")
        save_npz(layers, path)
        l2 = load_npz(path)
        assert len(l2) == len(layers)
        for a, b in zip(layers, l2):
            assert (a.type, a.name, a.inputs, a.outputs) == (
                b.type, b.name, b.inputs, b.outputs)
            assert a.params == b.params
            assert set(a.weights) == set(b.weights)
            for k in a.weights:
                np.testing.assert_array_equal(a.weights[k], b.weights[k])

    def test_sky_works_without_reference_checkout(self, monkeypatch):
        """`sky_seg: 1` must not depend on the reference mount: the vendored
        npz is the default weight source."""
        assert sky_model_available(VENDORED_NPZ)
        img = np.zeros((96, 128, 3), np.uint8)
        img[:40] = [235, 180, 135]
        prob = segment_sky(img, model_dir=VENDORED_NPZ)
        assert prob.shape == (96, 128)
        assert prob[:30].mean() > 0.5

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

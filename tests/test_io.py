"""I/O round-trip and byte-layout tests for the reference-compatible formats."""

import struct

import numpy as np
import pytest

from mpmvs_tpu.io import (read_dmb, write_dmb, read_cam_txt, write_cam_txt,
                          read_pair_txt, write_pair_txt,
                          write_ply_binary, read_ply_binary)
from mpmvs_tpu.camera import Camera


class TestDmb:
    def test_depth_roundtrip(self, tmp_path):
        d = np.random.default_rng(0).standard_normal((7, 11)).astype(np.float32)
        p = str(tmp_path / "d.dmb")
        write_dmb(p, d)
        np.testing.assert_array_equal(read_dmb(p), d)

    def test_normal_roundtrip(self, tmp_path):
        n = np.random.default_rng(1).standard_normal((5, 6, 3)).astype(np.float32)
        p = str(tmp_path / "n.dmb")
        write_dmb(p, n)
        np.testing.assert_array_equal(read_dmb(p), n)

    def test_exact_byte_layout(self, tmp_path):
        """Header must be int32 type=1,h,w,nb then row-major float32 — the
        layout written by writeDepthDmb (utility.cpp:225-247)."""
        d = np.arange(6, dtype=np.float32).reshape(2, 3)
        p = str(tmp_path / "d.dmb")
        write_dmb(p, d)
        blob = open(p, "rb").read()
        assert struct.unpack("<4i", blob[:16]) == (1, 2, 3, 1)
        assert struct.unpack("<6f", blob[16:]) == (0, 1, 2, 3, 4, 5)

    def test_reads_reference_style_bytes(self, tmp_path):
        p = str(tmp_path / "ref.dmb")
        with open(p, "wb") as f:
            f.write(struct.pack("<4i", 1, 2, 2, 3))
            f.write(struct.pack("<12f", *range(12)))
        arr = read_dmb(p)
        assert arr.shape == (2, 2, 3)
        assert arr[0, 1, 0] == 3.0  # channel-fastest ordering


class TestCamTxt:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        K = np.array([[100.0, 0, 32], [0, 110.0, 24], [0, 0, 1]])
        R, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        cam = Camera.create(K=K, R=R, t=rng.standard_normal(3),
                            width=64, height=48, depth_min=1.5, depth_max=9.5)
        p = str(tmp_path / "00000000_cam.txt")
        write_cam_txt(p, cam, interval=0.1, depth_num=128)
        cam2 = read_cam_txt(p)
        np.testing.assert_allclose(cam2.K, cam.K, rtol=1e-6)
        np.testing.assert_allclose(cam2.R, cam.R, rtol=1e-6)
        np.testing.assert_allclose(cam2.t, cam.t, rtol=1e-6)
        np.testing.assert_allclose(cam2.C, cam.C, rtol=1e-5, atol=1e-6)
        assert float(cam2.depth_min) == pytest.approx(1.5)
        assert float(cam2.depth_max) == pytest.approx(9.5)


class TestPairTxt:
    def test_parse_semantics(self, tmp_path):
        p = str(tmp_path / "pair.txt")
        with open(p, "w") as f:
            # image 0: two sources, one with score 0 (dropped)
            # image 2: appears after a gap (image 1 missing -> estimate False)
            # image 3: zero sources -> estimate False
            f.write("3\n")
            f.write("0\n2 1 10.5 2 0\n")
            f.write("2\n1 0 33\n")
            f.write("3\n0\n")
        scenes = read_pair_txt(p)
        assert len(scenes) == 4
        assert scenes[0].src_ids == [0, 1] and scenes[0].estimate
        assert not scenes[1].estimate
        assert scenes[2].src_ids == [2, 0] and scenes[2].estimate
        assert not scenes[3].estimate

    def test_max_source_cap(self, tmp_path):
        p = str(tmp_path / "pair.txt")
        srcs = " ".join(f"{i} 5" for i in range(1, 31))
        with open(p, "w") as f:
            f.write(f"1\n0\n30 {srcs}\n")
        scenes = read_pair_txt(p, max_source_images=20)
        assert len(scenes[0].src_ids) == 21  # self + 20

    def test_write_read(self, tmp_path):
        p = str(tmp_path / "pair.txt")
        write_pair_txt(p, [[(1, 12.0), (2, 7.0)], [(0, 12.0)]])
        scenes = read_pair_txt(p)
        assert scenes[0].src_ids == [0, 1, 2]
        assert scenes[1].src_ids == [1, 0]


class TestPly:
    def test_roundtrip_and_bgr_swap(self, tmp_path):
        pts = np.array([[1.0, 2, 3], [4, 5, 6]], np.float32)
        nrm = np.array([[0, 0, 1], [0, 1, 0]], np.float32)
        bgr = np.array([[10, 20, 30], [40, 50, 60]], np.float32)
        p = str(tmp_path / "cloud.ply")
        write_ply_binary(p, pts, nrm, bgr)
        pts2, nrm2, rgb = read_ply_binary(p)
        np.testing.assert_array_equal(pts2, pts)
        np.testing.assert_array_equal(nrm2, nrm)
        np.testing.assert_array_equal(rgb[0], [30, 20, 10])  # stored as RGB

    def test_nonfinite_zeroed(self, tmp_path):
        pts = np.array([[np.nan, 2, 3]], np.float32)
        p = str(tmp_path / "cloud.ply")
        write_ply_binary(p, pts, np.zeros((1, 3), np.float32),
                         np.zeros((1, 3)))
        pts2, _, _ = read_ply_binary(p)
        np.testing.assert_array_equal(pts2, np.zeros((1, 3), np.float32))

"""COLMAP model readers + workspace conversion tests on synthetic models."""

import os
import struct

import numpy as np
import pytest

from mpmvs_tpu.preprocess.colmap import (qvec_to_rotmat, rotmat_to_qvec,
                                         read_model)
from mpmvs_tpu.preprocess.convert import convert_colmap


def _write_text_model(model_dir, n_images=4, n_points=120, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "cameras.txt"), "w") as f:
        f.write("# comment line\n")
        f.write("1 PINHOLE 160 120 150.0 150.0 80.0 60.0\n")
    pts = rng.uniform(-1, 1, (n_points, 3))
    pts[:, 2] = 0.0
    # cameras on a ring at z=-4 looking forward
    images = []
    for i in range(n_images):
        R = np.eye(3)
        C = np.array([0.4 * np.cos(i), 0.4 * np.sin(i), -4.0])
        t = -R @ C
        q = rotmat_to_qvec(R)
        images.append((q, t))
    with open(os.path.join(model_dir, "images.txt"), "w") as f:
        for i, (q, t) in enumerate(images):
            f.write(f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                    f"{t[0]} {t[1]} {t[2]} 1 img{i}.jpg\n")
            feats = []
            for pid in range(n_points):
                feats += [f"{rng.uniform(0, 160):.1f}",
                          f"{rng.uniform(0, 120):.1f}", str(pid + 1)]
            f.write(" ".join(feats) + "\n")
    with open(os.path.join(model_dir, "points3D.txt"), "w") as f:
        for pid in range(n_points):
            track = " ".join(f"{i + 1} {pid}" for i in range(n_images))
            f.write(f"{pid + 1} {pts[pid, 0]} {pts[pid, 1]} {pts[pid, 2]} "
                    f"100 120 140 0.5 {track}\n")
    return pts


class TestQuaternion:
    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        for _ in range(10):
            q = rng.standard_normal(4)
            q /= np.linalg.norm(q)
            if q[0] < 0:
                q = -q
            R = qvec_to_rotmat(q)
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
            q2 = rotmat_to_qvec(R)
            np.testing.assert_allclose(q2, q, atol=1e-8)


class TestColmapReaders:
    def test_text_model(self, tmp_path):
        _write_text_model(str(tmp_path / "sparse"))
        cams, images, points = read_model(str(tmp_path / "sparse"), ".txt")
        assert cams[1].model == "PINHOLE"
        np.testing.assert_allclose(cams[1].K[0, 0], 150.0)
        assert len(images) == 4
        assert len(points) == 120
        assert images[1].name == "img0.jpg"

    def test_binary_model(self, tmp_path):
        d = tmp_path / "sparse"
        d.mkdir()
        with open(d / "cameras.bin", "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<iiQQ", 1, 1, 160, 120))  # PINHOLE
            f.write(struct.pack("<4d", 150.0, 150.0, 80.0, 60.0))
        with open(d / "images.bin", "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<i", 1))
            f.write(struct.pack("<4d", 1, 0, 0, 0))
            f.write(struct.pack("<3d", 0.1, 0.2, 4.0))
            f.write(struct.pack("<i", 1))
            f.write(b"img0.jpg\x00")
            f.write(struct.pack("<Q", 2))
            f.write(struct.pack("<ddq", 1.0, 2.0, 5))
            f.write(struct.pack("<ddq", 3.0, 4.0, -1))
        with open(d / "points3D.bin", "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<Q", 5))
            f.write(struct.pack("<3d", 0.5, 0.6, 3.0))
            f.write(struct.pack("<3B", 10, 20, 30))
            f.write(struct.pack("<d", 0.8))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))
        cams, images, points = read_model(str(d), ".bin")
        assert cams[1].width == 160
        assert images[1].name == "img0.jpg"
        assert images[1].point3d_ids.tolist() == [5, -1]
        np.testing.assert_allclose(points[5].xyz, [0.5, 0.6, 3.0])


class TestConvert:
    def test_full_conversion(self, tmp_path):
        import cv2
        dense = tmp_path / "dense"
        _write_text_model(str(dense / "sparse"))
        os.makedirs(dense / "images")
        for i in range(4):
            cv2.imwrite(str(dense / "images" / f"img{i}.jpg"),
                        np.random.default_rng(i).integers(
                            0, 255, (120, 160, 3)).astype(np.uint8))
        out = tmp_path / "ws"
        os.makedirs(out)
        convert_colmap(str(dense), str(out), log=lambda *a: None)

        from mpmvs_tpu.io import read_pair_txt, read_cam_txt
        scenes = read_pair_txt(str(out / "pair.txt"))
        assert len(scenes) == 4
        assert all(s.estimate for s in scenes)
        cam = read_cam_txt(str(out / "cams" / "00000000_cam.txt"))
        assert float(cam.depth_min) > 0
        assert float(cam.depth_max) > float(cam.depth_min)
        # depth range brackets the true scene depth (plane at z=0, cams z=-4)
        assert float(cam.depth_min) < 4.0 < float(cam.depth_max)
        assert os.path.exists(out / "images" / "00000003.jpg")

"""Tests for the evaluation harness (the reference's declared-but-missing
DmapEval/ColmapEval capability, include/utility.h:56-57)."""

import json
import os

import numpy as np
import pytest

from mpmvs_tpu.eval import (eval_depth_map, eval_point_cloud,
                            eval_scene_depths, main as eval_main)
from mpmvs_tpu.io.dmb import write_dmb


class TestDepthMetrics:
    def test_perfect_estimate(self):
        gt = np.full((10, 12), 3.0, np.float32)
        m = eval_depth_map(gt, gt)
        assert m.completeness == 1.0
        assert m.mae == 0.0 and m.abs_rel == 0.0
        assert m.frac_within["0.02"] == 1.0

    def test_known_errors(self):
        gt = np.full((4, 5), 2.0)
        est = gt + 0.05  # 5 cm everywhere
        m = eval_depth_map(est, gt)
        assert m.mae == pytest.approx(0.05)
        assert m.abs_rel == pytest.approx(0.025)
        assert m.frac_within["0.02"] == 0.0
        assert m.frac_within["0.1"] == 1.0

    def test_invalid_gt_excluded_and_missing_est_counts(self):
        gt = np.full((4, 4), 2.0)
        gt[0, :] = 0.0          # invalid GT row: excluded entirely
        gt[1, 0] = np.nan
        est = gt.copy()
        est[2, :] = np.nan      # missing estimates: hurt completeness
        m = eval_depth_map(est, gt)
        assert m.n_gt == 11
        assert m.n_est == 7
        assert m.completeness == pytest.approx(7 / 11)
        # errors on the jointly-valid 7 pixels are zero, but frac_within is
        # over all valid-GT pixels (missing = failed)
        assert m.frac_within["0.02"] == pytest.approx(7 / 11)

    def test_empty_estimate(self):
        gt = np.full((3, 3), 1.0)
        m = eval_depth_map(np.zeros((3, 3)), gt)
        assert m.completeness == 0.0
        assert m.mae == float("inf")


class TestCloudMetrics:
    def test_identical_clouds(self):
        pts = np.random.default_rng(0).uniform(0, 1, (500, 3))
        m = eval_point_cloud(pts, pts, tau=0.02)
        assert m.accuracy == 1.0 and m.completeness == 1.0 and m.f1 == 1.0

    def test_asymmetric(self):
        # grid spacing 0.1 >> tau so no chance proximity between gt points
        g = np.linspace(0, 1, 8)
        gt = np.stack(np.meshgrid(g, g, g), -1).reshape(-1, 3)[:400]
        pred = np.concatenate([gt[:200], gt[:200] + 5.0])  # half good, half off
        m = eval_point_cloud(pred, gt, tau=0.02)
        assert m.accuracy == pytest.approx(0.5)
        assert m.completeness == pytest.approx(0.5)  # only first 200 covered
        assert m.f1 == pytest.approx(0.5)

    def test_known_distances(self):
        gt = np.zeros((1, 3))
        pred = np.array([[0.01, 0, 0], [0.05, 0, 0]])
        m = eval_point_cloud(pred, gt, tau=0.02)
        assert m.accuracy == pytest.approx(0.5)
        assert m.completeness == 1.0  # gt point within tau of pred[0]

    def test_empty(self):
        m = eval_point_cloud(np.zeros((0, 3)), np.ones((5, 3)))
        assert m.f1 == 0.0


class TestSceneEval:
    def test_scene_layout(self, tmp_path):
        res = tmp_path / "MPMVS"
        gtd = tmp_path / "gt"
        gtd.mkdir()
        rng = np.random.default_rng(2)
        for vid in (0, 1):
            d = res / f"2333_{vid:08d}"
            d.mkdir(parents=True)
            gt = rng.uniform(1, 5, (12, 16)).astype(np.float32)
            write_dmb(str(d / "depths.dmb"), gt + 0.01)
            write_dmb(str(gtd / f"{vid:08d}.dmb"), gt)
        out = eval_scene_depths(str(res), str(gtd), [0, 1, 7])
        assert set(out) == {"0", "1", "mean"}  # view 7 missing -> skipped
        assert out["mean"]["mae"] == pytest.approx(0.01, abs=1e-5)
        assert out["0"]["frac_within"]["0.02"] == 1.0

    def test_gt_resolution_mismatch(self, tmp_path):
        res = tmp_path / "MPMVS" / "2333_00000000"
        res.mkdir(parents=True)
        gtd = tmp_path / "gt"
        gtd.mkdir()
        gt_full = np.fromfunction(lambda y, x: 1.0 + 0 * x, (24, 32),
                                  dtype=np.float64).astype(np.float32)
        write_dmb(str(gtd / "00000000.dmb"), gt_full)
        write_dmb(str(res / "depths.dmb"), np.full((12, 16), 1.0, np.float32))
        out = eval_scene_depths(str(tmp_path / "MPMVS"), str(gtd), [0])
        assert out["0"]["mae"] == 0.0


class TestEvalCLI:
    def test_dmap_cli(self, tmp_path, capsys):
        gt = np.full((6, 7), 2.0, np.float32)
        write_dmb(str(tmp_path / "est.dmb"), gt)
        write_dmb(str(tmp_path / "gt.dmb"), gt)
        rc = eval_main(["dmap", "--est", str(tmp_path / "est.dmb"),
                        "--gt", str(tmp_path / "gt.dmb")])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["mae"] == 0.0

    def test_cloud_cli(self, tmp_path, capsys):
        from mpmvs_tpu.io.ply import write_ply_binary

        pts = np.random.default_rng(3).uniform(0, 1, (50, 3)).astype(np.float32)
        nrm = np.tile([0, 0, 1.0], (50, 1)).astype(np.float32)
        col = np.full((50, 3), 128, np.float32)
        write_ply_binary(str(tmp_path / "p.ply"), pts, nrm, col)
        rc = eval_main(["cloud", "--pred", str(tmp_path / "p.ply"),
                        "--gt", str(tmp_path / "p.ply"), "--tau", "0.01"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["f1"] == 1.0

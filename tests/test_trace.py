"""Tests for the per-stage tracing subsystem (utils/trace.py)."""

import json

from mpmvs_tpu.utils.trace import NullTimer, StageTimer


def test_stage_timer_aggregates_and_nests(tmp_path):
    t = StageTimer(profile_dir=None)
    for _ in range(3):
        with t.span("solve"):
            pass
    with t.span("pass"):
        with t.span("inner"):
            pass

    assert t.stats["solve"].count == 3
    assert "pass/inner" in t.stats
    assert "solve" in t.summary()

    out = tmp_path / "timing.json"
    t.dump_json(str(out))
    data = json.loads(out.read_text())
    assert data["stages"]["solve"]["count"] == 3
    assert data["wall_s"] >= 0


def test_null_timer_is_noop():
    t = NullTimer()
    with t.span("x"):
        pass
    assert t.stats == {}

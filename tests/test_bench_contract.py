"""The bench contract: `python bench.py` must print exactly one
parseable JSON line with the driver-expected fields, at any SF."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_one_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    doc = json.loads(line)
    assert doc["unit"] == "sec"
    assert isinstance(doc["value"], (int, float)) and doc["value"] > 0
    assert doc["sf"] == 0.001
    assert len(doc["queries"]) >= 15
    assert all(isinstance(v, (int, float)) for v in doc["queries"].values())
    # total is the sum of the per-query timings (within rounding)
    assert abs(sum(doc["queries"].values()) - doc["value"]) < 0.1
    # control_* keys are CONDITIONALLY present (only when the noise
    # control ran, which only happens at the driver's sf0.1): on any
    # other-SF override they must be absent, and consumers must index
    # them with .get(). Documented contract — advisor round-8 note.
    assert "control_ratio" not in doc and "control_s" not in doc


def _fake_record(tmp_path, rnd, value, control_s=None, sf=0.1):
    import json as _json

    inner = {"metric": "headline_queries_total", "value": value, "sf": sf}
    if control_s is not None:
        inner["control_s"] = control_s
        inner["control_ratio"] = round(control_s / 9.422, 3)
    (tmp_path / f"BENCH_r{rnd:02d}.json").write_text(
        _json.dumps({"tail": "noise\n" + _json.dumps(inner) + "\n"})
    )


def test_effective_record_repins_after_three_hot_sessions(tmp_path):
    """Round-9 prose criterion, now code: three consecutive all-hot
    driver sessions (control_ratio >= 1.15) re-pin the adjudication
    record to the streak's best control-normalized reading; a cool
    session anywhere in the trailing window keeps the absolute pin."""
    import bench

    # two hot sessions: streak too short, pinned record stands
    _fake_record(tmp_path, 9, 15.745, control_s=15.691)
    _fake_record(tmp_path, 10, 12.282, control_s=12.37)
    rec, basis = bench.effective_record(str(tmp_path))
    assert rec == bench.CLEAN_RECORD_S and basis is None

    # third consecutive hot session: re-pin to best normalized reading
    _fake_record(tmp_path, 11, 13.0, control_s=13.5)
    rec, basis = bench.effective_record(str(tmp_path))
    assert basis is not None
    expected = min(
        round(v * bench.CLEAN_RECORD_S / c, 3)
        for v, c in [(15.745, 15.691), (12.282, 12.37), (13.0, 13.5)]
    )
    assert rec == expected
    assert basis["hot_streak"] == [11, 10, 9]
    assert basis["pinned_record_s"] == bench.CLEAN_RECORD_S

    # a COOL session on top breaks the streak — absolute pin returns
    _fake_record(tmp_path, 12, 9.8, control_s=9.5)
    rec, basis = bench.effective_record(str(tmp_path))
    assert rec == bench.CLEAN_RECORD_S and basis is None


def test_effective_record_ignores_wrong_sf_and_gaps(tmp_path):
    import bench

    _fake_record(tmp_path, 8, 15.0, control_s=15.0)
    _fake_record(tmp_path, 9, 15.0, control_s=15.0)
    # no-control session (cool enough to skip adjudication) breaks it
    _fake_record(tmp_path, 10, 10.0)
    rec, basis = bench.effective_record(str(tmp_path))
    assert rec == bench.CLEAN_RECORD_S and basis is None

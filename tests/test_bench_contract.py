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

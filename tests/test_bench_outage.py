"""bench.py outage behavior: structured JSON + prompt exit when the
backend is down (regression for the round-3 rc=124 / parsed=null failure).

The driver runs ``python bench.py`` and records {rc, tail, parsed}. When
the TPU tunnel is unreachable the process must NOT hang in backend init
until the driver's kill — it must print one machine-readable JSON line
carrying the last driver-captured numbers (flagged stale) and exit
non-zero promptly.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_outage_emits_structured_record_and_exits_promptly():
    env = dict(os.environ)
    # An unavailable platform makes the pre-flight probe child fail fast
    # (RuntimeError at backend init) — same observable as a dead tunnel,
    # without a 240s hang per attempt.
    env["JAX_PLATFORMS"] = "cuda"
    env["GEOLDM_BENCH_PREFLIGHT_SLEEP"] = "0"
    env.pop("GEOLDM_BENCH_NO_PREFLIGHT", None)
    r = subprocess.run(
        [sys.executable, "bench.py"], cwd=REPO, capture_output=True,
        timeout=240, env=env,
    )
    assert r.returncode == 3, r.stderr.decode()[-500:]
    stderr = r.stderr.decode()
    assert "pre-flight attempt 3/3 failed" in stderr
    rec = json.loads(r.stdout.decode().strip().splitlines()[-1])
    assert rec["error"] == "backend_unavailable"
    assert rec["stale"] is True
    # The last-good driver artifact rides along so an outage round still
    # surfaces real (if stale) numbers.
    assert rec["last_good_artifact"].startswith("BENCH_r")
    lg = rec["last_good"]
    assert lg["metric"] == "qm9_sample_mol_per_sec" and lg["value"] > 0


def test_last_good_prefers_newest_parsed_artifact(tmp_path, monkeypatch):
    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.pop(0)
    # Build a fake artifact dir: r01 parsed, r02 parsed=null (outage),
    # r03 parsed — must pick r03, skipping the null.
    for n, parsed in ((1, {"value": 1.0}), (2, None), (3, {"value": 3.0})):
        (tmp_path / f"BENCH_r{n:02d}.json").write_text(
            json.dumps({"rc": 0 if parsed else 124, "parsed": parsed})
        )
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda p: str(tmp_path)
    )
    best, name = bench._last_good_bench()
    assert name == "BENCH_r03.json" and best == {"value": 3.0}

"""Multi-HOST (multi-process) mesh validation — SURVEY §5.8.

Runs scripts/dryrun_multihost.py: 2 child interpreters x 4 virtual CPU
devices with gloo cross-process collectives, a process-spanning data mesh,
a DP train step fed from per-process local shards
(make_array_from_process_local_data), loss parity vs a single-device run
of the full batch, a cross-process sharded sampling scan, and a
sequence-parallel train step whose seq-axis collectives CROSS the process
boundary (DCN-like sequence parallelism). This is the
machinery a real ICI+DCN deployment uses; single-process virtual meshes
cannot exercise it."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multihost_dryrun_two_processes():
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dryrun_multihost.py"),
         "--port", "12741"],
        capture_output=True, text=True, timeout=540, cwd=REPO,
    )
    out = res.stdout + res.stderr
    assert res.returncode == 0, out[-2000:]
    assert "multihost ok: hosts=2 devices=8" in out
    assert "sp_xhost(dp4xsp2)_err=" in out  # cross-host SP train step ran
    # Both processes printed the same replicated loss (host-side gather
    # consistency) and the DP-vs-single-device error was tiny.
    lines = [l for l in out.splitlines() if l.startswith("[p")]
    assert len(lines) == 2
    assert lines[0].split("loss=")[1] == lines[1].split("loss=")[1]

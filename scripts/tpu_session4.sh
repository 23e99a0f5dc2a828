#!/bin/bash
# Fourth TPU batch: full bench with the fetch-hardened train timing
# (re-measures the bucketed per-bucket ms honestly and warms the new
# programs' compile cache for the driver's round-end run), then the SP
# Mosaic tests at the production-shaped (8-aligned) slabs.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_r5

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" > "/tmp/tpu_r5/$name.out" 2>&1
  local rc=$?
  echo "    rc=$rc  tail:"; tail -3 "/tmp/tpu_r5/$name.out" | sed 's/^/    /'
  return $rc
}

stage bench2 3600 python bench.py
stage sp_mosaic3 2400 env GEOLDM_TEST_PLATFORM=tpu \
  python -m pytest tests/test_pallas_tpu.py -q -m "slow or not slow"
echo "=== [$(date +%H:%M:%S)] session4 done ==="

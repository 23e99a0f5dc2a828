#!/bin/bash
# Third TPU batch this round: (a) validate the scan-based train timing at
# the GEOM bucket pads where bench.py's bucketed numbers look impossible,
# (b) the GEOM backward decomposition at the RECIPE shape (pad 184, bs 32
# — the first run used the script's qm9-ish defaults), plus the dominant
# bucket (pad 64), (c) re-run the SP Mosaic tests under the bf16-scale
# lowering tolerances.
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

stage bucket_timing 2400 python /tmp/probe_bucket_timing.py
stage geom_decompose_184 2400 python scripts/bench_train_decompose.py \
  --dataset geom --pad 184 --batch_size 32 --bwd_mode pallas
stage geom_decompose_184_xla 2400 python scripts/bench_train_decompose.py \
  --dataset geom --pad 184 --batch_size 32 --bwd_mode xla --dtype float32
stage geom_decompose_64 1800 python scripts/bench_train_decompose.py \
  --dataset geom --pad 64 --batch_size 32 --bwd_mode pallas
stage sp_mosaic2 2400 env GEOLDM_TEST_PLATFORM=tpu \
  python -m pytest tests/test_pallas_tpu.py -q -m "slow or not slow"

echo "=== [$(date +%H:%M:%S)] session3 done ==="

#!/bin/bash
# Continuation of scripts/tpu_session.sh for the stages the first run
# did not reach (the host session driving it was killed mid-run):
# geom_decompose, init_ckpt, serve_load, serve_load_solo.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_r5

stage() {  # stage <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" > "/tmp/tpu_r5/$name.out" 2>&1
  local rc=$?
  echo "    rc=$rc  tail:"; tail -3 "/tmp/tpu_r5/$name.out" | sed 's/^/    /'
  return $rc
}

stage geom_decompose 2400 python scripts/bench_train_decompose.py \
  --dataset geom --bwd_mode pallas

if [ ! -d /tmp/tpu_r5/flagship_ckpt ]; then
  stage init_ckpt 1200 python scripts/init_flagship_checkpoint.py \
    --out /tmp/tpu_r5/flagship_ckpt
fi
stage serve_load 1800 python scripts/serve_load_test.py \
  --model_path /tmp/tpu_r5/flagship_ckpt --clients 6 --seconds 45 --n_steps 50
stage serve_load_solo 1800 python scripts/serve_load_test.py \
  --model_path /tmp/tpu_r5/flagship_ckpt --clients 6 --seconds 45 --n_steps 50 --solo

echo "=== [$(date +%H:%M:%S)] session2 done; outputs in /tmp/tpu_r5/ ==="

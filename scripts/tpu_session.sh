#!/bin/bash
# One-shot TPU session: land the ENTIRE deferred perf surface the moment
# the tunnel is up (round-4 verdict task 1). Serializes every TPU job
# (never two jax processes against the tunnel — compile serialization
# skews timings) and logs each stage to /tmp/tpu_r5/.
#
# Usage:  bash scripts/tpu_session.sh [pid-to-SIGSTOP ...]
#
# Pass the PIDs of CPU-hungry background jobs (parity/bisect runs) —
# they are SIGSTOPped for the duration (a niceless CPU hog starves
# host-side tracing on this 1-core host; measured 80s -> 1372s) and
# SIGCONTed on exit, even on failure.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_r5

PIDS=("$@")
resume() { for p in "${PIDS[@]:-}"; do [ -n "$p" ] && kill -CONT "$p" 2>/dev/null; done; }
trap resume EXIT
for p in "${PIDS[@]:-}"; do [ -n "$p" ] && kill -STOP "$p" 2>/dev/null; done

stage() {  # stage <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" > "/tmp/tpu_r5/$name.out" 2>&1
  local rc=$?
  echo "    rc=$rc  tail:"; tail -3 "/tmp/tpu_r5/$name.out" | sed 's/^/    /'
  return $rc
}

# 0. Quick probe so we fail fast if the tunnel dropped again.
stage probe 600 python /tmp/probe_tpu.py || { echo "tunnel down; abort"; exit 3; }

# 1. Full bench surface (qm9 + geom + fewstep + bucketed train, both
#    recipes). The driver runs this again at round end; this run fills
#    the compile cache AND gives us numbers for STATUS now.
stage bench 3000 python bench.py

# 2. Mosaic lowering of the SP Pallas stage kernels (verdict task 4).
stage sp_mosaic 2400 env GEOLDM_TEST_PLATFORM=tpu \
  python -m pytest tests/test_pallas_tpu.py -q -m "slow or not slow"

# 3. GEOM backward decomposition (verdict task 6).
stage geom_decompose 2400 python scripts/bench_train_decompose.py \
  --dataset geom --bwd_mode pallas

# 4. TPU serving load test (verdict weak item 5). Needs the flagship
#    checkpoint materialized once.
if [ ! -d /tmp/tpu_r5/flagship_ckpt ]; then
  stage init_ckpt 1200 python scripts/init_flagship_checkpoint.py \
    --out /tmp/tpu_r5/flagship_ckpt
fi
stage serve_load 1800 python scripts/serve_load_test.py \
  --model_path /tmp/tpu_r5/flagship_ckpt --clients 6 --seconds 45 --n_steps 50
stage serve_load_solo 1800 python scripts/serve_load_test.py \
  --model_path /tmp/tpu_r5/flagship_ckpt --clients 6 --seconds 45 --n_steps 50 --solo

echo "=== [$(date +%H:%M:%S)] all stages attempted; outputs in /tmp/tpu_r5/ ==="

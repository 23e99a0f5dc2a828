#!/bin/bash
# Fifth (combined) TPU batch this round — everything still outstanding
# after the 04:31 timing-hardening commit, serialized on the single
# tunnel chip:
#   1. bench       — full surface with the fetch-hardened train timing
#                    (honest bucketed per-bucket ms; warms the driver's
#                    round-end compile cache)
#   2. sp_mosaic   — SP Pallas stage kernels lowered by real Mosaic at
#                    the production slab shapes
#   3. geom decompositions — recipe shape (pad 184, bs 32) pallas vs
#                    XLA f32, plus dominant bucket pad 64 (verdict task 6)
#   4. serving     — flagship checkpoint materialize + coalesced vs solo
#                    load test on the real chip (verdict weak item 5)
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
stage geom_decompose_184 2400 python scripts/bench_train_decompose.py \
  --dataset geom --pad 184 --batch_size 32 --bwd_mode pallas
stage geom_decompose_184_xla 2400 python scripts/bench_train_decompose.py \
  --dataset geom --pad 184 --batch_size 32 --bwd_mode xla --dtype float32
stage geom_decompose_64 1800 python scripts/bench_train_decompose.py \
  --dataset geom --pad 64 --batch_size 32 --bwd_mode pallas
if [ ! -d /tmp/tpu_r5/flagship_ckpt ]; then
  stage init_ckpt 1200 python scripts/init_flagship_checkpoint.py \
    --out /tmp/tpu_r5/flagship_ckpt
fi
stage serve_load 1800 python scripts/serve_load_test.py \
  --model_path /tmp/tpu_r5/flagship_ckpt --clients 6 --seconds 45 --n_steps 50
stage serve_load_solo 1800 python scripts/serve_load_test.py \
  --model_path /tmp/tpu_r5/flagship_ckpt --clients 6 --seconds 45 --n_steps 50 --solo
echo "=== [$(date +%H:%M:%S)] session5 done; outputs in /tmp/tpu_r5/ ==="

"""Benchmark: QM9 GeoLDM sampling throughput at 1000 diffusion steps.

North-star metric (BASELINE.md): generate 10k QM9 molecules through the
full latent-diffusion reverse process (T=1000, nf=256, 9-layer EGNN denoiser,
latent_nf=1) in under 10 minutes — i.e. >= 16.67 molecules/sec sustained.

The measured protocol mirrors eval_analyze: molecule sizes are drawn from
the QM9 size histogram and generation is SIZE-BUCKETED (pads 16/24/32), so
small molecules don't pay the max-size O(N^2) edge cost. Weights are random
— throughput does not depend on training. Prints one JSON line:

  {"metric": "qm9_sample_mol_per_sec", "value": ..., "unit": "mol/s",
   "vs_baseline": value / 16.67}

Env knobs:
  GEOLDM_BENCH_TOTAL  molecules to time (default 1000)
  GEOLDM_BENCH_BATCH  per-bucket chunk size (default 250)
  GEOLDM_BENCH_STEPS  diffusion steps (default 1000; value is normalized
                      back to the T=1000 protocol)
  GEOLDM_BENCH_DTYPE  float32|bfloat16|pallas|bfloat16_pallas|
                      bfloat16_full|bfloat16_mixed (default bfloat16_mixed:
                      bf16 EGNN for 90% of steps, f32 for the final 10% +
                      decode; schedule/CoM algebra always f32)
  GEOLDM_BENCH_FLAT   set to 1 to disable bucketing (pad everything to 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

TARGET_MOL_PER_SEC = 10_000 / 600.0  # 10k molecules / 10 minutes


def main() -> None:
    import jax

    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.models import factory
    from geoldm_tpu.models.distributions import DistributionNodes
    from geoldm_tpu.train import sampling as sampling_mod

    total = int(os.environ.get("GEOLDM_BENCH_TOTAL", "1000"))
    batch = int(os.environ.get("GEOLDM_BENCH_BATCH", "250"))
    steps = int(os.environ.get("GEOLDM_BENCH_STEPS", "1000"))
    dtype_name = os.environ.get("GEOLDM_BENCH_DTYPE", "bfloat16_mixed")
    flat = os.environ.get("GEOLDM_BENCH_FLAT", "0") == "1"

    info = get_dataset_info("qm9")
    cfg = factory.make_latent_diffusion_config(
        info, nf=256, n_layers=9, latent_nf=1, diffusion_steps=steps,
    )
    params = factory.init_params(jax.random.key(0), cfg)
    nodes_dist = DistributionNodes(info.n_nodes)
    rng = np.random.default_rng(0)

    buckets = (32,) if flat else (16, 24, 32)

    def generate(key, nodesxsample):
        return sampling_mod.sample_bucketed(
            cfg, params, key, info, nodesxsample, batch_size=batch,
            buckets=buckets, compute_dtype=dtype_name, rng=rng,
        )

    # Warmup with the exact workload (compiles every (chunk, bucket) shape
    # the timed run will use); the timed run then reuses the executables.
    nodesxsample = nodes_dist.sample(total, rng)
    t0 = time.perf_counter()
    generate(jax.random.key(1), nodesxsample)
    compile_time = time.perf_counter() - t0
    print(f"# compile+warmup: {compile_time:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    out = generate(jax.random.key(2), nodesxsample)
    jax.block_until_ready(out[0])
    elapsed = time.perf_counter() - t0

    mol_per_sec = total / elapsed
    # Normalize to the canonical T=1000 protocol if steps were reduced.
    mol_per_sec_1000 = mol_per_sec * (steps / 1000.0)
    print(
        f"# sampled {total} molecules (T={steps}, dtype={dtype_name}, "
        f"buckets={buckets}) in {elapsed:.1f}s on {jax.devices()[0].device_kind}",
        file=sys.stderr,
    )
    result = {
        "metric": "qm9_sample_mol_per_sec",
        "value": round(mol_per_sec_1000, 3),
        "unit": "mol/s",
        "vs_baseline": round(mol_per_sec_1000 / TARGET_MOL_PER_SEC, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

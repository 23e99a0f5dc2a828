"""Benchmark: QM9 GeoLDM sampling throughput at 1000 diffusion steps.

North-star metric (BASELINE.md): generate 10k QM9 molecules through the
full latent-diffusion reverse process (T=1000, nf=256, 9-layer EGNN denoiser,
latent_nf=1) in under 10 minutes — i.e. >= 16.67 molecules/sec sustained.
This harness times the jitted `lax.scan` sampler on real hardware and prints
one JSON line:

  {"metric": "qm9_sample_mol_per_sec", "value": ..., "unit": "mol/s",
   "vs_baseline": value / 16.67}

Weights are randomly initialized — throughput does not depend on training.
Env knobs: GEOLDM_BENCH_BATCH (default 250), GEOLDM_BENCH_REPS (default 2),
GEOLDM_BENCH_STEPS (default 1000), GEOLDM_BENCH_DTYPE
(float32|bfloat16|pallas|bfloat16_pallas), GEOLDM_BENCH_PAD (default 32).
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
    import jax.numpy as jnp

    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.data.synthetic import sampling_masks
    from geoldm_tpu.diffusion import latent as ldm
    from geoldm_tpu.models import factory

    from geoldm_tpu.nn.core import resolve_compute

    batch = int(os.environ.get("GEOLDM_BENCH_BATCH", "250"))
    reps = int(os.environ.get("GEOLDM_BENCH_REPS", "2"))
    steps = int(os.environ.get("GEOLDM_BENCH_STEPS", "1000"))
    dtype_name = os.environ.get("GEOLDM_BENCH_DTYPE", "float32")
    # Pad to 32 nodes (MXU/VPU sublane alignment) — masks make it exact.
    pad = int(os.environ.get("GEOLDM_BENCH_PAD", "32"))
    compute_dtype = resolve_compute(dtype_name)

    info = get_dataset_info("qm9")
    cfg = factory.make_latent_diffusion_config(
        info, nf=256, n_layers=9, latent_nf=1, diffusion_steps=steps,
    )
    params = factory.init_params(jax.random.key(0), cfg)

    node_mask_np, edge_mask_np, _ = sampling_masks(
        info, batch, pad_nodes=pad, rng=np.random.default_rng(0)
    )
    node_mask = jnp.asarray(node_mask_np)
    edge_mask = jnp.asarray(edge_mask_np)

    @jax.jit
    def sample(params, key):
        return ldm.ldm_sample(
            params, cfg.diffusion, cfg.dynamics, cfg.vae, key, node_mask,
            edge_mask, compute_dtype=compute_dtype,
        )

    # Warmup / compile.
    t0 = time.perf_counter()
    out = sample(params, jax.random.key(1))
    jax.block_until_ready(out)
    compile_time = time.perf_counter() - t0
    print(f"# compile+first-run: {compile_time:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(reps):
        out = sample(params, jax.random.key(2 + i))
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0

    mols = reps * batch
    mol_per_sec = mols / elapsed
    # Normalize to the canonical T=1000 protocol if steps were reduced.
    mol_per_sec_1000 = mol_per_sec * (steps / 1000.0)
    print(
        f"# sampled {mols} molecules (T={steps}) in {elapsed:.1f}s on "
        f"{jax.devices()[0].device_kind}",
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

"""Training-step throughput benchmark (flagship QM9 latent-diffusion).

Times the fused jitted train step (loss + grads + adaptive clip + AMSGrad +
EMA) on synthetic QM9-shaped batches. Prints one JSON line:

  {"metric": "qm9_train_steps_per_sec", "value": ..., "unit": "steps/s",
   "molecules_per_sec": ...}

  python -m geoldm_tpu.cli.bench_train --batch_size 64 --reps 20
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--pad_nodes", type=int, default=32)
    p.add_argument("--nf", type=int, default=256)
    p.add_argument("--n_layers", type=int, default=9)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--compute_dtype", type=str, default="float32")
    p.add_argument("--remat", type=eval, default=False)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from geoldm_tpu.utils.jaxcache import setup_compilation_cache

    setup_compilation_cache()

    from geoldm_tpu.config import TrainConfig
    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.data.synthetic import synthetic_batch
    from geoldm_tpu.models import factory
    from geoldm_tpu.models.distributions import DistributionNodes
    from geoldm_tpu.nn.core import resolve_compute
    from geoldm_tpu.train.train_step import create_train_state, make_train_step

    info = get_dataset_info("qm9")
    cfg = factory.make_latent_diffusion_config(
        info, nf=args.nf, n_layers=args.n_layers, latent_nf=1,
        diffusion_steps=1000, trainable_ae=True, remat=args.remat,
    )
    tc = TrainConfig(lr=1e-4, ema_decay=0.9999)
    state, tx = create_train_state(jax.random.key(0), cfg, tc)
    from geoldm_tpu.utils.tpuflags import train_step_compiler_options

    step = jax.jit(
        make_train_step(cfg, tc, tx, resolve_compute(args.compute_dtype)),
        compiler_options=train_step_compiler_options(args.compute_dtype),
    )

    batch_np = synthetic_batch(
        info, args.batch_size, pad_nodes=args.pad_nodes, rng=np.random.default_rng(0)
    )
    nodes_dist = DistributionNodes(info.n_nodes)
    batch_np["log_pN"] = nodes_dist.log_prob(batch_np.pop("n_atoms")).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    t0 = time.perf_counter()
    state, metrics = step(state, batch, jax.random.key(1))
    jax.block_until_ready(metrics["loss"])
    print(f"# compile+first step: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # Per-step sync: in tunneled environments async dispatch makes chained
    # timing unreliable (measured 2-700ms/step depending on queue depth);
    # fetching the loss each step gives a reproducible upper bound.
    t0 = time.perf_counter()
    for i in range(args.reps):
        state, metrics = step(state, batch, jax.random.key(2 + i))
        float(metrics["loss"])
    elapsed = time.perf_counter() - t0

    steps_per_sec = args.reps / elapsed
    print(
        f"# {args.reps} steps in {elapsed:.2f}s on {jax.devices()[0].device_kind} "
        f"(batch {args.batch_size}, pad {args.pad_nodes}, "
        f"dtype {args.compute_dtype}, remat {args.remat})",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "qm9_train_steps_per_sec",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "molecules_per_sec": round(steps_per_sec * args.batch_size, 1),
    }))


if __name__ == "__main__":
    main()

"""Decompose the flagship train step's device time: loss forward only,
value+grad, and the full optimizer step — each K-scanned in one dispatch.
``--dataset geom`` benches the GEOM recipe (nf=256, 4 layers,
latent_nf=2, row-tiled kernels at --pad >= 48 — same model_kw as
bench.py's geom branch) instead;
``--bwd_mode xla`` times the rematerialized-XLA backward against the
fused tiled one at the same shape (the round-3 verdict's GEOM-backward
attribution ask).

Usage: python scripts/bench_train_decompose.py [--dtype pallas]
       [--dataset geom --pad 64 --batch_size 64] [--bwd_mode xla]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", type=str, default="pallas")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--pad", type=int, default=32)
    p.add_argument("--dataset", type=str, default="qm9",
                   choices=["qm9", "geom"])
    p.add_argument("--bwd_mode", type=str, default=None,
                   choices=["pallas", "xla"],
                   help="tiled-kernel backward path (GEOLDM_TILED_BWD)")
    args = p.parse_args()
    if args.bwd_mode:
        os.environ["GEOLDM_TILED_BWD"] = args.bwd_mode
        os.environ["GEOLDM_PALLAS_BWD"] = args.bwd_mode

    import jax
    import jax.numpy as jnp

    from geoldm_tpu.utils.jaxcache import setup_compilation_cache

    setup_compilation_cache()

    from geoldm_tpu.config import TrainConfig
    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.data.synthetic import synthetic_batch
    from geoldm_tpu.models import factory
    from geoldm_tpu.models.distributions import DistributionNodes
    from geoldm_tpu.nn.core import resolve_compute
    from geoldm_tpu.train import train_step as ts
    from geoldm_tpu.utils.tpuflags import train_step_compiler_options

    info = get_dataset_info(args.dataset)
    if args.dataset == "geom":
        cfg = factory.make_latent_diffusion_config(
            info, nf=256, n_layers=4, latent_nf=2, diffusion_steps=1000,
            trainable_ae=True, remat="pallas" not in args.dtype,
        )
    else:
        cfg = factory.make_latent_diffusion_config(
            info, nf=256, n_layers=9, latent_nf=1, diffusion_steps=1000,
            # The XLA f32 backward OOMs 16GB HBM without remat; the fused
            # pallas backward needs neither.
            trainable_ae=True, remat="pallas" not in args.dtype,
        )
    tc = TrainConfig(compute_dtype=args.dtype)
    spec = resolve_compute(None if args.dtype == "float32" else args.dtype)
    state, tx = ts.create_train_state(jax.random.key(0), cfg, tc)

    batch_np = synthetic_batch(info, args.batch_size, pad_nodes=args.pad,
                               rng=np.random.default_rng(0))
    batch_np["log_pN"] = DistributionNodes(info.n_nodes).log_prob(
        batch_np.pop("n_atoms")
    ).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    nll_fn = factory.model_nll_fn(cfg, training=True, compute_dtype=spec)
    opts = train_step_compiler_options(args.dtype)

    def loss_fn(params, key):
        nll = nll_fn(params, key, batch["x"], batch["h_cat"], batch["h_int"],
                     batch["node_mask"], batch["edge_mask"], None)
        return jnp.mean(nll - batch["log_pN"])

    raw_step = ts.make_train_step(cfg, tc, tx, spec)

    def scanned(body):
        @functools.partial(jax.jit, compiler_options=opts)
        def many(carry, key):
            def f(c, i):
                return body(c, jax.random.fold_in(key, i)), None
            return jax.lax.scan(f, carry, jnp.arange(args.iters))[0]
        return many

    modes = {
        "fwd": (scanned(lambda acc, k: acc + loss_fn(state.params, k)),
                jnp.float32(0)),
        "fwd+bwd": (scanned(lambda acc, k: jax.tree.map(
            lambda a, g: a + g, acc,
            jax.grad(loss_fn)(state.params, k))), state.params),
        "full step": (scanned(lambda st, k: raw_step(st, batch, k)[0]), state),
    }
    for name, (fn, init) in modes.items():
        out = fn(init, jax.random.key(1))
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        out = fn(init, jax.random.key(2))
        jax.block_until_ready(jax.tree.leaves(out)[0])
        ms = 1000 * (time.perf_counter() - t0) / args.iters
        print(f"# {name}: {ms:.2f} ms/iter")


if __name__ == "__main__":
    main()

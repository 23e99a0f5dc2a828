"""Bisect the LDM loss forward: time each sub-component scanned on device.

Usage: python scripts/bench_loss_bisect.py [--dtype pallas]
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
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from geoldm_tpu.utils.jaxcache import setup_compilation_cache

    setup_compilation_cache()

    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.data.synthetic import synthetic_batch
    from geoldm_tpu.diffusion import latent as ldm_mod
    from geoldm_tpu.diffusion import vae as vae_mod
    from geoldm_tpu.diffusion import vdm as vdm_mod
    from geoldm_tpu.models import factory
    from geoldm_tpu.nn import dynamics as dyn
    from geoldm_tpu.nn.core import resolve_compute

    info = get_dataset_info("qm9")
    cfg = factory.make_latent_diffusion_config(
        info, nf=256, n_layers=9, latent_nf=1, diffusion_steps=1000,
        trainable_ae=True, remat=False,
    )
    spec = resolve_compute(None if args.dtype == "float32" else args.dtype)
    params = factory.init_params(jax.random.key(0), cfg)

    b, n = 64, 32
    batch_np = synthetic_batch(info, b, pad_nodes=n, rng=np.random.default_rng(0))
    batch_np.pop("n_atoms")
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    x, h_cat, h_int = batch["x"], batch["h_cat"], batch["h_int"]
    nm, em = batch["node_mask"], batch["edge_mask"]

    def timeit(name, body, carry0):
        @jax.jit
        def many(carry, key):
            def f(c, i):
                return body(c, jax.random.fold_in(key, i)), None
            return jax.lax.scan(f, carry, jnp.arange(args.iters))[0]

        out = many(carry0, jax.random.key(1))
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        out = many(carry0, jax.random.key(2))
        jax.block_until_ready(jax.tree.leaves(out)[0])
        ms = 1000 * (time.perf_counter() - t0) / args.iters
        print(f"# {name}: {ms:.2f} ms/iter")

    # 1. Denoiser dynamics alone (9 blocks + wrapper).
    zdim = 3 + cfg.vae.latent_nf
    z = jax.random.normal(jax.random.key(3), (b, n, zdim)) * nm
    t = jnp.full((b, 1), 0.5)

    def denoiser(acc, key):
        out = dyn.dynamics_apply(params["dynamics"], cfg.dynamics, t, z, nm, em,
                                 None, compute_dtype=spec)
        return acc + jnp.sum(out)

    timeit("denoiser dynamics (9 blocks)", denoiser, jnp.float32(0))

    # 2. VAE encode (1 block + final mlp).
    def encode(acc, key):
        mu_x, sx, mu_h, sh = vae_mod.encode(
            params["vae"], cfg.vae, x, h_cat, h_int, nm, em, compute_dtype=spec
        )
        return acc + jnp.sum(mu_x) + jnp.sum(mu_h)

    timeit("vae encode", encode, jnp.float32(0))

    # 3. VAE decoder (9 blocks).
    zlat = jax.random.normal(jax.random.key(4), (b, n, zdim)) * nm

    def decode(acc, key):
        xr, hc, hi = vae_mod.decode(
            params["vae"], cfg.vae, zlat, nm, em, compute_dtype=spec
        )
        return acc + jnp.sum(xr)

    timeit("vae decoder", decode, jnp.float32(0))

    # 4. Full LDM NLL.
    nll_fn = factory.model_nll_fn(cfg, training=True, compute_dtype=spec)

    def full(acc, key):
        return acc + jnp.sum(nll_fn(params, key, x, h_cat, h_int, nm, em, None))

    timeit("full ldm_nll", full, jnp.float32(0))


if __name__ == "__main__":
    main()

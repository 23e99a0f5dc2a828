"""Decompose the sampling step: denoiser EGNN vs schedule/noise algebra.

The sampler's per-step cost = one denoiser application (the EGNN — all
the FLOPs) + the ancestral-update algebra (sigma/alpha gathers, noise
draw, CoM projection — all VPU/HBM). This script times, with K steps
scanned in ONE dispatch each (dispatch-free device timings):

  A. the full reverse-step scan (vdm internals, exactly what sampling runs)
  B. a denoiser-only scan on identical shapes/dtype

The gap A-B is the algebra overhead the schedule design pays per step;
if it is small, the MFU ceiling lives inside the EGNN itself (memory-bound
elementwise chains between its matmuls), which is a kernel/fusion problem,
not an orchestration one.

Run (TPU): python scripts/bench_sample_decompose.py [--dataset qm9|geom]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", type=str, default="qm9", choices=["qm9", "geom"])
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=250)
    ap.add_argument("--dtype", type=str, default="bfloat16_full")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from geoldm_tpu.utils.jaxcache import setup_compilation_cache

    setup_compilation_cache()

    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.diffusion import schedules, vdm
    from geoldm_tpu.models import factory
    from geoldm_tpu.nn.core import resolve_compute
    from geoldm_tpu.nn.dynamics import dynamics_apply
    from geoldm_tpu.ops.distance import build_edge_mask
    from geoldm_tpu.utils import flops as flops_mod

    if args.dataset == "geom":
        info = get_dataset_info("geom")
        cfg = factory.make_latent_diffusion_config(
            info, nf=256, n_layers=4, latent_nf=2, diffusion_steps=1000,
            include_charges=False,
        )
        pad = 88  # the GEOM histogram's median bucket
        batch = min(args.batch, 100)
    else:
        info = get_dataset_info("qm9")
        cfg = factory.make_latent_diffusion_config(
            info, nf=256, n_layers=9, latent_nf=1, diffusion_steps=1000,
        )
        pad = 32
        batch = args.batch

    params = factory.init_params(jax.random.key(0), cfg)
    spec = resolve_compute(args.dtype)
    b, n = batch, pad
    dyn_cfg = cfg.dynamics
    dcfg = cfg.diffusion
    latent_dim = 3 + dcfg.in_node_nf

    node_mask = jnp.ones((b, n, 1), jnp.float32)
    edge_mask = build_edge_mask(node_mask)
    z0 = jax.random.normal(jax.random.key(1), (b, n, latent_dim))
    gamma_fn = vdm.make_gamma_fn(dcfg, params)
    K = args.steps

    # A: the real reverse-step scan (same code path as vdm_sample).
    def full_scan(z, key):
        def body(z, inp):
            s_idx, k = inp
            s_arr = jnp.full((b, 1), s_idx, jnp.float32) / dcfg.timesteps
            t_arr = jnp.full((b, 1), s_idx + 1, jnp.float32) / dcfg.timesteps
            z = vdm.sample_p_zs_given_zt(
                params, dcfg, dyn_cfg, gamma_fn, k, s_arr, t_arr, z,
                node_mask, edge_mask, None, False, spec,
            )
            return z, None

        idx = jnp.arange(K - 1, -1, -1)
        keys = jax.random.split(key, K)
        z, _ = jax.lax.scan(body, z, (idx, keys))
        return z

    # B: denoiser-only scan on identical shapes (the schedule algebra,
    # noise draw, and CoM projection removed; the carried z keeps the
    # dataflow honest).
    def denoiser_scan(z, key):
        def body(z, s_idx):
            t_arr = jnp.full((b, 1), s_idx, jnp.float32) / dcfg.timesteps
            eps = dynamics_apply(
                params["dynamics"], dyn_cfg, t_arr, z, node_mask, edge_mask,
                None, spec,
            )
            return z - 1e-6 * eps, None

        z, _ = jax.lax.scan(body, z, jnp.arange(K, dtype=jnp.float32))
        return z

    def timed(fn, *a):
        g = jax.jit(fn)
        out = g(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = g(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / K * 1000.0  # ms/step

    full_ms = timed(full_scan, z0, jax.random.key(2))
    den_ms = timed(denoiser_scan, z0, jax.random.key(3))
    overhead = full_ms - den_ms
    den_flops = b * flops_mod.egnn_flops(dyn_cfg.egnn, n)
    peak_mfu = flops_mod.mfu(den_flops * K, den_ms * K / 1000.0,
                             jax.devices()[0].device_kind)
    print(
        f"[{args.dataset}] bs={b} pad={n} dtype={args.dtype}: "
        f"full step {full_ms:.3f} ms, denoiser-only {den_ms:.3f} ms, "
        f"algebra overhead {overhead:.3f} ms ({overhead / full_ms * 100:.1f}%)"
        + (f", denoiser-only MFU {peak_mfu:.3f}" if peak_mfu else "")
    )


if __name__ == "__main__":
    main()

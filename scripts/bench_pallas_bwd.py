"""Micro-bench: EGNN train-direction (value+grad) — XLA vs fused Pallas.

Compares, at flagship QM9 denoiser shapes (bs 64, pad 32, H 256, 9 layers),
the three gradient paths:
  xla          egnn_apply, remat on (the training default)
  pallas+xla   fused Pallas forward, backward = XLA block rematerialized
  pallas       fused Pallas forward + fused Pallas backward (in-kernel vjp)

Each mode times K value_and_grad evaluations scanned inside ONE jitted
program (no dispatch overhead). Prints one line per mode and a JSON tail.

Usage: python scripts/bench_pallas_bwd.py [--b 64] [--n 32] [--layers 9]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=64)
    p.add_argument("--n", type=int, default=32)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=9)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--fwd_only", action="store_true")
    p.add_argument("--interpret", action="store_true",
                   help="Pallas interpret mode (CPU smoke test)")
    p.add_argument("--group", type=int, default=None,
                   help="Force the kernel group size (fwd AND bwd)")
    p.add_argument("--vmem_kib", type=int, default=None,
                   help="Scoped-VMEM limit override (default: tpuflags default)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from geoldm_tpu.utils.jaxcache import setup_compilation_cache

    setup_compilation_cache()

    from geoldm_tpu.config import EGNNConfig
    from geoldm_tpu.nn.egnn import egnn_apply, egnn_init
    from geoldm_tpu.ops.distance import build_edge_mask
    from geoldm_tpu.ops.pallas_egnn import egnn_apply_pallas
    from geoldm_tpu.utils import flops as flops_mod

    b, n = args.b, args.n
    cfg = EGNNConfig(
        in_node_nf=2, out_node_nf=2, hidden_nf=args.hidden, n_layers=args.layers,
        inv_sublayers=1, attention=True, tanh=True, normalization_factor=1.0,
    )
    from geoldm_tpu.config import replace as cfg_replace
    cfg_remat = cfg_replace(cfg, remat=True)
    params = egnn_init(jax.random.key(0), cfg)

    rng = np.random.default_rng(0)
    sizes = rng.integers(n // 2, n + 1, size=b)
    node_mask = (np.arange(n)[None] < sizes[:, None]).astype(np.float32)[..., None]
    h = rng.standard_normal((b, n, 2)).astype(np.float32) * node_mask
    x = rng.standard_normal((b, n, 3)).astype(np.float32) * node_mask
    h, x, node_mask = jnp.asarray(h), jnp.asarray(x), jnp.asarray(node_mask)
    edge_mask = build_edge_mask(node_mask)

    def loss_of(apply_fn):
        def loss(p):
            h1, x1 = apply_fn(p)
            return jnp.sum(h1 * h1) + jnp.sum(x1 * x1)
        return loss

    modes = {
        "xla": loss_of(lambda p: egnn_apply(p, cfg_remat, h, x, node_mask, edge_mask)),
        "pallas+xla_bwd": loss_of(
            lambda p: egnn_apply_pallas(p, cfg, h, x, node_mask,
                                        interpret=args.interpret, bwd_mode="xla",
                                        group=args.group)
        ),
        "pallas": loss_of(
            lambda p: egnn_apply_pallas(p, cfg, h, x, node_mask,
                                        interpret=args.interpret, bwd_mode="pallas",
                                        group=args.group)
        ),
    }

    device_kind = jax.devices()[0].device_kind
    fwd_flops = b * flops_mod.egnn_flops(cfg, n)
    per_iter_flops = fwd_flops if args.fwd_only else 3 * fwd_flops
    results = {}
    for name, loss in modes.items():
        if args.fwd_only:
            step = loss
        else:
            step = jax.grad(loss)

        from geoldm_tpu.utils.tpuflags import grad_compiler_options

        # The fused backward needs the raised scoped-VMEM limit; applied
        # per-compile (uniformly across modes so timings are comparable).
        opts = None
        if not args.interpret and not args.fwd_only:
            opts = grad_compiler_options(
                *([args.vmem_kib] if args.vmem_kib else [])
            )

        @functools.partial(jax.jit, compiler_options=opts)
        def many(p):
            def body(acc, _):
                out = step(p)
                s = out if args.fwd_only else sum(
                    jnp.sum(l) for l in jax.tree.leaves(out)
                )
                return acc + s, None
            return jax.lax.scan(body, jnp.float32(0), jnp.arange(args.iters))[0]

        t0 = time.perf_counter()
        many(params).block_until_ready()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        many(params).block_until_ready()
        elapsed = time.perf_counter() - t0
        ms = 1000 * elapsed / args.iters
        m = flops_mod.mfu(per_iter_flops * args.iters, elapsed, device_kind)
        results[name] = {"ms": round(ms, 3), "mfu": None if m is None else round(m, 4)}
        print(f"# {name}: {ms:.2f} ms/iter (compile {compile_s:.1f}s, "
              f"mfu={results[name]['mfu']})", file=sys.stderr)

    print(json.dumps({
        "bench": "egnn_grad" if not args.fwd_only else "egnn_fwd",
        "b": b, "n": n, "hidden": args.hidden, "layers": args.layers,
        "device": device_kind, **results,
    }))


if __name__ == "__main__":
    main()

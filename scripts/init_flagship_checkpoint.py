"""Materialize a flagship-shape checkpoint (random init) for serving and
throughput work.

Serving throughput/latency do not depend on the weight values (the
sampler runs the same FLOPs either way), so a random-init checkpoint of
the real flagship recipe (QM9: nf=256, 9 layers, latent_nf=1 — reference
README.md:24) is the honest load-test subject when no trained flagship
checkpoint exists on the host.

Run: JAX_PLATFORMS=cpu python scripts/init_flagship_checkpoint.py \
        --out /tmp/serve_flagship [--dataset qm9] [--nf 256] [--n_layers 9]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> str:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--dataset", type=str, default="qm9",
                    choices=["qm9", "geom"])
    ap.add_argument("--nf", type=int, default=256)
    ap.add_argument("--n_layers", type=int, default=None,
                    help="default: 9 for qm9, 4 for geom")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.models import factory
    from geoldm_tpu.utils import checkpoint as ckpt

    info = get_dataset_info(args.dataset)
    layers = args.n_layers or (4 if args.dataset == "geom" else 9)
    latent_nf = 2 if args.dataset == "geom" else 1
    cfg = factory.make_latent_diffusion_config(
        info, nf=args.nf, n_layers=layers, latent_nf=latent_nf,
        diffusion_steps=1000,
    )
    params = factory.init_params(jax.random.key(args.seed), cfg)
    state = {"params": params, "ema_params": params}
    path = ckpt.save_checkpoint(args.out, state, cfg=cfg, name="best")
    print(f"wrote flagship-init checkpoint: {path}")
    return path


if __name__ == "__main__":
    main()

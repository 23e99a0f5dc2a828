"""Classifier-free-guidance probe: direct steering measurement.

Loads a conditional checkpoint trained by scripts/conditional_demo.py
(--context_dropout > 0), samples molecules across guidance scales, and
reports how the realized property (radius of gyration) tracks the
requested target — median/p90/mean |error|, correlation, and blow-up
counts, with and without the ``clip_z`` dynamic-range guard.

This measures the guidance mechanism itself, independent of the
classifier-MAE protocol (whose mean is outlier-dominated).

  JAX_PLATFORMS=cpu python scripts/cfg_probe.py \\
      --workdir /tmp/geoldm_cfg_demo2 [--scales 1 1.5 2 3] [--clip_z 15]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=str, default="/tmp/geoldm_cfg_demo")
    ap.add_argument("--model", type=str, default=None,
                    help="checkpoint dir (default <workdir>/out/cond_gen)")
    ap.add_argument("--scales", type=float, nargs="*", default=[1.0, 1.5, 2.0, 3.0])
    ap.add_argument("--clip_z", type=float, default=0.0)
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.models import factory
    from geoldm_tpu.train import sampling as S
    from geoldm_tpu.train.conditioning import load_conditional_protocol
    from geoldm_tpu.utils import checkpoint as ckpt

    info = get_dataset_info("qm9")
    _, norms, prop_dist, nodes_dist, pad = load_conditional_protocol(
        args.workdir, ["alpha"])
    mean, mad = norms["alpha"]["mean"], norms["alpha"]["mad"]

    path = args.model or os.path.join(args.workdir, "out", "cond_gen")
    cfg = ckpt.load_config(path)
    template = {"params": factory.init_params(jax.random.key(0), cfg)}
    template["ema_params"] = template["params"]
    st = ckpt.load_checkpoint(path, template=template, name="best")

    rng = np.random.default_rng(args.seed)
    sizes = nodes_dist.sample(args.n, rng)
    ctx = prop_dist.sample_batch(sizes, rng)
    tgt = ctx[:, 0] * mad + mean

    rows = []
    for w in args.scales:
        _, _, x, nm = S.sample(
            cfg, st["ema_params"], jax.random.key(args.seed + 5), info, sizes,
            context=ctx, pad_nodes=pad, rng=np.random.default_rng(args.seed + 1),
            guidance_scale=w, clip_z=args.clip_z,
        )
        n = nm[..., 0].sum(1)
        com = (x * nm).sum(1) / n[:, None]
        rg = np.sqrt((((x - com[:, None]) * nm) ** 2).sum((1, 2)) / n)
        err = np.abs(rg - tgt)
        row = dict(w=w, med=float(np.median(err)),
                   p90=float(np.percentile(err, 90)), mean=float(err.mean()),
                   corr=float(np.corrcoef(tgt, np.clip(rg, 0, 10))[0, 1]),
                   blowups=int((rg > 10).sum()))
        rows.append(row)
        print(f"w={w:g} clip_z={args.clip_z:g}: med|err| {row['med']:.3f}  "
              f"p90 {row['p90']:8.3f}  mean {row['mean']:9.3f}  "
              f"corr {row['corr']:.3f}  blowups {row['blowups']}")
    return rows


if __name__ == "__main__":
    main()

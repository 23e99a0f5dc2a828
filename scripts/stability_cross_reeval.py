"""Sampler-crossed re-eval of SAVED parity checkpoints (no retraining).

Loads the per-seed checkpoint pairs written by
`parity_train_ab_ldm.py --save_ckpt_dir` and evaluates stability with the
SAMPLER HELD COMMON: both sides' trained weights are pushed through the
reference torch sampler (jax weights via the exporter's strict-load
state-dict map) and through the jax sampler. Within a seed the two
weights cells share the sampler exactly, so this isolates "do the
trained weights really differ?" from "do the samplers differ on these
weights?" for the post-aliasing-fix free-run A/B.

Run: JAX_PLATFORMS=cpu python scripts/stability_cross_reeval.py \
       --ckpt_dir /tmp/v3_ckpts --seeds 10 11 12 --step 600 [--n_eval 510]
"""

import argparse
import os
import pickle
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import torch  # noqa: E402

from parity_train_ab_ldm import build_pair, wilson_ci  # noqa: E402
from stability_cross_ab import (  # noqa: E402
    jax_weights_to_torch, sample_jax, sample_torch,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", type=str, required=True)
    ap.add_argument("--seeds", type=int, nargs="+", required=True)
    ap.add_argument("--step", type=int, default=600)
    ap.add_argument("--n_eval", type=int, default=510)
    args = ap.parse_args(argv)
    torch.set_num_threads(max(1, len(os.sched_getaffinity(0))))

    rows = []
    for seed in args.seeds:
        ref, cfg, _ = build_pair(seed)
        sd = torch.load(
            os.path.join(args.ckpt_dir, f"torch_s{seed}_step{args.step}.pt"),
            weights_only=True,
        )
        ref.load_state_dict(sd, strict=True)
        with open(
            os.path.join(args.ckpt_dir, f"jax_s{seed}_step{args.step}.pkl"), "rb"
        ) as fh:
            params_j = pickle.load(fh)
        ref_from_jax = jax_weights_to_torch(params_j, cfg, seed)

        cells = {
            "WT_torchsampler": sample_torch(ref, args.n_eval, seed),
            "WJ_torchsampler": sample_torch(ref_from_jax, args.n_eval, seed + 500),
            "WJ_jaxsampler": sample_jax(params_j, cfg, args.n_eval, seed),
        }
        for name, c in cells.items():
            a = wilson_ci(c[0], c[1])
            m = wilson_ci(c[2], c[3])
            print(
                f"seed {seed} {name}: atm {a[0]:.3f} [{a[1]:.3f},{a[2]:.3f}] "
                f"mol {m[0]:.3f} [{m[1]:.3f},{m[2]:.3f}]",
                flush=True,
            )
            rows.append((seed, name, c))

    # Common-sampler weights contrast, pooled per-seed then averaged:
    # (jax-trained weights) - (torch-trained weights), both through the
    # reference torch sampler.
    diffs_a, diffs_m = [], []
    for seed in args.seeds:
        c = {name: cnt for s, name, cnt in rows if s == seed}
        wt, wj = c["WT_torchsampler"], c["WJ_torchsampler"]
        diffs_a.append(wj[0] / wj[1] - wt[0] / wt[1])
        diffs_m.append(wj[2] / wj[3] - wt[2] / wt[3])
    print(
        f"common-torch-sampler weights effect (mean over {len(args.seeds)} "
        f"seeds): atom {np.mean(diffs_a):+.3f} (per-seed "
        f"{[f'{d:+.3f}' for d in diffs_a]}), molecule {np.mean(diffs_m):+.3f} "
        f"(per-seed {[f'{d:+.3f}' for d in diffs_m]})",
        flush=True,
    )
    # Sampler contrast on the SAME jax weights.
    diffs_sa, diffs_sm = [], []
    for seed in args.seeds:
        c = {name: cnt for s, name, cnt in rows if s == seed}
        wjt, wjj = c["WJ_torchsampler"], c["WJ_jaxsampler"]
        diffs_sa.append(wjj[0] / wjj[1] - wjt[0] / wjt[1])
        diffs_sm.append(wjj[2] / wjj[3] - wjt[2] / wjt[3])
    print(
        f"sampler effect on jax weights (jax - torch sampler, mean): atom "
        f"{np.mean(diffs_sa):+.3f} (per-seed {[f'{d:+.3f}' for d in diffs_sa]}), "
        f"molecule {np.mean(diffs_sm):+.3f}",
        flush=True,
    )


if __name__ == "__main__":
    main()

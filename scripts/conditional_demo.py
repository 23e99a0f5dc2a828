"""Conditional-generation LEARNING demo: conditioned MAE beats the baseline.

The conditional stack (context channels in the dynamics/VAE, property
distributions, classifier, eval protocol) is parity- and smoke-tested
elsewhere; this script demonstrates it *works*: a conditional GeoLDM
trained on a geometry-derived property steers generation so that the
classifier-MAE protocol (reference eval_conditional_qm9.py:121-173)
scores the conditioned generator clearly better than the label-shuffled
naive baseline.

Protocol (all through the real CLIs, second-half split convention):
1. Fabricate a QM9-format dataset whose ``alpha`` column is the molecule's
   radius of gyration (computable from coordinates, so conditioning is
   learnable and checkable); molecule scale varies 3x across the set.
2. Train a conditional latent-diffusion generator on qm9_second_half
   (cli.main_qm9 --conditioning alpha).
3. Train the EGNN property classifier on qm9_first_half
   (cli.main_qm9_prop --property alpha).
4. Score with cli.eval_conditional_qm9: task=edm (conditioned generation),
   task=naive (shuffled labels — what ignoring the condition looks like),
   task=qm9 (classifier on real data — the floor).

Writes docs/CONDITIONAL_DEMO.md. Run (CPU, ~10-20 min):
  JAX_PLATFORMS=cpu python scripts/conditional_demo.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def fabricate_dataset(datadir: str, n_train=1600, n_eval=256, n_max=9,
                      seed=0) -> None:
    """QM9-format npz splits where alpha = radius of gyration (Angstrom).

    Molecule scale varies ~3x so the property carries real signal; atom
    types are random (the property is purely geometric by construction).
    """
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(datadir, "qm9"), exist_ok=True)
    for split, m in [("train", n_train), ("valid", n_eval), ("test", n_eval)]:
        num_atoms = rng.integers(4, n_max + 1, size=m)
        charges = np.zeros((m, n_max), dtype=np.int64)
        positions = np.zeros((m, n_max, 3), dtype=np.float32)
        alpha = np.zeros(m, dtype=np.float64)
        for i, n in enumerate(num_atoms):
            charges[i, :n] = rng.choice([1, 6, 7, 8, 9], size=n)
            scale = rng.uniform(0.6, 1.8)
            pos = rng.standard_normal((n, 3)).astype(np.float32) * scale
            pos -= pos.mean(0)
            positions[i, :n] = pos
            alpha[i] = float(np.sqrt((pos ** 2).sum(1).mean()))
        d = {
            "num_atoms": num_atoms,
            "charges": charges,
            "positions": positions,
            "alpha": alpha,
            "mu": np.abs(rng.standard_normal(m)),
            "U0": rng.standard_normal(m),
            "U0_thermo": rng.standard_normal(m),
        }
        np.savez_compressed(os.path.join(datadir, "qm9", f"{split}.npz"), **d)


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=str, default="/tmp/geoldm_cond_demo")
    ap.add_argument("--gen_epochs", type=int, default=40)
    ap.add_argument("--cls_epochs", type=int, default=25)
    ap.add_argument("--nf", type=int, default=32)
    ap.add_argument("--n_layers", type=int, default=2)
    ap.add_argument("--diffusion_steps", type=int, default=100)
    ap.add_argument("--eval_iterations", type=int, default=4)
    ap.add_argument("--eval_batch", type=int, default=100)
    ap.add_argument("--context_dropout", type=float, default=0.0,
                    help="train the generator with classifier-free-guidance "
                         "context dropout (enables --cfg_scales)")
    ap.add_argument("--cfg_scales", type=float, nargs="*", default=[],
                    help="extra guidance scales to score with task=edm "
                         "(e.g. 2 4); meaningful with --context_dropout > 0")
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "docs", "CONDITIONAL_DEMO.md"))
    args = ap.parse_args(argv)

    from geoldm_tpu.cli import eval_conditional_qm9, main_qm9, main_qm9_prop

    wd = args.workdir
    fabricate_dataset(wd)
    t0 = time.time()

    # 2. conditional generator (second half; reference conditioning recipe).
    gen_dir = os.path.join(wd, "out")
    main_qm9.main([
        "--exp_name", "cond_gen",
        "--datadir", wd,
        "--dataset", "qm9_second_half",
        "--outdir", gen_dir,
        "--train_diffusion", "--trainable_ae",
        "--conditioning", "alpha",
        "--n_epochs", str(args.gen_epochs),
        "--test_epochs", str(max(1, args.gen_epochs - 1)),
        "--batch_size", "32",
        "--nf", str(args.nf),
        "--n_layers", str(args.n_layers),
        "--diffusion_steps", str(args.diffusion_steps),
        "--n_stability_samples", "8",
        "--ema_decay", "0.99",
        "--context_dropout", str(args.context_dropout),
        "--no_wandb",
    ])
    t_gen = time.time() - t0

    # 3. property classifier (first half).
    t0 = time.time()
    main_qm9_prop.main([
        "--exp_name", "cond_cls",
        "--datadir", wd,
        "--outf", gen_dir,
        "--property", "alpha",
        "--epochs", str(args.cls_epochs),
        "--batch_size", "64",
        "--nf", str(args.nf),
        "--n_layers", str(args.n_layers),
    ])
    t_cls = time.time() - t0

    # 4. the three MAE protocols.
    t0 = time.time()
    common = [
        "--generators_path", os.path.join(gen_dir, "cond_gen"),
        "--classifiers_path", os.path.join(gen_dir, "cond_cls"),
        "--property", "alpha",
        "--datadir", wd,
        "--classifier_nf", str(args.nf),
        "--classifier_layers", str(args.n_layers),
        "--iterations", str(args.eval_iterations),
        "--batch_size", str(args.eval_batch),
        "--nodes_from_data",
    ]
    mae_edm = eval_conditional_qm9.main(common + ["--task", "edm"])
    mae_naive = eval_conditional_qm9.main(common + ["--task", "naive"])
    mae_qm9 = eval_conditional_qm9.main(common + ["--task", "qm9"])
    mae_cfg = {
        w: eval_conditional_qm9.main(
            common + ["--task", "edm", "--cfg_scale", str(w)])
        for w in args.cfg_scales if w != 1.0
    }
    t_eval = time.time() - t0

    result = {
        "mae_conditioned": mae_edm,
        "mae_naive": mae_naive,
        "mae_data_floor": mae_qm9,
        "beats_naive": bool(mae_edm < mae_naive),
    }
    if mae_cfg:
        result["mae_cfg"] = mae_cfg
        result["best_cfg"] = min(mae_cfg, key=mae_cfg.get)
    lines = [
        "# Conditional generation: learning demonstration",
        "",
        "The conditional GeoLDM stack trained end-to-end on a synthetic",
        "geometry-derived property (alpha := radius of gyration, scale varied",
        "3x across the dataset), then scored with the reference's",
        "classifier-MAE protocol (eval_conditional_qm9.py:121-173) — all",
        "through the real CLIs (main_qm9 --conditioning alpha, main_qm9_prop,",
        "eval_conditional_qm9), second-half split convention.",
        "",
        f"Generator: latent diffusion, nf={args.nf}, {args.n_layers} layers,"
        f" T={args.diffusion_steps}, {args.gen_epochs} epochs"
        f" ({t_gen/60:.1f} min). Classifier: EGNN nf={args.nf},"
        f" {args.cls_epochs} epochs ({t_cls/60:.1f} min). Eval:"
        f" {args.eval_iterations}x{args.eval_batch} molecules per task"
        f" ({t_eval/60:.1f} min). 1 CPU core.",
        "",
        "| protocol | MAE (Angstrom) | meaning |",
        "|---|---|---|",
        f"| qm9 (classifier on real data) | {mae_qm9:.4f} | floor: classifier quality |",
        f"| **edm (conditioned generation)** | **{mae_edm:.4f}** | generator steered by the condition |",
        *[f"| edm + CFG w={w:g} | {m:.4f} | classifier-free guidance "
          f"(context_dropout={args.context_dropout:g}) |"
          for w, m in sorted(mae_cfg.items())],
        f"| naive (shuffled labels) | {mae_naive:.4f} | what ignoring the condition scores |",
        "",
        f"**Conditioned MAE {'<' if result['beats_naive'] else '>='} naive MAE** — "
        + ("the generator demonstrably steers geometry toward the requested "
           "property value." if result["beats_naive"] else
           "conditioning did NOT beat the baseline (see logs)."),
        "",
        "Reproduce: `JAX_PLATFORMS=cpu python scripts/conditional_demo.py`",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out}: {result}")
    return result


if __name__ == "__main__":
    r = main()
    sys.exit(0 if r["beats_naive"] else 1)

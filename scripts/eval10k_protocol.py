"""The full 10k-molecule eval_analyze protocol, timed end to end on TPU.

North-star protocol (BASELINE.md; reference eval_analyze.py:112-194):
generate 10,000 QM9 molecules at T=1000 through the flagship latent-
diffusion model (nf 256, 9 layers, latent_nf 1), run stability analysis +
validity/uniqueness/novelty, then 1 valid-NLL pass and 5 test-NLL passes.
Target: < 10 minutes wall-clock.

Weights are random-init (throughput is independent of training) and the
QM9 splits are fabricated at the reference's real sizes (valid 17,748 /
test 13,083 molecules — qm9/data/prepare/qm9.py:66-113) so the NLL passes
cost what they cost on real data. Stability/validity numbers are therefore
meaningless; the WALL-CLOCK is the result.

Usage:  python scripts/eval10k_protocol.py [--n_samples 10000]
        [--dtype bfloat16_mixed] [--batch 250] [--workdir /tmp/eval10k]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fabricate_qm9(datadir: str, counts: dict, n_max: int = 29, seed: int = 0) -> None:
    # Sizes are drawn from the REAL QM9 n_nodes histogram so batch shapes
    # and log p(N) lookups behave exactly as on real data.
    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.models.distributions import DistributionNodes

    nodes_dist = DistributionNodes(get_dataset_info("qm9").n_nodes)
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(datadir, "qm9"), exist_ok=True)
    for split, m in counts.items():
        num_atoms = nodes_dist.sample(m, rng)
        charges = np.zeros((m, n_max), dtype=np.int64)
        positions = np.zeros((m, n_max, 3), dtype=np.float32)
        for i, n in enumerate(num_atoms):
            charges[i, :n] = rng.choice(
                [1, 6, 7, 8, 9], size=n, p=[0.5, 0.3, 0.1, 0.07, 0.03]
            )
            positions[i, :n] = rng.standard_normal((n, 3)) * 1.5
        np.savez_compressed(
            os.path.join(datadir, "qm9", f"{split}.npz"),
            num_atoms=num_atoms, charges=charges, positions=positions,
            alpha=rng.standard_normal(m) * 8 + 75,
            mu=np.abs(rng.standard_normal(m)),
            U0=rng.standard_normal(m), U0_thermo=rng.standard_normal(m),
        )


def fabricate_geom(datadir: str, n_mols: int, seed: int = 0) -> str:
    """One conformer npy in the build_geom_dataset layout
    ([total_atoms, 5]: mol_id, atomic_number, xyz), sizes drawn from the
    real GEOM n_nodes histogram. load_split_data carves 10%/10%
    valid/test from it, so ``n_mols`` = 10x the wanted split size."""
    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.models.distributions import DistributionNodes

    info = get_dataset_info("geom")
    nodes_dist = DistributionNodes(info.n_nodes)
    rng = np.random.default_rng(seed)
    sizes = nodes_dist.sample(n_mols, rng)
    atomic = np.asarray(info.atomic_numbers, dtype=float)
    total = int(sizes.sum())
    out = np.empty((total, 5), dtype=np.float64)
    row = 0
    for mid, n in enumerate(sizes):
        out[row:row + n, 0] = mid
        out[row:row + n, 1] = rng.choice(atomic, size=n)
        out[row:row + n, 2:] = rng.standard_normal((n, 3)) * 2.0
        row += n
    os.makedirs(datadir, exist_ok=True)
    path = os.path.join(datadir, "geom_drugs_30.npy")
    np.save(path, out)
    return path


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n_samples", type=int, default=10_000)
    p.add_argument("--dataset", type=str, default="qm9", choices=["qm9", "geom"])
    p.add_argument("--dtype", type=str, default="bfloat16_mixed")
    p.add_argument("--batch", type=int, default=250)
    p.add_argument("--workdir", type=str, default="/tmp/eval10k")
    p.add_argument("--train_split", type=int, default=2000,
                   help="fabricated train-split size (only feeds the novelty "
                        "cache; reference uses 100k)")
    p.add_argument("--geom_mols", type=int, default=100_000,
                   help="fabricated GEOM conformer count; valid/test are 10% "
                        "each (reference extracts ~292k molecules)")
    p.add_argument("--n_steps", type=int, default=None,
                   help="few-step DDIM generation (BEYOND the reference "
                        "protocol — the output metric is renamed with a "
                        "_fewstepK suffix so it can never be confused with "
                        "the T=1000 protocol number)")
    args = p.parse_args()

    import jax

    from geoldm_tpu.utils.jaxcache import setup_compilation_cache

    setup_compilation_cache()

    from geoldm_tpu.cli import eval_analyze
    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.models import factory
    from geoldm_tpu.utils import checkpoint as ckpt

    workdir = args.workdir
    shutil.rmtree(workdir, ignore_errors=True)
    model_path = os.path.join(workdir, "model")
    datadir = os.path.join(workdir, "data")
    os.makedirs(model_path, exist_ok=True)

    if args.dataset == "geom":
        print(f"# fabricating {args.geom_mols} GEOM conformers ...",
              file=sys.stderr)
        fabricate_geom(datadir, args.geom_mols)
        info = get_dataset_info("geom")
        # GEOM-Drugs recipe (reference README.md:30).
        cfg = factory.make_latent_diffusion_config(
            info, nf=256, n_layers=4, latent_nf=2, diffusion_steps=1000,
            include_charges=False,
        )
    else:
        print("# fabricating QM9 splits at reference sizes ...", file=sys.stderr)
        fabricate_qm9(
            datadir,
            {"train": args.train_split, "valid": 17_748, "test": 13_083},
        )
        info = get_dataset_info("qm9")
        cfg = factory.make_latent_diffusion_config(
            info, nf=256, n_layers=9, latent_nf=1, diffusion_steps=1000
        )
    params = factory.init_params(jax.random.key(0), cfg)
    ckpt.save_checkpoint(
        model_path, {"params": params, "ema_params": params}, cfg, name="best"
    )

    t0 = time.time()
    eval_analyze.main([
        "--model_path", model_path,
        "--n_samples", str(args.n_samples),
        "--batch_size_gen", str(args.batch),
        "--datadir", datadir,
        "--dataset", args.dataset,
        "--compute_dtype", args.dtype,
    ] + (["--n_steps", str(args.n_steps)] if args.n_steps else []))
    total = time.time() - t0

    with open(os.path.join(model_path, "eval_log.txt")) as f:
        log = f.read()
    print("# eval_log.txt:\n" + log, file=sys.stderr)
    suffix = f"_fewstep{args.n_steps}" if args.n_steps else ""
    result = {
        "metric": f"{args.dataset}_eval10k_wall_minutes{suffix}",
        "value": round(total / 60.0, 2),
        "unit": "min",
        "vs_target_10min": round(total / 600.0, 3),
        "n_samples": args.n_samples,
        "dtype": args.dtype,
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

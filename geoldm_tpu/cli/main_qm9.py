"""Train GeoLDM on QM9 (first stage VAE or latent diffusion).

TPU-native equivalent of the reference entry point (main_qm9.py). Typical
usage, mirroring README.md:24/:30 of the reference:

  # Train the first-stage autoencoder:
  python -m geoldm_tpu.cli.main_qm9 --exp_name qm9_ae --n_epochs 100

  # Train latent diffusion (with a trainable decoder):
  python -m geoldm_tpu.cli.main_qm9 --exp_name qm9_ldm --train_diffusion \
      --trainable_ae --n_epochs 3000 --batch_size 64 --nf 256 --n_layers 9 \
      --diffusion_steps 1000 --diffusion_noise_schedule polynomial_2
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    from geoldm_tpu.cli.common import add_model_args

    p = argparse.ArgumentParser(description="geoldm-tpu QM9 training")
    add_model_args(p, qm9_defaults=True)
    p.add_argument("--dataset", type=str, default="qm9",
                   choices=["qm9", "qm9_second_half", "qm9_first_half"])
    p.add_argument("--datadir", type=str, default="data")
    p.add_argument("--filter_n_atoms", type=int, default=None)
    p.add_argument("--remove_h", action="store_true")
    p.add_argument("--force_download", action="store_true")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)

    from geoldm_tpu.cli.common import run_training
    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.data.qm9 import filter_atoms, load_qm9

    dataset_info = get_dataset_info("qm9" if "half" not in args.dataset else args.dataset,
                                    args.remove_h)
    splits, charge_scale = load_qm9(
        args.datadir, dataset=args.dataset, remove_h=args.remove_h,
        force_download=args.force_download,
    )
    if args.filter_n_atoms is not None:
        splits = filter_atoms(splits, args.filter_n_atoms)

    run_training(args, dataset_info, splits, charge_scale)


if __name__ == "__main__":
    main()

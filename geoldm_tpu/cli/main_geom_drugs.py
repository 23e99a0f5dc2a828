"""Train GeoLDM on GEOM-Drugs (up to 181-atom molecules).

TPU-native equivalent of the reference entry point (main_geom_drugs.py).
Reference recipe (README.md:30): bs 32, nf 256, 4 layers, latent_nf 2.

  python -m geoldm_tpu.cli.main_geom_drugs --exp_name geom_ldm \
      --train_diffusion --trainable_ae --n_layers 4 --latent_nf 2 \
      --batch_size 32

The dataset must be prepared first (see geoldm_tpu.data.geom
extract_conformers for the msgpack extraction step).
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    from geoldm_tpu.cli.common import add_model_args

    p = argparse.ArgumentParser(description="geoldm-tpu GEOM-Drugs training")
    add_model_args(p, qm9_defaults=False)
    p.add_argument("--dataset", type=str, default="geom")
    p.add_argument("--datadir", type=str, default="data/geom")
    p.add_argument("--conformations", type=int, default=30)
    p.add_argument("--remove_h", action="store_true")
    p.add_argument("--filter_molecule_size", type=int, default=None)
    p.add_argument("--sequential", action="store_true",
                   help="accepted for reference-command compatibility; "
                        "bucketed batching already bounds padding waste")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    import os

    from geoldm_tpu.cli.common import run_training
    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.data.geom import GeomLoader, load_split_data

    dataset_info = get_dataset_info("geom", args.remove_h)
    tag = f"{'no_h_' if args.remove_h else ''}{args.conformations}"
    data_file = os.path.join(args.datadir, f"geom_drugs_{tag}.npy")
    train, val, test = load_split_data(
        data_file, val_proportion=0.1, test_proportion=0.1,
        filter_size=args.filter_molecule_size,
    )
    loaders = {
        split: GeomLoader(
            data, dataset_info, batch_size=args.batch_size,
            shuffle=(split == "train"), include_charges=args.include_charges,
            seed=args.seed,
        )
        for split, data in [("train", train), ("valid", val), ("test", test)]
    }
    run_training(args, dataset_info, None, None, loaders=loaders)


if __name__ == "__main__":
    main()

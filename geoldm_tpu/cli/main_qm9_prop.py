"""Train the EGNN property classifier on qm9_first_half.

TPU-native equivalent of the reference
qm9/property_prediction/main_qm9_prop.py: trains on qm9_first_half,
validates on valid, tests on qm9_second_half's train split.

  python -m geoldm_tpu.cli.main_qm9_prop --property alpha --exp_name cls_alpha
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="geoldm-tpu property classifier")
    p.add_argument("--exp_name", type=str, default="classifier")
    p.add_argument("--batch_size", type=int, default=96)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--nf", type=int, default=128)
    p.add_argument("--attention", type=int, default=1)
    p.add_argument("--n_layers", type=int, default=7)
    p.add_argument("--property", type=str, default="alpha",
                   choices=["alpha", "gap", "homo", "lumo", "mu", "Cv", "G",
                            "H", "r2", "U", "U0", "zpve"])
    p.add_argument("--datadir", type=str, default="data")
    p.add_argument("--remove_h", action="store_true")
    p.add_argument("--node_attr", type=int, default=0)
    p.add_argument("--weight_decay", type=float, default=1e-16)
    p.add_argument("--model_name", type=str, default="egnn",
                   choices=["egnn", "naive", "numnodes"])
    p.add_argument("--outf", type=str, default="outputs")
    p.add_argument("--compute_dtype", type=str, default="float32")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    import jax.numpy as jnp

    from geoldm_tpu.utils.jaxcache import setup_compilation_cache

    setup_compilation_cache()

    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.data.qm9 import QM9Loader, load_qm9
    from geoldm_tpu.train import classifier_train as ct
    from geoldm_tpu.train.conditioning import compute_mean_mad_from_arrays

    info = get_dataset_info("qm9", args.remove_h)
    first, _ = load_qm9(args.datadir, dataset="qm9_first_half", remove_h=args.remove_h)
    second, _ = load_qm9(args.datadir, dataset="qm9_second_half", remove_h=args.remove_h)

    pad = info.max_n_nodes
    loaders = {
        "train": QM9Loader(first["train"], args.batch_size, pad, shuffle=True,
                           properties=(args.property,), seed=args.seed),
        "valid": QM9Loader(first["valid"], args.batch_size, pad, shuffle=False,
                           properties=(args.property,)),
        # Test on the OTHER half's training molecules (reference
        # main_qm9_prop.py:182-184).
        "test": QM9Loader(second["train"], args.batch_size, pad, shuffle=False,
                          properties=(args.property,)),
    }
    # Adapt loader batches: classifier_train expects the property under its
    # name; QM9Loader already passes it through.
    property_norms = compute_mean_mad_from_arrays(
        first["valid"], [args.property]
    )

    compute_dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else None
    import os

    result = ct.train_classifier(
        loaders, args.property, property_norms,
        epochs=args.epochs, lr=args.lr, weight_decay=args.weight_decay,
        nf=args.nf, n_layers=args.n_layers, attention=bool(args.attention),
        node_attr=bool(args.node_attr),
        in_node_nf=len(info.atom_decoder),
        seed=args.seed, outdir=os.path.join(args.outf, args.exp_name),
        compute_dtype=compute_dtype,
    )
    print(
        f"best val {result['best_val']:.4f} test {result['best_test']:.4f} "
        f"at epoch {result['best_epoch']}"
    )


if __name__ == "__main__":
    main()

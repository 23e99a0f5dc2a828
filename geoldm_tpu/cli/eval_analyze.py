"""Evaluate sample quality: stability / validity / uniqueness / novelty + NLL.

TPU-native equivalent of the reference eval_analyze.py: loads a checkpoint
(config JSON + EMA weights), generates n_samples molecules in batches with
wall-clock throughput reporting, computes stability and (if rdkit is
installed) validity/uniqueness/novelty, then evaluates val/test NLL (the
test pass repeated 5x, reference: eval_analyze.py:172-188), and writes
eval_log.txt.

  python -m geoldm_tpu.cli.eval_analyze --model_path outputs/qm9_ldm \
      --n_samples 10000
"""

from __future__ import annotations

import argparse
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="geoldm-tpu sample-quality eval")
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--n_samples", type=int, default=10_000)
    p.add_argument("--batch_size_gen", type=int, default=100)
    p.add_argument("--batch_size_nll", type=int, default=64,
                   help="NLL-pass batch size; kept small because XLA compile "
                        "time of the t0_always program grows superlinearly "
                        "with batch at unaligned pad (362s at 250 vs 6s at "
                        "64 on v5e through the remote-compile tunnel)")
    p.add_argument("--dataset", type=str, default="qm9")
    p.add_argument("--conformation_file", type=str, default="geom_drugs_30.npy",
                   help="GEOM conformer npy under --datadir (e.g. "
                        "geom_drugs_1.npy for --conformations 1 builds)")
    p.add_argument("--datadir", type=str, default="data")
    p.add_argument("--remove_h", action="store_true")
    p.add_argument("--compute_dtype", type=str, default="float32")
    p.add_argument("--use_ema", type=eval, default=True)
    p.add_argument("--skip_nll", action="store_true")
    p.add_argument("--n_test_passes", type=int, default=5)
    p.add_argument("--augment_noise", type=float, default=0.0,
                   help="eval-time coordinate noise (reference applies the "
                        "training augment_noise during NLL eval too, "
                        "train_test.py:119-124; pass the training value "
                        "for models trained with it)")
    p.add_argument("--dp", type=int, default=1,
                   help="shard generation over this many devices")
    p.add_argument("--n_steps", type=int, default=None,
                   help="few-step DDIM-family sampling: number of reverse "
                        "jumps (default: the model's full T; beyond the "
                        "reference protocol — label results accordingly)")
    p.add_argument("--eta", type=float, default=1.0,
                   help="stochasticity of the strided sampler (1.0 = "
                        "ancestral posterior noise, 0.0 = deterministic "
                        "DDIM); only used with --n_steps")
    p.add_argument("--sampler", type=str, default="ddim",
                   choices=["ddim", "dpm2m"],
                   help="few-step jump rule: ddim (first order, eta "
                        "stochasticity) or dpm2m (DPM-Solver++ 2M, "
                        "second-order deterministic)")
    p.add_argument("--novelty_smiles", type=str, default=None,
                   help="path to a text file of SMILES (one per line) to "
                        "use as the novelty base instead of the training "
                        "set (no-RDKit fallback backend only; entries are "
                        "re-canonicalized with the built-in writer)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    import jax
    import numpy as np

    from geoldm_tpu.utils.jaxcache import setup_compilation_cache

    setup_compilation_cache()

    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.models import factory
    from geoldm_tpu.models.distributions import DistributionNodes
    from geoldm_tpu.train import trainer as trainer_mod
    from geoldm_tpu.utils import checkpoint as ckpt

    model_cfg = ckpt.load_config(args.model_path)
    dataset_info = get_dataset_info(args.dataset, args.remove_h)
    nodes_dist = DistributionNodes(dataset_info.n_nodes)

    template = {
        "params": factory.init_params(jax.random.key(0), model_cfg),
    }
    template["ema_params"] = template["params"]
    state = ckpt.load_checkpoint(args.model_path, template=template, name="best")
    params = state["ema_params"] if args.use_ema else state["params"]

    rng = np.random.default_rng(args.seed)
    key = jax.random.key(args.seed)

    mesh = None
    if args.dp > 1:
        from geoldm_tpu.parallel import sharding as shd

        mesh = shd.make_mesh(dp=args.dp, tp=1)

    # One mapping for generation AND the NLL phase (resolve_compute treats
    # "float32" and None identically; None keeps call sites uniform).
    compute_dtype = None if args.compute_dtype == "float32" else args.compute_dtype

    external_smiles = None
    if args.novelty_smiles:
        with open(args.novelty_smiles) as f:
            external_smiles = [ln.strip() for ln in f if ln.strip()]
        print(f"novelty base: {len(external_smiles)} external SMILES from "
              f"{args.novelty_smiles}")

    t0 = time.time()
    validity, rdkit_tuple, molecules = trainer_mod.analyze_and_save(
        model_cfg, params, key, dataset_info, nodes_dist,
        n_samples=args.n_samples, batch_size=args.batch_size_gen,
        compute_dtype=compute_dtype,
        rng=rng, mesh=mesh, datadir=args.datadir,
        n_steps=args.n_steps, eta=args.eta, method=args.sampler,
        external_smiles=external_smiles,
    )
    elapsed = time.time() - t0
    n_done = len(molecules["x"])
    print(f"generated {n_done} molecules in {elapsed:.1f}s "
          f"({elapsed / max(n_done, 1):.3f} secs/sample, {n_done / elapsed:.2f} mol/s)")
    print(f"stability: {validity}")
    if rdkit_tuple is not None:
        (vals, unique) = rdkit_tuple
        print(f"validity {vals[0]:.4f} uniqueness {vals[1]:.4f} novelty {vals[2]:.4f}")

    nll_val = nll_test = None
    if not args.skip_nll:
        if args.dataset.startswith("geom"):
            # GEOM NLL: the reference evaluates whatever dataset the
            # checkpoint trained on; GEOM splits come from the conformer
            # npy + fixed permutation, stacked into the packed layout.
            from geoldm_tpu.data import geom as geom_mod

            conf = os.path.join(args.datadir, args.conformation_file)
            _, val_l, test_l = geom_mod.load_split_data(conf)
            splits = {
                "valid": geom_mod.split_dict(val_l, dataset_info),
                "test": geom_mod.split_dict(test_l, dataset_info),
            }
        else:
            from geoldm_tpu.data.qm9 import load_qm9

            splits, _ = load_qm9(args.datadir, dataset=args.dataset, remove_h=args.remove_h)
        # Device-resident NLL: each pass is ONE dispatch over the staged
        # split (the per-batch loader path pays a host->device transfer per
        # batch — ~0.4s/batch through a remote tunnel).
        t_nll = time.time()
        # GEOM pads to the 8-aligned 184 (181 would force unaligned TPU
        # layouts); masks carry the real size so the NLL is unchanged.
        pad_nll = (
            -(-dataset_info.max_n_nodes // 8) * 8
            if args.dataset.startswith("geom") else dataset_info.max_n_nodes
        )
        key, vk = jax.random.split(key)
        nll_val = trainer_mod.evaluate_nll_packed(
            params, model_cfg, splits["valid"], nodes_dist, vk,
            batch_size=args.batch_size_nll,
            pad_nodes=pad_nll, partition="valid",
            compute_dtype=compute_dtype, augment_noise=args.augment_noise,
        )[0]
        key, tk = jax.random.split(key)
        tests = trainer_mod.evaluate_nll_packed(
            params, model_cfg, splits["test"], nodes_dist, tk,
            batch_size=args.batch_size_nll,
            pad_nodes=pad_nll,
            n_passes=args.n_test_passes, partition="test",
            compute_dtype=compute_dtype, augment_noise=args.augment_noise,
        )
        nll_test = float(np.mean(tests))
        print(f"final test NLL: {nll_test:.4f} (+/- {np.std(tests):.4f}); "
              f"NLL phase {time.time() - t_nll:.1f}s")

    with open(os.path.join(args.model_path, "eval_log.txt"), "w") as f:
        f.write(f"n_samples {n_done}\n")
        f.write(f"secs/sample {elapsed / max(n_done, 1):.4f}\n")
        f.write(f"mol_stable {validity['mol_stable']}\n")
        f.write(f"atm_stable {validity['atm_stable']}\n")
        if rdkit_tuple is not None:
            f.write(
                f"validity {rdkit_tuple[0][0]} uniqueness {rdkit_tuple[0][1]} "
                f"novelty {rdkit_tuple[0][2]}\n"
            )
        if nll_val is not None:
            f.write(f"nll_val {nll_val}\nnll_test {nll_test}\n")

    # Unique canonical SMILES of the generated set as a standalone artifact
    # (sorted for diffability) — usable as a --novelty_smiles base for a
    # later run, or for external analysis. The reference keeps these only
    # in memory (qm9/rdkit_functions.py:115-133).
    if rdkit_tuple is not None and rdkit_tuple[1]:
        smiles_path = os.path.join(args.model_path, "generated_smiles.txt")
        with open(smiles_path, "w") as f:
            f.write("\n".join(sorted(rdkit_tuple[1])) + "\n")
        print(f"wrote {len(rdkit_tuple[1])} unique SMILES to {smiles_path}")


if __name__ == "__main__":
    main()

"""Conditional-generation evaluation: classifier MAE on generated molecules.

TPU-native equivalent of the reference eval_conditional_qm9.py:
- quantitative: wrap the conditional generator as a data source (sample
  molecules + de-normalized property labels — the reference's
  DiffusionDataloader, eval_conditional_qm9.py:60-118) and score a
  pre-trained property classifier on it; baselines 'qm9' (classifier on
  real data) and 'naive' (shuffled labels) included,
- qualitative: a property-sweep chain saved as xyz + gif.

  python -m geoldm_tpu.cli.eval_conditional_qm9 \
      --generators_path outputs/cond_alpha --classifiers_path outputs/cls_alpha \
      --property alpha --iterations 100 --batch_size 100 --task edm
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="geoldm-tpu conditional eval")
    p.add_argument("--generators_path", type=str, required=False)
    p.add_argument("--classifiers_path", type=str, required=False)
    p.add_argument("--property", type=str, default="alpha",
                   choices=["alpha", "gap", "homo", "lumo", "mu", "Cv"])
    p.add_argument("--iterations", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=100)
    p.add_argument("--task", type=str, default="edm",
                   choices=["edm", "qm9", "naive", "qualitative"])
    p.add_argument("--datadir", type=str, default="data")
    p.add_argument("--classifier_nf", type=int, default=128)
    p.add_argument("--classifier_layers", type=int, default=7)
    p.add_argument("--debug_break", action="store_true")
    p.add_argument("--nodes_from_data", action="store_true",
                   help="build the molecule-size prior from the loaded "
                        "split instead of the static QM9 table (needed for "
                        "generators trained on non-QM9/synthetic data)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cfg_scale", type=float, default=1.0,
                   help="classifier-free guidance scale for the edm task "
                        "(1.0 = plain conditional; needs a generator trained "
                        "with --context_dropout > 0)")
    p.add_argument("--clip_z", type=float, default=0.0,
                   help="per-step dynamic-range guard on the sampler state "
                        "(vdm.vdm_sample clip_z); recommended ~15 with "
                        "--cfg_scale > 1, 0 = reference protocol")
    return p.parse_args(argv)


def _load_classifier(path, nf, n_layers):
    import jax

    from geoldm_tpu.models import classifier as clf
    from geoldm_tpu.utils import checkpoint as ckpt

    template = clf.classifier_init(jax.random.key(0), 5, nf, n_layers, True, False)
    return ckpt.load_checkpoint(path, template=template, name="best")


def main(argv=None):
    """Returns the mean MAE (float) for the edm/qm9/naive tasks; the
    qualitative sweep task renders a gif and returns None."""
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from geoldm_tpu.utils.jaxcache import setup_compilation_cache

    setup_compilation_cache()

    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.data.qm9 import QM9Loader
    from geoldm_tpu.models import classifier as clf
    from geoldm_tpu.models import factory
    from geoldm_tpu.models.distributions import DistributionNodes
    from geoldm_tpu.train import sampling as sampling_mod
    from geoldm_tpu.train.conditioning import load_conditional_protocol
    from geoldm_tpu.utils import checkpoint as ckpt

    info = get_dataset_info("qm9")
    prop = args.property
    rng = np.random.default_rng(args.seed)
    key = jax.random.key(args.seed)

    # Normalizers come from the second-half protocol (valid split).
    splits, norms, prop_dist_data, nodes_dist_data, pad_data = (
        load_conditional_protocol(args.datadir, [prop]))
    mean, mad = norms[prop]["mean"], norms[prop]["mad"]

    classifier_params = _load_classifier(
        args.classifiers_path, args.classifier_nf, args.classifier_layers
    )

    @jax.jit
    def classify(h0, x, node_mask, edge_mask):
        return clf.classifier_apply(classifier_params, h0, x, node_mask, edge_mask)

    losses = []

    if args.task == "edm":
        model_cfg = ckpt.load_config(args.generators_path)
        template = {"params": factory.init_params(jax.random.key(0), model_cfg)}
        template["ema_params"] = template["params"]
        state = ckpt.load_checkpoint(args.generators_path, template=template, name="best")
        params = state["ema_params"]

        if args.nodes_from_data:
            nodes_dist, pad_nodes = nodes_dist_data, pad_data
        else:
            nodes_dist, pad_nodes = DistributionNodes(info.n_nodes), None
        prop_dist = prop_dist_data

        from geoldm_tpu.data.collate import build_masks

        for it in range(args.iterations):
            nodesxsample = nodes_dist.sample(args.batch_size, rng)
            ctx_norm = prop_dist.sample_batch(nodesxsample, rng)  # normalized
            key, sub = jax.random.split(key)
            one_hot, charges, x, node_mask = sampling_mod.sample(
                model_cfg, params, sub, info, nodesxsample, context=ctx_norm,
                pad_nodes=pad_nodes, rng=rng,
                guidance_scale=args.cfg_scale, clip_z=args.clip_z,
            )
            _, edge_mask = build_masks(node_mask[..., 0].sum(1).astype(int),
                                       node_mask.shape[1])
            label = ctx_norm[:, 0] * mad + mean  # de-normalized target
            pred = classify(
                jnp.asarray(one_hot), jnp.asarray(x), jnp.asarray(node_mask),
                jnp.asarray(edge_mask),
            )
            mae = float(jnp.mean(jnp.abs(mad * pred + mean - jnp.asarray(label))))
            losses.append(mae)
            print(f"iter {it}: MAE {mae:.4f} (running {np.mean(losses):.4f})")
            if args.debug_break:
                break
    elif args.task in ("qm9", "naive"):
        loader = QM9Loader(
            splits["train"], args.batch_size, info.max_n_nodes, shuffle=True,
            properties=(prop,), seed=args.seed,
        )
        for it, batch in enumerate(loader):
            if it >= args.iterations:
                break
            label = batch[prop]
            if args.task == "naive":
                label = rng.permutation(label)
            pred = classify(
                jnp.asarray(batch["h_cat"]), jnp.asarray(batch["x"]),
                jnp.asarray(batch["node_mask"]), jnp.asarray(batch["edge_mask"]),
            )
            mae = float(jnp.mean(jnp.abs(mad * pred + mean - jnp.asarray(label))))
            losses.append(mae)
            if args.debug_break:
                break
    elif args.task == "qualitative":
        from geoldm_tpu.evalsuite import visualizer as viz

        model_cfg = ckpt.load_config(args.generators_path)
        template = {"params": factory.init_params(jax.random.key(0), model_cfg)}
        template["ema_params"] = template["params"]
        state = ckpt.load_checkpoint(args.generators_path, template=template, name="best")
        one_hot, charges, x, node_mask = sampling_mod.sample_sweep_conditional(
            model_cfg, state["ema_params"], key, info, prop_dist_data
        )
        sweep_dir = f"{args.generators_path}/sweep_{prop}"
        viz.save_chain(sweep_dir, one_hot, charges, x, info)
        gif = viz.visualize_chain(sweep_dir, info)
        print(f"sweep gif: {gif}")
        return

    if not losses:
        raise RuntimeError(
            f"task {args.task!r} scored zero batches — check --iterations "
            "and the dataset split sizes")
    mean_mae = float(np.mean(losses))
    print(f"{args.task} MAE over {len(losses)} iterations: {mean_mae:.4f}")
    return mean_mae


if __name__ == "__main__":
    main()

"""Sample molecules for visualization: grids, stable-filtered sets, chains.

TPU-native equivalent of the reference eval_sample.py: loads a checkpoint,
saves (a) n_samples molecules, (b) up to 10 stability-filtered molecules
(2x oversampling), and (c) chain GIFs of the reverse diffusion.
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="geoldm-tpu sampling/visualization")
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--n_samples", type=int, default=30)
    p.add_argument("--n_stable", type=int, default=10)
    p.add_argument("--n_chains", type=int, default=1)
    p.add_argument("--keep_frames", type=int, default=100)
    p.add_argument("--n_tries", type=int, default=10)
    p.add_argument("--dataset", type=str, default="qm9")
    p.add_argument("--remove_h", action="store_true")
    p.add_argument("--outdir", type=str, default=None)
    p.add_argument("--use_ema", type=eval, default=True)
    p.add_argument("--n_steps", type=int, default=None,
                   help="few-step DDIM-family sampling for the molecule "
                        "grid and stable set (chains always run dense)")
    p.add_argument("--eta", type=float, default=1.0)
    p.add_argument("--sampler", type=str, default="ddim",
                   choices=["ddim", "dpm2m"])
    p.add_argument("--chain_uncertainty", type=eval, default=True,
                   help="render chain gifs as 3-frame alpha overlays like "
                        "the reference's eval_sample (False = plain frames)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    import jax
    import numpy as np

    from geoldm_tpu.utils.jaxcache import setup_compilation_cache

    setup_compilation_cache()

    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.evalsuite import visualizer as viz
    from geoldm_tpu.evalsuite.analyze import check_stability
    from geoldm_tpu.models import factory
    from geoldm_tpu.models.distributions import DistributionNodes
    from geoldm_tpu.train import sampling as sampling_mod
    from geoldm_tpu.utils import checkpoint as ckpt

    model_cfg = ckpt.load_config(args.model_path)
    dataset_info = get_dataset_info(args.dataset, args.remove_h)
    nodes_dist = DistributionNodes(dataset_info.n_nodes)
    outdir = args.outdir or os.path.join(args.model_path, "eval")

    template = {"params": factory.init_params(jax.random.key(0), model_cfg)}
    template["ema_params"] = template["params"]
    state = ckpt.load_checkpoint(args.model_path, template=template, name="best")
    params = state["ema_params"] if args.use_ema else state["params"]

    rng = np.random.default_rng(args.seed)
    key = jax.random.key(args.seed)

    # (a) molecule grid.
    key, k1 = jax.random.split(key)
    nodesxsample = nodes_dist.sample(args.n_samples, rng)
    one_hot, charges, x, node_mask = sampling_mod.sample(
        model_cfg, params, k1, dataset_info, nodesxsample,
        n_steps=args.n_steps, eta=args.eta, method=args.sampler,
    )
    grid_dir = os.path.join(outdir, "molecules")
    viz.save_xyz_file(grid_dir, one_hot, charges, x, dataset_info,
                      node_mask=node_mask)
    viz.visualize(grid_dir, dataset_info, max_num=args.n_samples)
    print(f"saved {args.n_samples} molecules to {grid_dir}")

    # (b) stable-filtered molecules (2x oversampling; reference
    # eval_sample.py:62-93).
    stable_dir = os.path.join(outdir, "stable_molecules")
    found = 0
    for _ in range(2 * args.n_stable // max(args.n_samples, 1) + 2):
        if found >= args.n_stable:
            break
        key, k2 = jax.random.split(key)
        nodesxsample = nodes_dist.sample(args.n_samples, rng)
        one_hot, charges, x, node_mask = sampling_mod.sample(
            model_cfg, params, k2, dataset_info, nodesxsample,
            n_steps=args.n_steps, eta=args.eta, method=args.sampler,
        )
        for i in range(len(x)):
            n = int(node_mask[i, :, 0].sum())
            types = np.argmax(one_hot[i, :n], axis=1)
            if check_stability(x[i, :n], types, dataset_info)[0]:
                viz.save_xyz_file(
                    stable_dir, one_hot[i : i + 1], charges[i : i + 1],
                    x[i : i + 1], dataset_info, id_from=found,
                    node_mask=node_mask[i : i + 1],
                )
                found += 1
                if found >= args.n_stable:
                    break
    viz.visualize(stable_dir, dataset_info, max_num=args.n_stable)
    print(f"saved {found} stable molecules to {stable_dir}")

    # (c) chains.
    for c in range(args.n_chains):
        key, k3 = jax.random.split(key)
        chain_oh, chain_ch, chain_x = sampling_mod.sample_chain(
            model_cfg, params, k3, dataset_info, n_tries=args.n_tries,
            keep_frames=args.keep_frames, rng=rng,
        )
        chain_dir = os.path.join(outdir, f"chain_{c}")
        viz.save_chain(chain_dir, chain_oh, chain_ch, chain_x, dataset_info)
        if args.chain_uncertainty:
            # reference eval_sample.py:42 renders chains as 3-frame
            # alpha overlays (sampling uncertainty as ghosting).
            gif = viz.visualize_chain_uncertainty(chain_dir, dataset_info)
        else:
            gif = viz.visualize_chain(chain_dir, dataset_info)
        print(f"chain gif: {gif}")


if __name__ == "__main__":
    main()

"""Convert a released GeoLDM torch checkpoint directory into a geoldm-tpu
checkpoint that eval_analyze / eval_sample / main_qm9 --resume can consume.

  python -m geoldm_tpu.cli.convert_torch_checkpoint \\
      --torch_path outputs/pretrained_qm9 --out outputs/qm9_converted

Expects the reference layout (utils.py:20-26, main_qm9.py:283-298):
  args.pickle                    pickled argparse namespace
  generative_model_ema.npy       torch.save(state_dict)  (or generative_model.npy)
Writes: config.json + an orbax checkpoint named --name (default 'best')
holding {'params', 'ema_params'} — the template eval_analyze builds.
"""

from __future__ import annotations

import argparse
import os
import pickle


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="torch->geoldm-tpu checkpoint converter")
    p.add_argument("--torch_path", type=str, required=True,
                   help="directory with args.pickle + generative_model*.npy")
    p.add_argument("--weights", type=str, default=None,
                   help="state-dict file name (default: generative_model_ema.npy "
                        "if present, else generative_model.npy)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--name", type=str, default="best")
    p.add_argument("--dataset", type=str, default=None,
                   help="override dataset name (default: from args.pickle)")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    import torch

    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.utils import checkpoint as ckpt
    from geoldm_tpu.utils.torch_convert import (
        model_config_from_reference_args,
        params_from_reference_state_dict,
    )

    with open(os.path.join(args.torch_path, "args.pickle"), "rb") as f:
        ref_args = pickle.load(f)

    weights = args.weights
    if weights is None:
        ema = os.path.join(args.torch_path, "generative_model_ema.npy")
        weights = "generative_model_ema.npy" if os.path.exists(ema) else "generative_model.npy"
    sd = torch.load(os.path.join(args.torch_path, weights), map_location="cpu")

    dataset = args.dataset or getattr(ref_args, "dataset", "qm9")
    remove_h = getattr(ref_args, "remove_h", False)
    info = get_dataset_info(dataset, remove_h)

    model_cfg = model_config_from_reference_args(ref_args, info)
    params = params_from_reference_state_dict(sd, model_cfg)

    n_leaves = len(__import__("jax").tree_util.tree_leaves(params))
    print(f"converted {n_leaves} param arrays from {weights} "
          f"(model kind: {model_cfg.kind})")

    state = {"params": params, "ema_params": params}
    target = ckpt.save_checkpoint(args.out, state, cfg=model_cfg, name=args.name)
    print(f"wrote {target} + config.json — evaluate with:\n"
          f"  python -m geoldm_tpu.cli.eval_analyze --model_path {args.out}")


if __name__ == "__main__":
    main()

"""Export a geoldm-tpu checkpoint to the reference's torch layout.

Inverse of convert_torch_checkpoint: writes ``args.pickle`` plus
``generative_model.npy`` / ``generative_model_ema.npy``
(torch.save state_dict, reference utils.py:20-26) so weights trained here
can be loaded by the upstream GeoLDM code — including the non-trainable
entries (fixed-schedule gamma table, dummy buffer) that
``load_state_dict(strict=True)`` requires.

  python -m geoldm_tpu.cli.export_torch_checkpoint \\
      --model_path outputs/qm9_ldm --out outputs/qm9_torch
"""

from __future__ import annotations

import argparse
import os
import pickle


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="geoldm-tpu -> torch checkpoint export")
    p.add_argument("--model_path", type=str, required=True,
                   help="geoldm-tpu checkpoint dir (config.json + orbax)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--name", type=str, default="best",
                   help="checkpoint name to load (default 'best')")
    p.add_argument("--dataset", type=str, default="qm9")
    p.add_argument("--remove_h", action="store_true")
    p.add_argument("--ema_decay", type=float, default=None,
                   help="EMA decay the checkpoint was actually trained "
                        "with (written into args.pickle for upstream "
                        "tooling; 0 for non-EMA). Default: reference's "
                        "0.9999, with a warning")
    p.add_argument("--conditioning", nargs="*", default=[],
                   help="property names the context channels were trained "
                        "on (required by upstream eval for conditional "
                        "models; the checkpoint stores only the count)")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    import jax
    import torch

    from geoldm_tpu.models import factory
    from geoldm_tpu.utils import checkpoint as ckpt
    from geoldm_tpu.utils.torch_convert import (
        reference_args_from_model_config,
        state_dict_from_params,
    )

    model_cfg = ckpt.load_config(args.model_path)
    template = {"params": factory.init_params(jax.random.key(0), model_cfg)}
    template["ema_params"] = template["params"]
    state = ckpt.load_checkpoint(args.model_path, template=template,
                                 name=args.name)

    os.makedirs(args.out, exist_ok=True)
    ref_args = reference_args_from_model_config(
        model_cfg, dataset=args.dataset, remove_h=args.remove_h,
        conditioning=args.conditioning, ema_decay=args.ema_decay)
    with open(os.path.join(args.out, "args.pickle"), "wb") as f:
        pickle.dump(ref_args, f)

    for which, fname in (("params", "generative_model.npy"),
                         ("ema_params", "generative_model_ema.npy")):
        sd = state_dict_from_params(state[which], model_cfg)
        torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
                   os.path.join(args.out, fname))
        print(f"wrote {fname} ({len(sd)} entries)")
    print(f"exported {args.model_path} -> {args.out} (reference layout)")


if __name__ == "__main__":
    main()

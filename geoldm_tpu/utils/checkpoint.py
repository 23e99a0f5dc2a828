"""Checkpoint / resume via orbax, with the config traveling alongside.

Replaces the reference's torch.save(state_dict) + pickled argparse args
(utils.py:20-26, main_qm9.py:283-298 best-checkpoint saves, :147-171
resume-overrides-CLI). Improvements the reference lacks: optimizer state,
EMA params and the step counter are all checkpointed (training RNG is
derived deterministically from (seed, epoch), so resume reproduces the
stream); the config is JSON next to the weights.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

from geoldm_tpu import config as config_mod


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(path: str, state: Any, cfg: Any = None, name: str = "state") -> str:
    """Save a pytree state (TrainState or params) + optional config JSON."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ocp = _ocp()
    ckptr = ocp.StandardCheckpointer()
    target = os.path.join(path, name)
    if os.path.exists(target):
        import shutil

        shutil.rmtree(target)
    ckptr.save(target, jax.tree.map(np.asarray, state))
    ckptr.wait_until_finished()
    if cfg is not None:
        config_mod.save(cfg, os.path.join(path, "config.json"))
    return target


def validate_against_template(path: str, template: Any, name: str = "state") -> None:
    """Cross-check the stored checkpoint's tree structure/shapes/dtypes
    against the restore template BEFORE orbax touches the data, so a config
    mismatch (wrong --nf / n_layers / model kind, edited config.json)
    surfaces as one readable error instead of a raw orbax traceback."""
    ocp = _ocp()
    ckptr = ocp.StandardCheckpointer()
    try:
        meta = ckptr.metadata(os.path.join(os.path.abspath(path), name))
        meta_tree = meta.item_metadata.tree
    except Exception:
        return  # older/foreign checkpoint without readable metadata

    def _norm(path) -> str:
        # orbax metadata renders tuples/NamedTuples as dicts keyed by index/
        # field name; normalize both sides to "a/b/0/w"-style strings.
        parts = []
        for e in path:
            for attr in ("key", "idx", "name"):
                if hasattr(e, attr):
                    parts.append(str(getattr(e, attr)))
                    break
            else:
                parts.append(str(e))
        return "/".join(parts)

    def _flat(tree):
        return {
            _norm(p): leaf
            for p, leaf in jax.tree_util.tree_leaves_with_path(tree)
        }

    got = _flat(meta_tree)
    want = _flat(jax.tree.map(np.asarray, template))
    problems = []
    for k in sorted(set(want) | set(got)):
        if k not in got:
            problems.append(f"  missing in checkpoint: {k} "
                            f"(template {want[k].shape} {want[k].dtype})")
        elif k not in want:
            problems.append(f"  unexpected in checkpoint: {k} "
                            f"({tuple(got[k].shape)} {got[k].dtype})")
        elif tuple(got[k].shape) != tuple(want[k].shape):
            problems.append(f"  shape mismatch at {k}: checkpoint "
                            f"{tuple(got[k].shape)} vs template {tuple(want[k].shape)}")
    if problems:
        shown = problems[:12]
        more = f"\n  ... and {len(problems) - 12} more" if len(problems) > 12 else ""
        raise ValueError(
            f"checkpoint at {path!r} ({name}) does not match the model you are "
            f"restoring into — it was saved with a different config "
            f"(check config.json next to the checkpoint vs your flags):\n"
            + "\n".join(shown) + more
        )


def load_checkpoint(path: str, template: Any, name: str = "state",
                    validate: bool = True) -> Any:
    """Restore a pytree saved by save_checkpoint; template supplies the
    structure (e.g. a freshly initialized TrainState)."""
    if validate:
        validate_against_template(path, template, name)
    ocp = _ocp()
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.join(os.path.abspath(path), name),
        jax.tree.map(np.asarray, template),
    )
    return jax.tree.map(lambda t, r: r, template, restored)


def load_config(path: str):
    return config_mod.load(os.path.join(path, "config.json"))

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


def load_checkpoint(path: str, template: Any, name: str = "state") -> Any:
    """Restore a pytree saved by save_checkpoint; template supplies the
    structure (e.g. a freshly initialized TrainState)."""
    ocp = _ocp()
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.join(os.path.abspath(path), name),
        jax.tree.map(np.asarray, template),
    )
    return jax.tree.map(lambda t, r: r, template, restored)


def load_config(path: str):
    return config_mod.load(os.path.join(path, "config.json"))

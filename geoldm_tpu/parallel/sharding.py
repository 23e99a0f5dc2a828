"""SPMD parallelism over a jax.sharding.Mesh.

Replaces the reference's single-process ``torch.nn.DataParallel``
(main_qm9.py:234-239) with mesh-based GSPMD:

- axis ``data``: batch sharding (data parallel). Gradients are combined by
  XLA-inserted all-reduces over ICI — there is no hand-written communication.
- axis ``model``: tensor parallelism over the EGNN hidden dimension.
  Weight matrices whose output feature dim equals ``hidden_nf`` are sharded
  column-wise (megatron-style); GSPMD propagates the activation shardings
  through the dense [B, N, N, H] pair grid and inserts the reduction
  collectives where hidden-sharded contributions recombine.

Sampling fans out the same way: batch-sharded over ``data`` with the whole
reverse scan compiled as one SPMD program.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp: int = 0, tp: int = 1, devices=None) -> Mesh:
    """Create a (data, model) mesh. dp=0 means "all remaining devices"."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp <= 0:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp <= n, f"mesh {dp}x{tp} needs more than {n} devices"
    mesh_devices = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(params, mesh: Mesh, hidden_nf: Optional[int] = None):
    """Sharding pytree for model params.

    With a trivial model axis everything is replicated. Otherwise weights
    with a final dim equal to hidden_nf are column-sharded over ``model``
    (biases too); everything else is replicated. GSPMD derives the rest.
    """
    tp = mesh.shape.get(MODEL_AXIS, 1)  # (data, seq) SP meshes have no model axis

    def rule(leaf):
        if tp > 1 and hidden_nf and leaf.ndim >= 1 and leaf.shape[-1] == hidden_nf:
            spec = [None] * (leaf.ndim - 1) + [MODEL_AXIS]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def batch_spec_tree(batch, mesh: Mesh):
    """Shard every batch leaf on its leading axis over ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda _: sh, batch)


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, batch_spec_tree(batch, mesh))


def shard_params(params, mesh: Mesh, hidden_nf: Optional[int] = None):
    return jax.device_put(params, param_shardings(params, mesh, hidden_nf))

"""Property-conditioning utilities.

- mean/MAD normalizers per property (reference: qm9/utils.py:4-23; note
  qm9_second_half computes them from the *valid* split),
- per-node context tensors broadcast from global properties
  (reference: qm9/utils.py:56-89),
- charge-power input features for the property classifier
  (reference: qm9/utils.py:48-53).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def compute_mean_mad_from_arrays(
    data: Dict[str, np.ndarray], properties: Sequence[str]
) -> Dict[str, Dict[str, float]]:
    norms = {}
    for key in properties:
        values = np.asarray(data[key], dtype=np.float64)
        mean = float(values.mean())
        mad = float(np.abs(values - mean).mean())
        norms[key] = {"mean": mean, "mad": mad}
    return norms


def compute_mean_mad(
    splits: Dict[str, Dict[str, np.ndarray]],
    properties: Sequence[str],
    dataset_name: str,
) -> Dict[str, Dict[str, float]]:
    """qm9 uses train stats; qm9_second_half uses the valid split
    (reference: qm9/utils.py:4-10)."""
    if dataset_name == "qm9":
        return compute_mean_mad_from_arrays(splits["train"], properties)
    if dataset_name in ("qm9_second_half", "qm9_first_half"):
        return compute_mean_mad_from_arrays(splits["valid"], properties)
    raise ValueError(dataset_name)


def load_conditional_protocol(datadir: str, properties: Sequence[str],
                              dataset: str = "qm9_second_half"):
    """Shared setup for evaluating/serving conditional QM9 checkpoints:
    (splits, norms, prop_dist, nodes_dist, pad), all derived from the
    training split (second-half convention, reference
    eval_conditional_qm9.py:55-76). nodes_dist/pad come from the split's
    size histogram — NOT the canned dataset table — because the
    checkpoint only ever saw the split's sizes."""
    from collections import Counter

    from geoldm_tpu.data.qm9 import load_qm9
    from geoldm_tpu.models.distributions import (
        DistributionNodes,
        DistributionProperty,
    )

    splits, _ = load_qm9(datadir, dataset=dataset)
    norms = compute_mean_mad(splits, list(properties), dataset)
    prop_dist = DistributionProperty(
        splits["train"]["num_atoms"],
        {p: splits["train"][p] for p in properties})
    prop_dist.set_normalizer(norms)
    nodes_dist = DistributionNodes(
        dict(Counter(int(n) for n in splits["train"]["num_atoms"])))
    pad = int(np.max(splits["train"]["num_atoms"]))
    return splits, norms, prop_dist, nodes_dist, pad


def prepare_context(
    conditioning: Sequence[str],
    batch: Dict[str, np.ndarray],
    property_norms: Dict[str, Dict[str, float]],
    indicator: bool = False,
) -> np.ndarray:
    """[B, N, context_nf] per-node context from batch properties.

    Global (per-molecule) properties broadcast over nodes; per-node
    properties pass through. Masked at padding.
    ``indicator`` appends a trailing all-ones is-conditioned channel
    (models built with context_indicator=True): the classifier-free
    guidance null (all zeros, see train_step context_dropout and
    vdm.guided_eps) is then distinguishable from a mean-valued property.
    reference: qm9/utils.py:56-89."""
    node_mask = batch["node_mask"]
    b, n = node_mask.shape[0], node_mask.shape[1]
    pieces = []
    for key in conditioning:
        props = np.asarray(batch[key], dtype=np.float32)
        props = (props - property_norms[key]["mean"]) / property_norms[key]["mad"]
        if props.ndim == 1:
            assert props.shape == (b,)
            pieces.append(np.broadcast_to(props[:, None, None], (b, n, 1)))
        elif props.ndim in (2, 3):
            assert props.shape[:2] == (b, n)
            pieces.append(props[..., None] if props.ndim == 2 else props)
        else:
            raise ValueError(f"invalid property shape {props.shape}")
    if indicator:
        pieces.append(np.ones((b, n, 1), dtype=np.float32))
    context = np.concatenate(pieces, axis=2).astype(np.float32)
    return context * node_mask


def preprocess_input(
    one_hot: np.ndarray,
    charges: np.ndarray,
    charge_power: int,
    charge_scale: float,
) -> np.ndarray:
    """Charge-power node features for the classifier: one_hot x
    (charge/scale)^p for p=0..charge_power, flattened.
    reference: qm9/utils.py:48-53."""
    powers = np.arange(charge_power + 1, dtype=np.float32)
    charge_tensor = (np.asarray(charges, dtype=np.float32)[..., None] / charge_scale) ** powers
    atom_scalars = one_hot[..., None] * charge_tensor[..., None, :]
    return atom_scalars.reshape(charges.shape[:2] + (-1,)).astype(np.float32)

"""Synthetic QM9-shaped molecule batches.

Used by the test suite, the benchmark harness, and smoke training when the
real datasets are not on disk (the environment has no network egress).
Molecule sizes follow the dataset's empirical size histogram; coordinates
are CoM-centered Gaussians at roughly bond-length scale; atom types follow
the empirical type marginals, with charges set to the atomic numbers
(matching the QM9 'charges' column semantics)."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from geoldm_tpu.data.collate import build_masks, collate_molecules
from geoldm_tpu.data.datasets_config import DatasetInfo

_ATOMIC_NUMBER = {
    "H": 1, "B": 5, "C": 6, "N": 7, "O": 8, "F": 9, "Al": 13, "Si": 14,
    "P": 15, "S": 16, "Cl": 17, "As": 33, "Br": 35, "I": 53, "Hg": 80,
    "Bi": 83,
}


def atomic_numbers(info: DatasetInfo) -> np.ndarray:
    if info.atomic_numbers:
        return np.asarray(info.atomic_numbers, dtype=np.float32)
    return np.asarray([_ATOMIC_NUMBER[a] for a in info.atom_decoder], dtype=np.float32)


def synthetic_batch(
    info: DatasetInfo,
    batch_size: int,
    pad_nodes: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
    include_charges: bool = True,
    coord_scale: float = 1.7,
) -> Dict[str, np.ndarray]:
    rng = rng or np.random.default_rng(0)
    pad_nodes = pad_nodes or info.max_n_nodes

    sizes = np.array([n for n, _ in info.n_nodes_histogram])
    counts = np.array([c for _, c in info.n_nodes_histogram], dtype=np.float64)
    size_probs = counts / counts.sum()
    type_counts = np.asarray(info.atom_type_counts, dtype=np.float64)
    type_probs = type_counts / type_counts.sum()
    z = atomic_numbers(info)

    n_atoms = rng.choice(sizes, size=batch_size, p=size_probs)
    n_atoms = np.minimum(n_atoms, pad_nodes)
    positions, one_hots, charges = [], [], []
    for n in n_atoms:
        pos = rng.standard_normal((n, 3)).astype(np.float32) * coord_scale
        types = rng.choice(len(type_probs), size=n, p=type_probs)
        oh = np.eye(len(type_probs), dtype=np.float32)[types]
        positions.append(pos)
        one_hots.append(oh)
        charges.append(z[types])
    return collate_molecules(
        positions, one_hots, charges, pad_nodes, include_charges=include_charges
    )


def sampling_masks(
    info: DatasetInfo,
    batch_size: int,
    pad_nodes: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
    nodesxsample: Optional[np.ndarray] = None,
):
    """node/edge masks for generative sampling with sizes from the dataset
    histogram (reference: qm9/sampling.py:110-128)."""
    rng = rng or np.random.default_rng(0)
    pad_nodes = pad_nodes or info.max_n_nodes
    if nodesxsample is None:
        sizes = np.array([n for n, _ in info.n_nodes_histogram])
        counts = np.array([c for _, c in info.n_nodes_histogram], dtype=np.float64)
        nodesxsample = rng.choice(sizes, size=batch_size, p=counts / counts.sum())
    nodesxsample = np.minimum(np.asarray(nodesxsample), pad_nodes)
    return build_masks(nodesxsample, pad_nodes) + (nodesxsample,)

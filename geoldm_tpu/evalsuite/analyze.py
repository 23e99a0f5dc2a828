"""Molecule stability metrics and distribution diagnostics.

Vectorized numpy re-design of the reference stability analysis
(qm9/analyze.py:209-371): per-molecule bond-order matrices from the compiled
threshold tables, valence checks against allowed bonds, and aggregate
atom/molecule stability over a sample set. Histogram + divergence utilities
mirror qm9/analyze.py:24-153.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from geoldm_tpu.evalsuite import bond_analyze as ba


def check_stability(
    positions: np.ndarray,
    atom_types: np.ndarray,
    dataset_info,
    debug: bool = False,
) -> Tuple[bool, int, int]:
    """(molecule_stable, n_stable_atoms, n_atoms) for one molecule.

    reference: qm9/analyze.py:209-245. For GEOM the pair order uses the
    geom_predictor semantics (check_exists; same tables)."""
    positions = np.asarray(positions, dtype=np.float64)
    atom_types = np.asarray(atom_types, dtype=np.int64)
    assert positions.ndim == 2 and positions.shape[1] == 3
    decoder = tuple(dataset_info["atom_decoder"])

    orders = ba.pairwise_bond_orders(positions, atom_types, decoder)
    nr_bonds = orders.sum(axis=1)

    allowed = ba.allowed_bond_table(decoder)
    stable_atoms = 0
    for t, nb in zip(atom_types, nr_bonds):
        is_stable = int(nb) in allowed[int(t)]
        if not is_stable and debug:
            print(f"Invalid bonds for atom {decoder[int(t)]} with {int(nb)} bonds")
        stable_atoms += int(is_stable)
    return stable_atoms == len(atom_types), stable_atoms, len(atom_types)


def molecules_from_padded(
    x: np.ndarray, one_hot: np.ndarray, node_mask: np.ndarray
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Strip padding: [(positions [n,3], atom_types [n]), ...].

    reference: qm9/analyze.py:337-349."""
    out = []
    n_atoms = np.asarray(node_mask).reshape(len(x), -1).sum(axis=1).astype(int)
    x = np.asarray(x)
    types = np.argmax(np.asarray(one_hot), axis=-1)
    for i in range(len(x)):
        n = n_atoms[i]
        out.append((x[i, :n], types[i, :n]))
    return out


_FALLBACK_WARNED = False


def _warn_fallback_once() -> None:
    global _FALLBACK_WARNED
    if not _FALLBACK_WARNED:
        print(
            "rdkit not installed: validity/uniqueness/novelty use the "
            "pure-python valence-based fallback (canonical SMILES from "
            "the built-in writer)."
        )
        _FALLBACK_WARNED = True


def analyze_stability_for_molecules(
    molecule_list: Dict[str, np.ndarray],
    dataset_info,
    use_rdkit: Optional[bool] = None,
    datadir: str = "data",
    external_smiles=None,
) -> Tuple[Dict[str, float], Optional[tuple]]:
    """Aggregate stability (+ optional RDKit validity/uniqueness/novelty).

    molecule_list: dict with 'x' [M,N,3], 'one_hot' [M,N,S],
    'node_mask' [M,N] or [M,N,1]. external_smiles: optional SMILES list to
    use as the novelty base instead of the training set (fallback backend
    only). reference: qm9/analyze.py:323-371."""
    x = np.asarray(molecule_list["x"])
    one_hot = np.asarray(molecule_list["one_hot"])
    node_mask = np.asarray(molecule_list["node_mask"]).reshape(len(x), -1)
    n_samples = len(x)

    from geoldm_tpu.evalsuite import native

    if native.available():
        # Native C++ batch path (native/stability.cpp).
        types = np.argmax(one_hot, axis=-1)
        n_atoms_arr = node_mask.sum(axis=1).astype(np.int32)
        stable_atoms, total_atoms, mol_stable = native.check_stability_batch(
            x, types, n_atoms_arr, dataset_info
        )
        molecule_stable = int(mol_stable.sum())
        nr_stable_bonds = int(stable_atoms.sum())
        n_atoms = int(total_atoms.sum())
        processed = None
    else:
        processed = molecules_from_padded(x, one_hot, node_mask)
        molecule_stable = 0
        nr_stable_bonds = 0
        n_atoms = 0
        for pos, types in processed:
            stable, stable_bonds, total = check_stability(pos, types, dataset_info)
            molecule_stable += int(stable)
            nr_stable_bonds += stable_bonds
            n_atoms += total

    validity_dict = {
        "mol_stable": molecule_stable / float(max(n_samples, 1)),
        "atm_stable": nr_stable_bonds / float(max(n_atoms, 1)),
    }

    # use_rdkit: None = compute the validity triple with the best available
    # backend (RDKit, else the pure-python valence fallback); True = require
    # RDKit; False = skip the triple entirely.
    if use_rdkit is False:
        return validity_dict, None
    from geoldm_tpu.evalsuite import rdkit_metrics as rm

    if processed is None:
        processed = molecules_from_padded(x, one_hot, node_mask)
    if use_rdkit is True:
        metrics = rm.BasicMolecularMetrics(dataset_info, datadir=datadir)
    else:
        metrics = rm.make_molecular_metrics(dataset_info, datadir=datadir,
                                            external_smiles=external_smiles)
        if metrics.source != "rdkit":
            _warn_fallback_once()
    return validity_dict, metrics.evaluate(processed)


def analyze_node_distribution(mol_list) -> Tuple[Dict[int, int], Dict[int, int]]:
    """Histograms of molecule sizes and atom types over a processed list.

    reference: qm9/analyze.py:374-387."""
    hist_nodes = DiscreteHistogram("n_nodes")
    hist_types = DiscreteHistogram("atom_types")
    for positions, atom_types in mol_list:
        hist_nodes.add([positions.shape[0]])
        hist_types.add(list(np.asarray(atom_types).reshape(-1)))
    return hist_nodes.bins, hist_types.bins


# ---------------------------------------------------------------------------
# Histograms and divergences (reference: qm9/analyze.py:24-153)
# ---------------------------------------------------------------------------


class DiscreteHistogram:
    def __init__(self, name: str = "histogram"):
        self.name = name
        self.bins: Dict[int, int] = {}

    def add(self, elements) -> None:
        vals, counts = np.unique(np.asarray(list(elements)), return_counts=True)
        for v, c in zip(vals, counts):
            self.bins[int(v)] = self.bins.get(int(v), 0) + int(c)

    def normalize(self) -> None:
        total = float(sum(self.bins.values()))
        self.bins = {k: v / total for k, v in self.bins.items()}


class ContinuousHistogram:
    def __init__(self, num_bins: int = 100, hist_range=(0.0, 13.0), name: str = "histogram", ignore_zeros: bool = False):
        self.name = name
        self.bins = np.zeros(num_bins, dtype=np.int64)
        self.range = hist_range
        self.ignore_zeros = ignore_zeros

    def add(self, elements) -> None:
        e = np.asarray(elements, dtype=np.float64).reshape(-1)
        if self.ignore_zeros:
            e = e[e > 1e-8]
        idx = (e / self.range[1] * len(self.bins)).astype(np.int64)
        idx = np.minimum(idx, len(self.bins) - 1)
        self.bins += np.bincount(idx, minlength=len(self.bins))


def normalize_histogram(hist) -> np.ndarray:
    hist = np.asarray(hist, dtype=np.float64)
    return hist / hist.sum()


def kl_divergence(p1: np.ndarray, p2: np.ndarray) -> float:
    return float(np.sum(p1 * np.log(p1 / p2)))


def kl_divergence_sym(h1, h2) -> float:
    p1 = normalize_histogram(h1) + 1e-10
    p2 = normalize_histogram(h2) + 1e-10
    return (kl_divergence(p1, p2) + kl_divergence(p2, p1)) / 2.0


def js_divergence(h1, h2) -> float:
    p1 = normalize_histogram(h1) + 1e-10
    p2 = normalize_histogram(h2) + 1e-10
    m = (p1 + p2) / 2
    return (kl_divergence(p1, m) + kl_divergence(p2, m)) / 2


def earth_mover_distance(h1, h2) -> float:
    from scipy import stats as sp_stats

    p1 = normalize_histogram(h1)
    p2 = normalize_histogram(h2)
    return float(sp_stats.wasserstein_distance(p1, p2))


def pairwise_distance_histogram(
    x: np.ndarray, node_mask: np.ndarray, num_bins: int = 100, hist_range=(0.0, 13.0)
) -> np.ndarray:
    """Histogram of all intra-molecule pairwise distances over a batch
    (the dataset self-check of main_analyze_qm9 — qm9/analyze.py:156-205)."""
    hist = ContinuousHistogram(num_bins, hist_range, ignore_zeros=True)
    x = np.asarray(x) * np.asarray(node_mask).reshape(x.shape[0], x.shape[1], 1)
    diff = x[:, :, None, :] - x[:, None, :, :]
    dist = np.sqrt((diff * diff).sum(-1))
    hist.add(dist.reshape(-1))
    return hist.bins

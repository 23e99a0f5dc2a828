"""RDKit-based validity / uniqueness / novelty metrics (optional).

RDKit is an optional dependency (guarded import, like the reference's
qm9/analyze.py:1-6). When absent, ``RDKIT_AVAILABLE`` is False and the
stability metrics still run; the rdkit triple is skipped.

reference: qm9/rdkit_functions.py:76-188 (BasicMolecularMetrics,
build_molecule / build_xae_molecule), :11-67 (training-set SMILES cache).
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional, Sequence

import numpy as np

from geoldm_tpu.evalsuite import bond_analyze as ba

try:
    from rdkit import Chem

    RDKIT_AVAILABLE = True
except ModuleNotFoundError:
    Chem = None
    RDKIT_AVAILABLE = False


def build_xae_molecule(positions: np.ndarray, atom_types: np.ndarray, dataset_info):
    """(X [N], A [N,N] bool, E [N,N] int) bond graph from coordinates.

    Bond orders come from the vectorized threshold tables; GEOM caps orders
    at 1 (reference: rdkit_functions.py:158-188, geom_predictor with
    limit_bonds_to_one)."""
    atom_types = np.asarray(atom_types, dtype=np.int64)
    orders = ba.pairwise_bond_orders(
        np.asarray(positions, dtype=np.float64), atom_types,
        tuple(dataset_info["atom_decoder"]),
    )
    if dataset_info["name"] == "geom":
        orders = np.minimum(orders, 1)
    # Directed graph: keep the lower triangle only.
    e = np.tril(orders, k=-1).astype(np.int64)
    a = e > 0
    return atom_types, a, e


_BOND_TYPES = None


def _bond_types():
    global _BOND_TYPES
    if _BOND_TYPES is None:
        _BOND_TYPES = [
            None,
            Chem.rdchem.BondType.SINGLE,
            Chem.rdchem.BondType.DOUBLE,
            Chem.rdchem.BondType.TRIPLE,
            Chem.rdchem.BondType.AROMATIC,
        ]
    return _BOND_TYPES


def build_molecule(positions, atom_types, dataset_info):
    """RWMol from inferred bonds (reference: rdkit_functions.py:144-155)."""
    assert RDKIT_AVAILABLE, "rdkit not installed"
    decoder = dataset_info["atom_decoder"]
    x, a, e = build_xae_molecule(positions, atom_types, dataset_info)
    mol = Chem.RWMol()
    for t in x:
        mol.AddAtom(Chem.Atom(decoder[int(t)]))
    rows, cols = np.nonzero(a)
    for i, j in zip(rows, cols):
        mol.AddBond(int(i), int(j), _bond_types()[int(e[i, j])])
    return mol


def mol2smiles(mol) -> Optional[str]:
    try:
        Chem.SanitizeMol(mol)
    except ValueError:
        return None
    return Chem.MolToSmiles(mol)


def compute_dataset_smiles(dataset_info, datadir: str) -> List[str]:
    """SMILES of the training set, for novelty (reference:
    rdkit_functions.py:11-44)."""
    from geoldm_tpu.data.qm9 import load_qm9

    name = dataset_info["name"]
    splits, _ = load_qm9(datadir, dataset=name, remove_h=not dataset_info["with_h"])
    train = splits["train"]
    smiles = []
    for i in range(len(train["num_atoms"])):
        n = int(train["num_atoms"][i])
        pos = train["positions"][i, :n]
        types = np.argmax(train["one_hot"][i, :n], axis=-1)
        mol = build_molecule(pos, types, dataset_info)
        s = mol2smiles(mol)
        if s is not None:
            smiles.append(s)
    return smiles


def retrieve_qm9_smiles(dataset_info, datadir: str = "data", cache_dir: str = "data/cache"):
    """Cached training-set SMILES (reference: rdkit_functions.py:47-67)."""
    suffix = "" if dataset_info["with_h"] else "_noH"
    path = os.path.join(cache_dir, f"{dataset_info['name']}{suffix}_smiles.pickle")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    os.makedirs(cache_dir, exist_ok=True)
    smiles = compute_dataset_smiles(dataset_info, datadir)
    with open(path, "wb") as f:
        pickle.dump(smiles, f)
    return smiles


class BasicMolecularMetrics:
    """Validity (largest fragment), uniqueness, novelty.

    reference: qm9/rdkit_functions.py:76-133."""

    def __init__(self, dataset_info, dataset_smiles_list=None, datadir: str = "data"):
        assert RDKIT_AVAILABLE, "rdkit not installed"
        self.dataset_info = dataset_info
        self.dataset_smiles_list = dataset_smiles_list
        if dataset_smiles_list is None and "qm9" in dataset_info["name"]:
            try:
                self.dataset_smiles_list = retrieve_qm9_smiles(dataset_info, datadir)
            except Exception:
                self.dataset_smiles_list = None

    def compute_validity(self, generated: Sequence[tuple]):
        valid = []
        for positions, atom_types in generated:
            mol = build_molecule(positions, atom_types, self.dataset_info)
            smiles = mol2smiles(mol)
            if smiles is not None:
                frags = Chem.rdmolops.GetMolFrags(mol, asMols=True)
                largest = max(frags, default=mol, key=lambda m: m.GetNumAtoms())
                valid.append(mol2smiles(largest))
        return valid, len(valid) / len(generated)

    def compute_uniqueness(self, valid: List[str]):
        return list(set(valid)), len(set(valid)) / len(valid)

    def compute_novelty(self, unique: List[str]):
        novel = [s for s in unique if s not in self.dataset_smiles_list]
        return novel, len(novel) / len(unique)

    def evaluate(self, generated: Sequence[tuple]):
        valid, validity = self.compute_validity(generated)
        if validity > 0:
            unique, uniqueness = self.compute_uniqueness(valid)
            if self.dataset_smiles_list is not None:
                _, novelty = self.compute_novelty(unique)
            else:
                novelty = 0.0
        else:
            unique, uniqueness, novelty = None, 0.0, 0.0
        return [validity, uniqueness, novelty], unique

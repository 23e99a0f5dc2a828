"""Validity/uniqueness/novelty metrics: BasicMolecularMetrics exercised via
a minimal stub ``rdkit`` module (build_molecule -> sanitize -> dedup ->
novelty, reference qm9/rdkit_functions.py:76-142), and the pure-python
valence-based fallback on geometries with known bond structure."""

import importlib
import sys
import types

import numpy as np
import pytest

from geoldm_tpu.data.datasets_config import get_dataset_info

INFO = get_dataset_info("qm9")

# QM9 decoder order is (H, C, N, O, F): indices below.
H, C, N, O, F = 0, 1, 2, 3, 4

# Known geometries (Angstrom; bond thresholds: O-H 96+10 pm, H-H 74+10 pm).
WATER = (
    np.array([[0.0, 0.0, 0.0], [0.96, 0.0, 0.0], [0.0, 0.96, 0.0]]),
    np.array([O, H, H]),
)
# Same molecule, permuted atom order and rigidly moved.
WATER_PERM = (
    np.array([[2.0, 2.96, 0.0], [2.0, 2.0, 0.0], [2.96, 2.0, 0.0]]),
    np.array([H, O, H]),
)
H2 = (np.array([[0.0, 0.0, 0.0], [0.74, 0.0, 0.0]]), np.array([H, H]))
# Over-valent oxygen: three H within bonding distance of O.
BAD_O3H = (
    np.array(
        [[0.0, 0.0, 0.0], [0.96, 0.0, 0.0], [-0.96, 0.0, 0.0], [0.0, 0.96, 0.0]]
    ),
    np.array([O, H, H, H]),
)

GENERATED = [WATER, WATER_PERM, H2, BAD_O3H]

MAX_VALENCE = {"H": 1, "C": 4, "N": 3, "O": 2, "F": 1}


def _make_stub_rdkit():
    """Minimal rdkit surface used by rdkit_metrics: RWMol/Atom/AddBond,
    SanitizeMol (ValueError on over-valence, RDKit's failure mode),
    MolToSmiles (permutation-invariant signature), GetMolFrags."""
    rdkit = types.ModuleType("rdkit")
    chem = types.ModuleType("rdkit.Chem")
    rdchem = types.ModuleType("rdkit.Chem.rdchem")
    rdmolops = types.ModuleType("rdkit.Chem.rdmolops")

    class BondType:
        SINGLE, DOUBLE, TRIPLE, AROMATIC = 1, 2, 3, 12

    class Atom:
        def __init__(self, symbol):
            self.symbol = symbol

    class RWMol:
        def __init__(self):
            self.atoms = []
            self.bonds = []

        def AddAtom(self, atom):
            self.atoms.append(atom.symbol)
            return len(self.atoms) - 1

        def AddBond(self, i, j, order):
            self.bonds.append((int(i), int(j), int(order)))

        def GetNumAtoms(self):
            return len(self.atoms)

    def SanitizeMol(mol):
        valence = [0] * len(mol.atoms)
        for i, j, o in mol.bonds:
            valence[i] += o
            valence[j] += o
        for sym, v in zip(mol.atoms, valence):
            if v > MAX_VALENCE[sym]:
                raise ValueError(f"over-valence {sym}: {v}")

    def MolToSmiles(mol):
        sigs = []
        for idx, sym in enumerate(mol.atoms):
            orders = sorted(o for (i, j, o) in mol.bonds if idx in (i, j))
            sigs.append(f"{sym}{orders}")
        return ";".join(sorted(sigs))

    def GetMolFrags(mol, asMols=False):
        assert asMols
        n = len(mol.atoms)
        parent = list(range(n))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for i, j, _ in mol.bonds:
            parent[find(i)] = find(j)
        frags = {}
        remap = {}
        for i in range(n):
            r = find(i)
            frag = frags.setdefault(r, RWMol())
            remap[i] = frag.AddAtom(Atom(mol.atoms[i]))
        for i, j, o in mol.bonds:
            frags[find(i)].AddBond(remap[i], remap[j], o)
        return list(frags.values())

    rdchem.BondType = BondType
    chem.rdchem = rdchem
    chem.rdmolops = rdmolops
    chem.Atom = Atom
    chem.RWMol = RWMol
    chem.SanitizeMol = SanitizeMol
    chem.MolToSmiles = MolToSmiles
    rdmolops.GetMolFrags = GetMolFrags
    rdkit.Chem = chem
    return {
        "rdkit": rdkit,
        "rdkit.Chem": chem,
        "rdkit.Chem.rdchem": rdchem,
        "rdkit.Chem.rdmolops": rdmolops,
    }


@pytest.fixture
def rm_with_stub():
    saved = {k: sys.modules.get(k) for k in
             ("rdkit", "rdkit.Chem", "rdkit.Chem.rdchem", "rdkit.Chem.rdmolops")}
    sys.modules.update(_make_stub_rdkit())
    import geoldm_tpu.evalsuite.rdkit_metrics as rm

    rm = importlib.reload(rm)
    assert rm.RDKIT_AVAILABLE
    yield rm
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v
    importlib.reload(rm)


def test_basic_metrics_via_stub_chem(rm_with_stub):
    rm = rm_with_stub
    # Training set = {water}: novelty should count only H2.
    train_mol = rm.build_molecule(*WATER, INFO)
    train_smiles = rm.mol2smiles(train_mol)
    assert train_smiles is not None

    metrics = rm.BasicMolecularMetrics(INFO, dataset_smiles_list=[train_smiles])
    (validity, uniqueness, novelty), unique = metrics.evaluate(GENERATED)
    assert validity == pytest.approx(3 / 4)   # BAD_O3H fails sanitize
    assert uniqueness == pytest.approx(2 / 3)  # two waters collapse
    assert novelty == pytest.approx(1 / 2)     # H2 is novel, water is not
    assert len(unique) == 2


def test_stub_sanitize_rejects_overvalence(rm_with_stub):
    rm = rm_with_stub
    assert rm.mol2smiles(rm.build_molecule(*BAD_O3H, INFO)) is None


def test_fallback_metrics_triple():
    from geoldm_tpu.evalsuite import rdkit_metrics as rm

    train_key = rm.molecule_fallback_smiles(*WATER, INFO)
    assert train_key == "[H][O][H]"  # readable canonical SMILES, not a hash
    metrics = rm.FallbackMolecularMetrics(INFO, dataset_keys_list=[train_key])
    assert metrics.source == "valence-fallback"
    (validity, uniqueness, novelty), unique = metrics.evaluate(GENERATED)
    assert validity == pytest.approx(3 / 4)
    assert uniqueness == pytest.approx(2 / 3)
    assert novelty == pytest.approx(1 / 2)


def test_fallback_metrics_external_novelty_base():
    """An externally supplied SMILES list (standard implicit-H form) is
    re-canonicalized and used as the novelty base: water written as the
    bare-atom string 'O' must match our geometry-derived water."""
    from geoldm_tpu.evalsuite import rdkit_metrics as rm

    metrics = rm.FallbackMolecularMetrics(INFO, external_smiles=["O"])
    (validity, uniqueness, novelty), unique = metrics.evaluate(GENERATED)
    assert validity == pytest.approx(3 / 4)
    assert novelty == pytest.approx(1 / 2)  # H2 novel, water known


def test_fallback_smiles_matches_graph_key_partition():
    """The SMILES identity partitions molecules exactly like the WL keys."""
    from geoldm_tpu.evalsuite import rdkit_metrics as rm

    mols = [WATER, WATER_PERM, H2]
    smiles = [rm.molecule_fallback_smiles(*m, INFO) for m in mols]
    keys = [rm.molecule_graph_key(*m, INFO) for m in mols]
    same_s = [[a == b for a in smiles] for b in smiles]
    same_k = [[a == b for a in keys] for b in keys]
    assert same_s == same_k


def test_fallback_key_invariances():
    from geoldm_tpu.evalsuite import rdkit_metrics as rm

    k1 = rm.molecule_graph_key(*WATER, INFO)
    k2 = rm.molecule_graph_key(*WATER_PERM, INFO)
    k3 = rm.molecule_graph_key(*H2, INFO)
    assert k1 == k2           # permutation + rigid-motion invariant
    assert k1 != k3           # different molecules differ
    assert rm.molecule_graph_key(*BAD_O3H, INFO) is None  # over-valence


def test_fallback_largest_fragment_key():
    """Disconnected molecule: identity comes from the largest fragment only
    (mirrors the reference's largest-fragment SMILES)."""
    from geoldm_tpu.evalsuite import rdkit_metrics as rm

    water_and_far_h = (
        np.concatenate([WATER[0], np.array([[50.0, 50.0, 50.0]])]),
        np.concatenate([WATER[1], np.array([H])]),
    )
    assert rm.molecule_graph_key(*water_and_far_h, INFO) == rm.molecule_graph_key(*WATER, INFO)


def test_analyze_reports_triple_without_rdkit(tmp_path):
    """analyze_stability_for_molecules always returns a validity triple even
    without rdkit installed (the fallback path)."""
    from geoldm_tpu.evalsuite import analyze as an

    n, pad = 4, 6
    x = np.zeros((n, pad, 3), dtype=np.float32)
    one_hot = np.zeros((n, pad, 5), dtype=np.float32)
    node_mask = np.zeros((n, pad), dtype=np.float32)
    for i, (pos, types) in enumerate(GENERATED):
        m = len(types)
        x[i, :m] = pos
        one_hot[i, np.arange(m), types] = 1.0
        node_mask[i, :m] = 1.0
    # tmp datadir: hermetic — no training-set cache, so novelty must be 0.
    validity, triple = an.analyze_stability_for_molecules(
        {"x": x, "one_hot": one_hot, "node_mask": node_mask}, INFO,
        datadir=str(tmp_path),
    )
    assert triple is not None
    (v, u, nov), unique = triple
    assert v == pytest.approx(3 / 4)
    assert u == pytest.approx(2 / 3)
    assert nov == 0.0  # no training-set cache available here
    # Explicit opt-out still skips the triple.
    _, none_triple = an.analyze_stability_for_molecules(
        {"x": x, "one_hot": one_hot, "node_mask": node_mask}, INFO, use_rdkit=False
    )
    assert none_triple is None

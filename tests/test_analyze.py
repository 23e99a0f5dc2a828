"""Stability/bond-analysis tests, including parity with the reference
implementation when available."""

import os
import sys

import numpy as np
import pytest

from geoldm_tpu.data.datasets_config import get_dataset_info
from geoldm_tpu.evalsuite import analyze as an
from geoldm_tpu.evalsuite import bond_analyze as ba

QM9 = get_dataset_info("qm9")
GEOM = get_dataset_info("geom")

# Real CH4 geometry (GDB9 molecule 1).
METHANE_POS = np.array(
    [
        [-0.0126981359, 1.0858041578, 0.0080009958],
        [0.002150416, -0.0060313176, 0.0019761204],
        [1.0117308433, 1.4637511618, 0.0002765748],
        [-0.540815069, 1.4475266138, -0.8766437152],
        [-0.5238136345, 1.4379326443, 0.9063972942],
    ]
)
METHANE_TYPES = np.array([1, 0, 0, 0, 0])  # C H H H H in qm9 vocabulary


def test_bond_tables_consistent():
    ba.check_consistency_bond_dictionaries()


def test_methane_stable():
    stable, n_stable, n = an.check_stability(METHANE_POS, METHANE_TYPES, QM9)
    assert stable and n_stable == 5 and n == 5


def test_stretched_methane_unstable():
    stable, n_stable, n = an.check_stability(METHANE_POS * 3.0, METHANE_TYPES, QM9)
    assert not stable
    assert n_stable < 5


def test_scalar_get_bond_order():
    # C-C single bond at 1.54 A, double at 1.34, triple at 1.20.
    assert ba.get_bond_order("C", "C", 1.54) == 1
    assert ba.get_bond_order("C", "C", 1.30) == 2
    assert ba.get_bond_order("C", "C", 1.15) == 3
    assert ba.get_bond_order("C", "C", 2.0) == 0
    # H-H pair has no double bond entry.
    assert ba.get_bond_order("H", "H", 0.74 / 100 * 100 / 100) in (0, 1)
    assert ba.get_bond_order("H", "C", 1.09) == 1


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(0)
    decoder = tuple(QM9.atom_decoder)
    for _ in range(20):
        n = rng.integers(3, 12)
        pos = rng.standard_normal((n, 3)) * 1.2
        types = rng.integers(0, len(decoder), size=n)
        orders = ba.pairwise_bond_orders(pos, types, decoder)
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                d = float(np.linalg.norm(pos[i] - pos[j]))
                expected = ba.get_bond_order(decoder[types[i]], decoder[types[j]], d)
                assert orders[i, j] == expected, (i, j, d)


def test_vectorized_matches_scalar_geom():
    rng = np.random.default_rng(1)
    decoder = tuple(GEOM.atom_decoder)
    for _ in range(10):
        n = rng.integers(3, 10)
        pos = rng.standard_normal((n, 3)) * 1.5
        types = rng.integers(0, len(decoder), size=n)
        orders = ba.pairwise_bond_orders(pos, types, decoder)
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                d = float(np.linalg.norm(pos[i] - pos[j]))
                pair = sorted([types[i], types[j]])
                expected = ba.geom_predictor(
                    (decoder[pair[0]], decoder[pair[1]]), d
                )
                assert orders[i, j] == expected, (decoder[types[i]], decoder[types[j]], d)


def test_analyze_stability_for_molecules():
    x = np.stack([METHANE_POS, METHANE_POS * 3.0])
    one_hot = np.zeros((2, 5, 5), dtype=np.float32)
    for i in range(5):
        one_hot[:, i, METHANE_TYPES[i]] = 1.0
    node_mask = np.ones((2, 5, 1), dtype=np.float32)
    validity, rdkit_metrics = an.analyze_stability_for_molecules(
        {"x": x, "one_hot": one_hot, "node_mask": node_mask}, QM9, use_rdkit=False
    )
    assert validity["mol_stable"] == 0.5
    assert validity["atm_stable"] == pytest.approx((5 + 1) / 10, abs=0.31)


def test_divergences():
    h1 = [10, 20, 30, 40]
    h2 = [10, 20, 30, 40]
    assert an.kl_divergence_sym(h1, h2) == pytest.approx(0.0, abs=1e-6)
    assert an.js_divergence(h1, h2) == pytest.approx(0.0, abs=1e-6)
    h3 = [40, 30, 20, 10]
    assert an.js_divergence(h1, h3) > 0


@pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="no reference")
def test_check_stability_parity_with_reference():
    """Same verdicts as the reference implementation on random molecules."""
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from qm9.analyze import check_stability as ref_check_stability

    rng = np.random.default_rng(2)
    ref_info = {"atom_decoder": list(QM9.atom_decoder), "name": "qm9"}
    for _ in range(15):
        n = int(rng.integers(3, 15))
        pos = rng.standard_normal((n, 3)).astype(np.float64) * 1.1
        types = rng.integers(0, 5, size=n)
        ours = an.check_stability(pos, types, QM9)
        theirs = ref_check_stability(pos, types, ref_info)
        assert ours[0] == bool(theirs[0])
        assert ours[1] == int(theirs[1])
        assert ours[2] == int(theirs[2])


def test_native_stability_matches_numpy():
    """The C++ batch analyzer agrees with the numpy path on random batches."""
    from geoldm_tpu.evalsuite import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(3)
    m, n_max = 40, 15
    x = np.zeros((m, n_max, 3), dtype=np.float32)
    types = np.zeros((m, n_max), dtype=np.int64)
    n_atoms = rng.integers(3, n_max + 1, size=m).astype(np.int32)
    for i, n in enumerate(n_atoms):
        x[i, :n] = rng.standard_normal((n, 3)) * 1.1
        types[i, :n] = rng.integers(0, 5, size=n)
    stable_atoms, total_atoms, mol_stable = native.check_stability_batch(
        x, types, n_atoms, QM9
    )
    for i in range(m):
        ref = an.check_stability(x[i, : n_atoms[i]], types[i, : n_atoms[i]], QM9)
        assert bool(mol_stable[i]) == ref[0]
        assert int(stable_atoms[i]) == ref[1]
        assert int(total_atoms[i]) == ref[2]


def test_analyze_uses_native_consistently():
    """analyze_stability_for_molecules gives identical metrics with the
    native path and the numpy path."""
    from geoldm_tpu.evalsuite import native

    rng = np.random.default_rng(4)
    m, n_max = 25, 12
    one_hot = np.eye(5, dtype=np.float32)[rng.integers(0, 5, (m, n_max))]
    x = rng.standard_normal((m, n_max, 3)).astype(np.float32)
    node_mask = np.zeros((m, n_max), dtype=np.float32)
    for i in range(m):
        node_mask[i, : rng.integers(3, n_max + 1)] = 1.0
    x *= node_mask[..., None]
    one_hot *= node_mask[..., None]
    mols = {"x": x, "one_hot": one_hot, "node_mask": node_mask}

    v_numpy, _ = an.analyze_stability_for_molecules(mols, QM9, use_rdkit=False)
    if native.available():
        # Force-disable native to get the numpy result, then compare.
        lib = native._lib
        try:
            native._lib = None
            native._build_failed = True
            v_plain, _ = an.analyze_stability_for_molecules(mols, QM9, use_rdkit=False)
        finally:
            native._lib = lib
            native._build_failed = False
        assert v_numpy == v_plain

"""QM9 data pipeline tests (no network: pieces are exercised on synthetic
records and fabricated npz splits)."""

import io
import os

import numpy as np
import pytest

from geoldm_tpu.data import qm9 as Q


XYZ_RECORD = """5
gdb 1\t157.7118\t157.70997\t157.70699\t0.\t13.21\t-0.3877\t0.1171\t0.5048\t35.3641\t0.044749\t-40.47893\t-40.476062\t-40.475117\t-40.498597\t6.469
C\t-0.0126981359\t1.0858041578\t0.0080009958\t-0.535689
H\t0.002150416\t-0.0060313176\t0.0019761204\t0.133921
H\t1.0117308433\t1.4637511618\t0.0002765748\t0.133922
H\t-0.540815069\t1.4475266138\t-0.8766437152\t0.133923
H\t-0.5238136345\t1.4379326443\t0.9063972942\t0.133923
1341.307\t1341.3284\t1341.365\t1562.6731\t1562.7453\t3038.3205\t3151.6034\t3151.6788\t3151.7078
InChI=1S/CH4/h1H4\tInChI=1S/CH4/h1H4
"""


def test_parse_xyz_gdb9():
    mol = Q.parse_xyz_gdb9(XYZ_RECORD.splitlines())
    assert mol["num_atoms"] == 5
    np.testing.assert_array_equal(mol["charges"], [6, 1, 1, 1, 1])
    assert mol["positions"].shape == (5, 3)
    assert mol["index"] == 1
    assert mol["mu"] == 0.0
    assert mol["alpha"] == 13.21
    assert mol["Cv"] == 6.469
    assert mol["omega1"] == pytest.approx(3151.7078)


def test_parse_xyz_scientific_notation():
    rec = XYZ_RECORD.replace("-0.0126981359", "-1.23*^-5")
    mol = Q.parse_xyz_gdb9(rec.splitlines())
    assert mol["positions"][0, 0] == pytest.approx(-1.23e-5)


def test_generate_splits(tmp_path):
    # Fabricate an exclusion file with exactly 3054 entries (1-based ids).
    p = tmp_path / "uncharacterized.txt"
    lines = ["header line with no ints\n"]
    for i in range(Q.N_EXCLUDED):
        lines.append(f"{i * 40 + 1} something\n")
    p.write_text("".join(lines))
    splits = Q.generate_splits(str(p))
    n_mols = Q.N_GDB9 - Q.N_EXCLUDED
    assert len(splits["train"]) == Q.N_TRAIN
    assert len(splits["test"]) == int(0.1 * n_mols)
    assert len(splits["valid"]) == n_mols - Q.N_TRAIN - int(0.1 * n_mols)
    all_idx = np.concatenate(list(splits.values()))
    assert len(np.unique(all_idx)) == n_mols
    # Excluded ids never appear in any split.
    excluded = set(i * 40 for i in range(Q.N_EXCLUDED))
    assert not excluded.intersection(all_idx.tolist())
    # Split is deterministic (seed 0).
    splits2 = Q.generate_splits(str(p))
    np.testing.assert_array_equal(splits["train"], splits2["train"])


def test_parse_thermo(tmp_path):
    p = tmp_path / "atomref.txt"
    p.write_text(
        "# header\n"
        "H 0.1 -0.5 -0.49 -0.49 -0.51 2.98\n"
        "C 0.2 -37.8 -37.84 -37.84 -37.86 2.98\n"
        "garbage line\n"
    )
    thermo = Q.parse_thermo(str(p))
    assert thermo["zpve"][1] == pytest.approx(0.1)
    assert thermo["U0"][6] == pytest.approx(-37.8)
    assert thermo["Cv"][1] == pytest.approx(2.98)


def test_add_thermo_targets():
    data = {
        "charges": np.array([[6, 1, 1, 0], [8, 1, 0, 0]]),
        "U0": np.array([-40.0, -76.0]),
    }
    thermo = {"U0": {1: -0.5, 6: -37.8, 8: -75.0}}
    out = Q.add_thermo_targets(dict(data), thermo)
    np.testing.assert_allclose(out["U0_thermo"], [-37.8 - 1.0, -75.0 - 0.5])


def _fake_prepared(tmp_path, n_mols=64, n_max=9, seed=0):
    rng = np.random.default_rng(seed)
    paths = {}
    for split, m in [("train", n_mols), ("valid", 16), ("test", 16)]:
        num_atoms = rng.integers(3, n_max + 1, size=m)
        charges = np.zeros((m, n_max), dtype=np.int64)
        positions = rng.standard_normal((m, n_max, 3)).astype(np.float32)
        for i, n in enumerate(num_atoms):
            charges[i, :n] = rng.choice([1, 6, 7, 8, 9], size=n)
            positions[i, n:] = 0
        d = {
            "num_atoms": num_atoms,
            "charges": charges,
            "positions": positions,
            "U0": rng.standard_normal(m),
            "U0_thermo": rng.standard_normal(m),
            "alpha": rng.standard_normal(m),
            "mu": np.abs(rng.standard_normal(m)),
        }
        path = tmp_path / "qm9" / f"{split}.npz"
        os.makedirs(path.parent, exist_ok=True)
        np.savez_compressed(path, **d)
        paths[split] = str(path)
    return paths


def test_load_qm9_and_loader(tmp_path):
    _fake_prepared(tmp_path)
    splits, charge_scale = Q.load_qm9(str(tmp_path))
    assert charge_scale == 9.0
    train = splits["train"]
    assert train["one_hot"].shape[-1] == 5
    # one_hot matches charges.
    species = np.array([1, 6, 7, 8, 9])
    i, j = 0, 0
    assert train["one_hot"][i, j].sum() == (1 if train["charges"][i, j] > 0 else 0)
    # eV conversion applied to U0 (thermo subtracted first).
    loader = Q.QM9Loader(
        train, batch_size=8, pad_nodes=12, shuffle=True, properties=("alpha",)
    )
    batches = list(loader)
    assert len(batches) == len(train["num_atoms"]) // 8
    b = batches[0]
    assert b["x"].shape == (8, 12, 3)
    assert b["h_cat"].shape == (8, 12, 5)
    assert b["h_int"].shape == (8, 12, 1)
    assert b["edge_mask"].shape == (8, 12, 12, 1)
    assert b["alpha"].shape == (8,)
    # CoM-centered and masked.
    np.testing.assert_allclose(b["x"].sum(axis=1), 0.0, atol=1e-4)
    assert np.abs(b["x"] * (1 - b["node_mask"])).max() == 0.0
    # h_int equals charges on real nodes.
    assert np.all((b["h_int"][..., 0] > 0) == (b["node_mask"][..., 0] > 0))


def test_load_qm9_second_half_deterministic(tmp_path):
    _fake_prepared(tmp_path)
    s1, _ = Q.load_qm9(str(tmp_path), dataset="qm9_second_half")
    s2, _ = Q.load_qm9(str(tmp_path), dataset="qm9_second_half")
    np.testing.assert_array_equal(s1["train"]["num_atoms"], s2["train"]["num_atoms"])
    full, _ = Q.load_qm9(str(tmp_path))
    assert len(s1["train"]["num_atoms"]) == len(full["train"]["num_atoms"]) // 2
    # First and second halves are disjoint row sets.
    h1, _ = Q.load_qm9(str(tmp_path), dataset="qm9_first_half")
    assert len(h1["train"]["num_atoms"]) + len(s1["train"]["num_atoms"]) == len(
        full["train"]["num_atoms"]
    )


def test_remove_h(tmp_path):
    _fake_prepared(tmp_path)
    splits, charge_scale = Q.load_qm9(str(tmp_path), remove_h=True)
    train = splits["train"]
    assert np.all(train["charges"][train["charges"] > 0] > 1)
    assert train["one_hot"].shape[-1] == 4  # C, N, O, F
    # num_atoms consistent with charges.
    np.testing.assert_array_equal(
        train["num_atoms"], (train["charges"] > 0).sum(axis=1)
    )


def test_filter_atoms(tmp_path):
    _fake_prepared(tmp_path)
    splits, _ = Q.load_qm9(str(tmp_path))
    out = Q.filter_atoms(splits, 5)
    for d in out.values():
        assert np.all(d["num_atoms"] == 5)

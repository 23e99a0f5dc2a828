"""Tests for the pure-python canonical SMILES writer/parser
(geoldm_tpu/evalsuite/smiles.py): permutation invariance, round trips,
known molecules, organic-subset + aromatic parsing with kekulization."""

import numpy as np
import pytest

from geoldm_tpu.evalsuite import smiles as sm


def _mol(bonds, symbols, charges=None):
    n = len(symbols)
    orders = np.zeros((n, n), dtype=np.int64)
    for i, j, o in bonds:
        orders[i, j] = orders[j, i] = o
    return symbols, orders, charges


def _permute(symbols, orders, charges, perm):
    perm = np.asarray(perm)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return (
        [symbols[i] for i in perm],
        orders[np.ix_(perm, perm)],
        None if charges is None else [charges[i] for i in perm],
    )


METHANE = _mol([(0, 1, 1), (0, 2, 1), (0, 3, 1), (0, 4, 1)],
               ["C", "H", "H", "H", "H"])
WATER = _mol([(0, 1, 1), (0, 2, 1)], ["O", "H", "H"])
CO2 = _mol([(0, 1, 2), (0, 2, 2)], ["C", "O", "O"])
HCN = _mol([(0, 1, 1), (1, 2, 3)], ["H", "C", "N"])
CYCLOPROPANE = _mol(
    [(0, 1, 1), (1, 2, 1), (2, 0, 1)]
    + [(i, 3 + 2 * i, 1) for i in range(3)]
    + [(i, 4 + 2 * i, 1) for i in range(3)],
    ["C"] * 3 + ["H"] * 6,
)


def test_known_molecules_write():
    assert sm.canonical_smiles(*METHANE) == "[C]([H])([H])([H])[H]"
    assert sm.canonical_smiles(*WATER) == "[H][O][H]"
    assert sm.canonical_smiles(*CO2) == "[C](=[O])=[O]"
    assert sm.canonical_smiles(*HCN) == "[C]([H])#[N]"


@pytest.mark.parametrize("mol", [METHANE, WATER, CO2, HCN, CYCLOPROPANE])
def test_permutation_invariance_known(mol):
    base = sm.canonical_smiles(*mol)
    rng = np.random.default_rng(0)
    n = len(mol[0])
    for _ in range(10):
        perm = rng.permutation(n)
        assert sm.canonical_smiles(*_permute(*mol, perm)) == base


def test_permutation_invariance_fuzz_random_graphs():
    """Random connected multigraph-free molecules: the canonical string is
    identical under atom relabeling."""
    rng = np.random.default_rng(1)
    elements = ["C", "N", "O", "H", "F"]
    for trial in range(25):
        n = int(rng.integers(2, 12))
        symbols = [elements[i] for i in rng.integers(0, len(elements), n)]
        orders = np.zeros((n, n), dtype=np.int64)
        # random spanning tree keeps it connected
        for j in range(1, n):
            i = int(rng.integers(0, j))
            orders[i, j] = orders[j, i] = int(rng.integers(1, 4))
        # a few extra ring edges
        for _ in range(int(rng.integers(0, 3))):
            i, j = rng.integers(0, n, 2)
            if i != j and orders[i, j] == 0:
                orders[i, j] = orders[j, i] = 1
        base = sm.canonical_smiles(symbols, orders)
        for _ in range(4):
            perm = rng.permutation(n)
            p = _permute(symbols, orders, None, perm)
            assert sm.canonical_smiles(*p) == base, f"trial {trial}"


@pytest.mark.parametrize("mol", [METHANE, WATER, CO2, HCN, CYCLOPROPANE])
def test_write_parse_roundtrip(mol):
    s = sm.canonical_smiles(*mol)
    symbols, orders, charges = sm.parse_smiles(s)
    assert sorted(symbols) == sorted(mol[0])
    assert sm.canonical_smiles(symbols, orders, charges) == s


def test_parse_implicit_hydrogens():
    symbols, orders, charges = sm.parse_smiles("CCO")  # ethanol
    assert sorted(symbols) == sorted(["C", "C", "O"] + ["H"] * 6)
    # heavy skeleton: C-C-O single bonds
    heavy = [i for i, s in enumerate(symbols) if s != "H"]
    assert orders[np.ix_(heavy, heavy)].sum() == 4  # two single bonds x2 (sym)


def test_parse_bracket_h_and_charge():
    symbols, orders, charges = sm.parse_smiles("[NH4+]")
    assert sorted(symbols) == ["H", "H", "H", "H", "N"]
    assert charges[symbols.index("N")] == 1
    symbols, _, charges = sm.parse_smiles("[O-]C")  # methoxide
    assert charges[symbols.index("O")] == -1
    assert symbols.count("H") == 3


def test_parse_ring_closure():
    symbols, orders, _ = sm.parse_smiles("C1CCCCC1")  # cyclohexane
    heavy = [i for i, s in enumerate(symbols) if s == "C"]
    assert len(heavy) == 6 and symbols.count("H") == 12
    sub = orders[np.ix_(heavy, heavy)]
    assert (sub.sum(1) == 2).all()  # every ring carbon has 2 ring bonds


def test_parse_benzene_kekulized():
    symbols, orders, _ = sm.parse_smiles("c1ccccc1")
    heavy = [i for i, s in enumerate(symbols) if s == "C"]
    assert len(heavy) == 6 and symbols.count("H") == 6
    sub = orders[np.ix_(heavy, heavy)]
    # alternating single/double: each aromatic C has ring order sum 3
    assert (sub.sum(1) == 3).all()
    assert (sub == 2).sum() == 6  # 3 double bonds, symmetric storage


def test_parse_pyridine_and_pyrrole():
    symbols, orders, _ = sm.parse_smiles("c1ccncc1")  # pyridine
    n_idx = symbols.index("N")
    assert orders[n_idx].sum() == 3  # one double + one single ring bond
    assert symbols.count("H") == 5
    symbols, orders, _ = sm.parse_smiles("c1cc[nH]c1")  # pyrrole
    n_idx = symbols.index("N")
    assert orders[n_idx].sum() == 3  # two single ring bonds + H
    assert symbols.count("H") == 5


def test_aromatic_recanonicalize_matches_explicit_kekule():
    """The aromatic and explicit-Kekule forms of benzene canonicalize to the
    same string."""
    a = sm.recanonicalize("c1ccccc1")
    b = sm.recanonicalize("C1=CC=CC=C1")
    assert a == b


def test_recanonicalize_is_idempotent():
    for s in ["CCO", "c1ccccc1", "C(=O)O", "N#Cc1ccccc1"]:
        c = sm.recanonicalize(s)
        assert sm.recanonicalize(c) == c


def test_isomers_get_distinct_strings():
    # n-butane vs isobutane skeletons (explicit H via parser)
    a = sm.recanonicalize("CCCC")
    b = sm.recanonicalize("CC(C)C")
    assert a != b
    # ethanol vs dimethyl ether
    assert sm.recanonicalize("CCO") != sm.recanonicalize("COC")


def test_unsupported_constructs_raise():
    for bad in ["C.C", "C/C=C/C", "[13C]", "C@H", "C1CC"]:
        with pytest.raises(sm.SmilesError):
            sm.parse_smiles(bad)


def test_fused_aromatics_and_real_molecules():
    """Fused aromatic systems and a drug-like heterocycle kekulize and
    re-canonicalize idempotently (the matching pruner keeps this fast)."""
    for s in [
        "c1ccc2ccccc2c1",              # naphthalene
        "c1ccc2cc3ccccc3cc2c1",        # anthracene
        "c1cc2ccc3cccc4ccc(c1)c2c34",  # pyrene
        "Cn1cnc2c1c(=O)n(C)c(=O)n2C",  # caffeine
        "O=C(O)c1ccccc1O",             # salicylic acid
    ]:
        c = sm.recanonicalize(s)
        assert sm.recanonicalize(c) == c


def test_ring_token_above_nine():
    # 10 fused ring closures force %nn tokens; parse our own emission.
    # build a long cycle: 30-atom ring
    n = 30
    bonds = [(i, (i + 1) % n, 1) for i in range(n)]
    symbols = ["C"] * n
    s = sm.canonical_smiles(*_mol(bonds, symbols))
    symbols2, orders2, _ = sm.parse_smiles(s)
    assert sm.canonical_smiles(symbols2, orders2) == s


def _carbon_cycle(n):
    orders = np.zeros((n, n), dtype=np.int64)
    for i in range(n):
        orders[i, (i + 1) % n] = orders[(i + 1) % n, i] = 1
    return ["C"] * n, orders


def test_budget_exhaustion_falls_back_to_invariant_wl_key():
    """When the branch budget runs out mid-tie-breaking, WHICH branches
    were explored depends on input atom order — so instead of a possibly
    ordering-dependent minimum, the writer returns a permutation-invariant
    WL graph key (distinctively marked, rejected by the parser)."""
    symbols, orders = _carbon_cycle(12)
    base = sm.canonical_smiles(symbols, orders, branch_budget=2)
    assert base.startswith("*WL:") and base.endswith("*")
    rng = np.random.default_rng(7)
    for _ in range(8):
        perm = rng.permutation(12)
        p = _permute(symbols, orders, None, perm)
        assert sm.canonical_smiles(*p, branch_budget=2) == base
    with pytest.raises(sm.SmilesError):
        sm.parse_smiles(base)
    # Different graphs must not collide on the fallback key.
    sym11, ord11 = _carbon_cycle(11)
    assert sm.canonical_smiles(sym11, ord11, branch_budget=2) != base


def test_default_budget_yields_real_smiles_on_symmetric_ring():
    """The default budget canonicalizes a plain carbon ring fully — the WL
    fallback only engages on pathological symmetry + tiny budgets."""
    symbols, orders = _carbon_cycle(12)
    s = sm.canonical_smiles(symbols, orders)
    assert not s.startswith("*WL:")
    got_sym, got_ord, _ = sm.parse_smiles(s)
    assert sorted(got_sym) == symbols
    assert int(got_ord.sum()) == int(orders.sum())

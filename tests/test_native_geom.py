"""Native C++ GEOM extractor == the Python reference implementation.

Synthetic crude-msgpack dumps (multiple stream chunks, extra keys to
skip, int-typed coordinates, ties in energies, hydrogens) are extracted
by both paths; the packed npy, counts npy, and smiles file must match
exactly."""

import os

import numpy as np
import pytest

import msgpack

from geoldm_tpu.data import native_geom
from geoldm_tpu.data.geom import extract_conformers

pytestmark = pytest.mark.skipif(
    not native_geom.available(), reason="native toolchain unavailable"
)


def _fake_dump(path, n_chunks=2, mols_per_chunk=3, seed=0):
    rng = np.random.default_rng(seed)
    with open(path, "wb") as f:
        for c in range(n_chunks):
            chunk = {}
            for m in range(mols_per_chunk):
                smiles = f"C{c}N{m}" + "O" * m
                confs = []
                n_conf = int(rng.integers(2, 6))
                for k in range(n_conf):
                    n = int(rng.integers(3, 9))
                    z = rng.choice([1, 1, 6, 7, 8, 16], size=n)
                    xyz = [
                        # ints sometimes (msgpack packs python ints compactly
                        # — the parser must accept mixed number types).
                        [int(z[i])] + [
                            float(v) if i % 2 else int(round(v))
                            for v in rng.standard_normal(3) * 3
                        ]
                        for i in range(n)
                    ]
                    confs.append({
                        # k in {1, 2} share energy -5.0: a genuine tie, so
                        # the stable orderings of both paths are exercised.
                        "totalenergy": float(rng.standard_normal())
                        if k not in (1, 2) else -5.0,
                        "xyz": xyz,
                        "geom_id": int(rng.integers(1e6)),  # skipped key
                        "junk": {"nested": [1, 2.5, None, True, "s"]},
                    })
                chunk[smiles] = {
                    "conformers": confs,
                    "uniqueconfs": n_conf,       # skipped
                    "charge": 0,                 # skipped
                    "extras": [b"binary", None],  # skipped (bin/nil)
                }
            f.write(msgpack.packb(chunk))
    return path


@pytest.mark.parametrize("remove_h,k", [(False, 2), (True, 3), (False, 100)])
def test_native_matches_python(tmp_path, remove_h, k):
    py_dir = tmp_path / "py"
    nat_dir = tmp_path / "nat"
    for d in (py_dir, nat_dir):
        os.makedirs(d)
        _fake_dump(d / "drugs_crude.msgpack")

    out_py = extract_conformers(str(py_dir), conformations=k, remove_h=remove_h)
    out_nat = native_geom.extract_conformers_native(
        str(nat_dir), conformations=k, remove_h=remove_h
    )

    a, b = np.load(out_py), np.load(out_nat)
    np.testing.assert_array_equal(a, b)
    tag = f"{'no_h_' if remove_h else ''}{k}"
    np.testing.assert_array_equal(
        np.load(py_dir / f"geom_drugs_n_{tag}.npy"),
        np.load(nat_dir / f"geom_drugs_n_{tag}.npy"),
    )
    assert (py_dir / "geom_drugs_smiles.txt").read_text() == (
        nat_dir / "geom_drugs_smiles.txt"
    ).read_text()


def test_cli_uses_native_with_fallback(tmp_path, capsys):
    from geoldm_tpu.cli import build_geom_dataset

    _fake_dump(tmp_path / "drugs_crude.msgpack")
    build_geom_dataset.main([
        "--data_dir", str(tmp_path), "--conformations", "2",
    ])
    out = capsys.readouterr().out
    assert "native extractor:" in out
    assert (tmp_path / "geom_drugs_2.npy").exists()

    # Forced Python path produces the identical file.
    native_npy = np.load(tmp_path / "geom_drugs_2.npy")
    build_geom_dataset.main([
        "--data_dir", str(tmp_path), "--conformations", "2", "--no_native",
    ])
    np.testing.assert_array_equal(
        np.load(tmp_path / "geom_drugs_2.npy"), native_npy
    )

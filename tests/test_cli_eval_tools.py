"""Smoke tests for the eval/visualization/classifier CLIs on tiny models
and fabricated data."""

import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from geoldm_tpu.data.datasets_config import get_dataset_info
from geoldm_tpu.models import factory
from geoldm_tpu.utils import checkpoint as ckpt

INFO = get_dataset_info("qm9")


def _fake_qm9(tmp_path, n_mols=48, n_max=9, seed=0):
    rng = np.random.default_rng(seed)
    for split, m in [("train", n_mols), ("valid", 16), ("test", 16)]:
        num_atoms = rng.integers(4, n_max + 1, size=m)
        charges = np.zeros((m, n_max), dtype=np.int64)
        positions = np.zeros((m, n_max, 3), dtype=np.float32)
        for i, n in enumerate(num_atoms):
            charges[i, :n] = rng.choice([1, 6, 7, 8, 9], size=n)
            positions[i, :n] = rng.standard_normal((n, 3))
        d = {
            "num_atoms": num_atoms,
            "charges": charges,
            "positions": positions,
            "alpha": rng.standard_normal(m) * 8 + 75,
        }
        path = tmp_path / "qm9" / f"{split}.npz"
        os.makedirs(path.parent, exist_ok=True)
        np.savez_compressed(path, **d)


def _fake_generator_ckpt(tmp_path, context_node_nf=0):
    cfg = factory.make_latent_diffusion_config(
        INFO, nf=16, n_layers=1, latent_nf=1, diffusion_steps=6,
        context_node_nf=context_node_nf,
    )
    params = factory.init_params(jax.random.key(0), cfg)
    path = str(tmp_path / "gen")
    ckpt.save_checkpoint(path, {"params": params, "ema_params": params}, cfg,
                         name="best")
    return path


def _fake_classifier_ckpt(tmp_path, nf=16, n_layers=2):
    from geoldm_tpu.models import classifier as clf

    params = clf.classifier_init(jax.random.key(0), 5, nf, n_layers, True, False)
    path = str(tmp_path / "cls")
    ckpt.save_checkpoint(path, params, name="best")
    return path


def test_eval_sample_cli(tmp_path):
    from geoldm_tpu.cli import eval_sample

    gen = _fake_generator_ckpt(tmp_path)
    out = str(tmp_path / "viz")
    eval_sample.main([
        "--model_path", gen, "--outdir", out,
        "--n_samples", "4", "--n_stable", "1", "--n_chains", "1",
        "--keep_frames", "3", "--n_tries", "1", "--n_steps", "3",
    ])
    assert os.path.isdir(os.path.join(out, "molecules"))
    assert any(f.endswith(".gif") for f in os.listdir(os.path.join(out, "chain_0")))


def test_eval_conditional_cli_tasks(tmp_path, monkeypatch):
    from geoldm_tpu.cli import eval_conditional_qm9
    from geoldm_tpu.data import qm9 as qm9_mod

    _fake_qm9(tmp_path)
    gen = _fake_generator_ckpt(tmp_path, context_node_nf=1)
    cls = _fake_classifier_ckpt(tmp_path)

    base = [
        "--generators_path", gen, "--classifiers_path", cls,
        "--property", "alpha", "--iterations", "1", "--batch_size", "4",
        "--datadir", str(tmp_path), "--classifier_nf", "16",
        "--classifier_layers", "2", "--debug_break",
    ]
    eval_conditional_qm9.main(base + ["--task", "qm9"])
    eval_conditional_qm9.main(base + ["--task", "naive"])
    eval_conditional_qm9.main(base + ["--task", "edm"])


def test_main_qm9_prop_cli(tmp_path):
    from geoldm_tpu.cli import main_qm9_prop

    _fake_qm9(tmp_path, n_mols=32)
    main_qm9_prop.main([
        "--datadir", str(tmp_path), "--epochs", "1", "--batch_size", "8",
        "--nf", "16", "--n_layers", "1", "--property", "alpha",
        "--outf", str(tmp_path / "out"), "--exp_name", "cls_smoke",
    ])
    assert os.path.exists(tmp_path / "out" / "cls_smoke" / "losess.json")


def test_check_data_cli(tmp_path, capsys):
    from geoldm_tpu.cli import check_data

    _fake_qm9(tmp_path)
    check_data.main(["--datadir", str(tmp_path), "--split", "train"])
    out = capsys.readouterr().out
    assert "mol_stable" in out
    assert "size histogram" in out


def test_build_geom_dataset_cli(tmp_path):
    msgpack = pytest.importorskip("msgpack")
    from geoldm_tpu.cli import build_geom_dataset as bg

    rng = np.random.default_rng(0)
    drugs = {}
    for i in range(3):
        confs = []
        for c in range(4):
            n = int(rng.integers(4, 9))
            xyz = np.hstack([
                rng.choice([1.0, 6.0, 7.0, 8.0], size=(n, 1)),
                rng.standard_normal((n, 3)),
            ])
            confs.append({"totalenergy": float(rng.standard_normal()),
                          "xyz": xyz.tolist()})
        drugs[f"SMILES_{i}"] = {"conformers": confs}
    os.makedirs(tmp_path / "geom", exist_ok=True)
    with open(tmp_path / "geom" / "drugs_crude.msgpack", "wb") as f:
        f.write(msgpack.packb(drugs))

    bg.main(["--data_dir", str(tmp_path / "geom"), "--conformations", "2"])
    import numpy as _np

    arr = _np.load(tmp_path / "geom" / "geom_drugs_2.npy")
    assert arr.shape[1] == 5
    assert len(_np.unique(arr[:, 0])) == 6  # 3 molecules x 2 conformers
    smiles = (tmp_path / "geom" / "geom_drugs_smiles.txt").read_text().split()
    assert smiles == [f"SMILES_{i}" for i in range(3)]


def test_eval_analyze_geom_nll(tmp_path):
    """eval_analyze --dataset geom: the NLL phase loads GEOM conformer
    splits (split_dict stacking) and produces finite val/test NLLs — the
    reference evaluates whatever dataset the checkpoint trained on, so the
    GEOM branch must work end to end."""
    from geoldm_tpu.cli import eval_analyze
    from geoldm_tpu.data import geom as geom_mod

    # Small fabricated conformer file in the build_geom_dataset layout.
    rng = np.random.default_rng(0)
    rows = []
    for mid in range(60):
        n = int(rng.integers(5, 30))
        z = rng.choice([1, 6, 7, 8, 16], size=n).astype(float)
        rows.append(np.hstack([
            np.full((n, 1), mid, dtype=float), z[:, None],
            rng.standard_normal((n, 3)) * 2,
        ]))
    np.save(tmp_path / "geom_drugs_30.npy", np.vstack(rows))

    geom_info = get_dataset_info("geom")
    cfg = factory.make_latent_diffusion_config(
        geom_info, nf=16, n_layers=1, latent_nf=2, diffusion_steps=6,
        include_charges=False,
    )
    params = factory.init_params(jax.random.key(0), cfg)
    model_path = str(tmp_path / "geom_gen")
    ckpt.save_checkpoint(model_path, {"params": params, "ema_params": params},
                         cfg, name="best")

    eval_analyze.main([
        "--model_path", model_path,
        "--n_samples", "4",
        "--batch_size_gen", "4",
        "--batch_size_nll", "4",
        "--dataset", "geom",
        "--datadir", str(tmp_path),
        "--n_test_passes", "1",
    ])
    log = (tmp_path / "geom_gen" / "eval_log.txt").read_text()
    assert "nll_test" in log
    nll_lines = [l for l in log.splitlines() if l.startswith("nll_")]
    for l in nll_lines:
        assert np.isfinite(float(l.split()[1])), l

    # split_dict invariants: one-hot rows sum to 1 on real atoms.
    _, val_l, _ = geom_mod.load_split_data(str(tmp_path / "geom_drugs_30.npy"))
    d = geom_mod.split_dict(val_l, geom_info)
    mask = (np.arange(d["positions"].shape[1])[None] < d["num_atoms"][:, None])
    np.testing.assert_allclose(d["one_hot"].sum(-1), mask.astype(np.float32))

"""End-to-end CLI smoke tests on fabricated data: train (main_qm9) ->
checkpoint -> eval_analyze, classifier training, GEOM loader + training."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


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
            "mu": np.abs(rng.standard_normal(m)),
            "U0": rng.standard_normal(m),
            "U0_thermo": rng.standard_normal(m),
        }
        path = tmp_path / "qm9" / f"{split}.npz"
        os.makedirs(path.parent, exist_ok=True)
        np.savez_compressed(path, **d)


def test_main_qm9_train_and_eval(tmp_path):
    from geoldm_tpu.cli import eval_analyze, main_qm9

    _fake_qm9(tmp_path)
    outdir = tmp_path / "out"
    argv = [
        "--exp_name", "smoke",
        "--datadir", str(tmp_path),
        "--outdir", str(outdir),
        "--train_diffusion", "--trainable_ae",
        "--n_epochs", "1",
        "--test_epochs", "1",
        "--batch_size", "8",
        "--nf", "16",
        "--n_layers", "1",
        "--diffusion_steps", "6",
        "--n_stability_samples", "8",
        "--eval_n_steps", "3",
        "--no_wandb",
        "--ema_decay", "0.9",
        "--break_train_epoch", "True",
    ]
    main_qm9.main(argv)

    run_dir = outdir / "smoke"
    assert (run_dir / "config.json").exists()
    assert (run_dir / "best").exists()
    assert (run_dir / "metrics.jsonl").exists()
    lines = [json.loads(l) for l in open(run_dir / "metrics.jsonl")]
    assert any("nll_val" in l for l in lines)
    assert any("mol_stable" in l for l in lines)

    # Eval the checkpoint (tiny sample count, NLL included).
    eval_analyze.main([
        "--model_path", str(run_dir),
        "--n_samples", "6",
        "--batch_size_gen", "6",
        "--datadir", str(tmp_path),
        "--n_test_passes", "1",
    ])
    log = (run_dir / "eval_log.txt").read_text()
    assert "mol_stable" in log and "nll_test" in log


def test_main_qm9_conditional_smoke(tmp_path):
    from geoldm_tpu.cli import main_qm9

    _fake_qm9(tmp_path)
    outdir = tmp_path / "out"
    main_qm9.main([
        "--exp_name", "cond_smoke",
        "--datadir", str(tmp_path),
        "--outdir", str(outdir),
        "--train_diffusion",
        "--conditioning", "alpha",
        "--n_epochs", "1",
        "--test_epochs", "5",
        "--batch_size", "8",
        "--nf", "16",
        "--n_layers", "1",
        "--diffusion_steps", "6",
        "--no_wandb",
        "--break_train_epoch", "True",
    ])
    assert (outdir / "cond_smoke" / "metrics.jsonl").exists()


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from geoldm_tpu.config import TrainConfig
    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.models import factory
    from geoldm_tpu.train.train_step import create_train_state
    from geoldm_tpu.utils import checkpoint as ckpt

    info = get_dataset_info("qm9")
    cfg = factory.make_latent_diffusion_config(info, nf=8, n_layers=1,
                                               diffusion_steps=4)
    state, _ = create_train_state(jax.random.key(0), cfg, TrainConfig())
    ckpt.save_checkpoint(str(tmp_path / "ck"), state, cfg, name="latest")

    state2, _ = create_train_state(jax.random.key(1), cfg, TrainConfig())
    restored = ckpt.load_checkpoint(str(tmp_path / "ck"), template=state2, name="latest")
    a = np.asarray(state.params["dynamics"]["egnn"]["embedding"]["w"])
    b = np.asarray(restored.params["dynamics"]["egnn"]["embedding"]["w"])
    np.testing.assert_array_equal(a, b)
    cfg2 = ckpt.load_config(str(tmp_path / "ck"))
    assert cfg2 == cfg


def _fake_geom_npy(tmp_path, n_mols=60, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    atomic = [1, 6, 7, 8, 16]
    for mid in range(n_mols):
        n = int(rng.integers(5, 40))
        z = rng.choice(atomic, size=n)
        pos = rng.standard_normal((n, 3)) * 2
        rows.append(
            np.hstack([
                np.full((n, 1), mid, dtype=float),
                z[:, None].astype(float),
                pos,
            ])
        )
    arr = np.vstack(rows)
    path = tmp_path / "geom_drugs_30.npy"
    np.save(path, arr)
    return str(path)


def test_geom_load_and_loader(tmp_path):
    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.data.geom import GeomLoader, load_split_data

    path = _fake_geom_npy(tmp_path)
    train, val, test = load_split_data(path)
    assert len(train) + len(val) + len(test) == 60
    # Deterministic (the generated permutation is saved).
    train2, _, _ = load_split_data(path)
    np.testing.assert_array_equal(train[0], train2[0])

    info = get_dataset_info("geom")
    loader = GeomLoader(train, info, batch_size=8, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == len(loader)
    for b in batches:
        n, pad = b["x"].shape[0], b["x"].shape[1]
        assert pad in loader.buckets
        assert b["h_cat"].shape == (n, pad, 16)
        assert np.all(b["n_atoms"] <= pad)
        # one-hot valid at real nodes.
        np.testing.assert_allclose(
            b["h_cat"].sum(-1), b["node_mask"][..., 0], atol=0
        )
        np.testing.assert_allclose(b["x"].sum(axis=1), 0.0, atol=1e-4)


def test_geom_filter_size(tmp_path):
    from geoldm_tpu.data.geom import load_split_data

    path = _fake_geom_npy(tmp_path)
    train, val, test = load_split_data(path, filter_size=20)
    for m in train + val + test:
        assert m.shape[0] <= 20


def test_main_geom_drugs_train_smoke(tmp_path):
    from geoldm_tpu.cli import main_geom_drugs

    _fake_geom_npy(tmp_path, n_mols=80)
    outdir = tmp_path / "out"
    main_geom_drugs.main([
        "--exp_name", "geom_smoke",
        "--datadir", str(tmp_path),
        "--conformations", "30",
        "--outdir", str(outdir),
        "--train_diffusion", "--trainable_ae",
        "--n_epochs", "1",
        "--test_epochs", "5",
        "--batch_size", "8",
        "--nf", "16",
        "--n_layers", "1",
        "--latent_nf", "2",
        "--diffusion_steps", "6",
        "--n_stability_samples", "8",
        "--no_wandb",
        "--break_train_epoch", "True",
        "--save_model", "False",
    ])
    assert (outdir / "geom_smoke" / "metrics.jsonl").exists()


def test_main_geom_drugs_sp_training(tmp_path):
    """--sp 2: sequence-parallel training through the GEOM CLI on the
    virtual mesh (dp=4 x sp=2) — the trained epoch + NLL eval must complete
    with finite metrics. This is the CLI wiring for SP training (the
    numerical parity of the SP step itself is tests/test_sp.py)."""
    from geoldm_tpu.cli import main_geom_drugs

    _fake_geom_npy(tmp_path, n_mols=80)
    outdir = tmp_path / "out"
    main_geom_drugs.main([
        "--exp_name", "geom_sp",
        "--datadir", str(tmp_path),
        "--conformations", "30",
        "--outdir", str(outdir),
        "--train_diffusion", "--trainable_ae",
        "--sp", "2",
        "--n_epochs", "1",
        "--test_epochs", "1",
        "--batch_size", "8",
        "--nf", "16",
        "--n_layers", "1",
        "--latent_nf", "2",
        "--diffusion_steps", "6",
        "--n_stability_samples", "8",
        "--no_wandb",
        "--break_train_epoch", "True",
        "--save_model", "False",
    ])
    metrics_file = outdir / "geom_sp" / "metrics.jsonl"
    assert metrics_file.exists()
    rows = [json.loads(l) for l in metrics_file.read_text().splitlines()]
    losses = [r["train_loss_epoch"] for r in rows if "train_loss_epoch" in r]
    nlls = [r["nll_val"] for r in rows if "nll_val" in r]
    assert losses and np.isfinite(losses[-1])
    assert nlls and np.isfinite(nlls[-1])


def test_main_qm9_learned_schedule_vlb(tmp_path):
    """--diffusion_noise_schedule learned --diffusion_loss_type vlb through
    the full CLI: the GammaNetwork trains inside the fused step and the
    sampler runs with the learned schedule (reference allows learned only
    with vlb, en_diffusion.py:269-271)."""
    from geoldm_tpu.cli import main_qm9

    _fake_qm9(tmp_path)
    outdir = tmp_path / "out"
    main_qm9.main([
        "--exp_name", "learned_smoke",
        "--datadir", str(tmp_path),
        "--outdir", str(outdir),
        "--train_diffusion", "--trainable_ae",
        "--diffusion_noise_schedule", "learned",
        "--diffusion_loss_type", "vlb",
        "--n_epochs", "1",
        "--test_epochs", "1",
        "--batch_size", "8",
        "--nf", "16",
        "--n_layers", "1",
        "--diffusion_steps", "6",
        "--n_stability_samples", "8",
        "--no_wandb",
        "--break_train_epoch", "True",
        "--save_model", "False",
    ])
    metrics_file = outdir / "learned_smoke" / "metrics.jsonl"
    rows = [json.loads(l) for l in metrics_file.read_text().splitlines()]
    nlls = [r["nll_val"] for r in rows if "nll_val" in r]
    assert nlls and np.isfinite(nlls[-1])


def test_main_qm9_second_half_with_visualize(tmp_path):
    """qm9_second_half protocol (norms from the valid split) + the
    visualize-at-test-epoch branch (chain gif + molecule grid)."""
    from geoldm_tpu.cli import main_qm9

    _fake_qm9(tmp_path, n_mols=64)
    outdir = tmp_path / "out"
    main_qm9.main([
        "--exp_name", "half_smoke",
        "--datadir", str(tmp_path),
        "--dataset", "qm9_second_half",
        "--outdir", str(outdir),
        "--train_diffusion",
        "--conditioning", "alpha",
        "--n_epochs", "1",
        "--test_epochs", "1",
        "--batch_size", "8",
        "--nf", "16",
        "--n_layers", "1",
        "--diffusion_steps", "6",
        "--n_stability_samples", "8",
        "--no_wandb",
        "--break_train_epoch", "True",
        "--visualize", "True",
        "--save_model", "False",
    ])
    run_dir = outdir / "half_smoke"
    assert (run_dir / "metrics.jsonl").exists()
    epoch_dir = run_dir / "epoch_0"
    assert (epoch_dir / "chain").exists()
    assert any(f.endswith(".gif") for f in os.listdir(epoch_dir / "chain"))
    assert (epoch_dir / "molecules").exists()


def test_two_stage_ae_path_protocol(tmp_path):
    """Reference two-stage protocol: train the VAE first, then train the
    latent diffusion with --ae_path loading the first stage
    (reference: qm9/models.py:103-128)."""
    from geoldm_tpu.cli import main_qm9

    _fake_qm9(tmp_path)
    outdir = tmp_path / "out"
    common = [
        "--datadir", str(tmp_path), "--outdir", str(outdir),
        "--n_epochs", "1", "--test_epochs", "1", "--batch_size", "8",
        "--nf", "16", "--n_layers", "1", "--diffusion_steps", "6",
        "--n_stability_samples", "8", "--no_wandb",
        "--break_train_epoch", "True",
    ]
    # Stage 1: VAE.
    main_qm9.main(["--exp_name", "ae_stage"] + common)
    ae_dir = outdir / "ae_stage"
    assert (ae_dir / "best").exists()

    # Stage 2: latent diffusion with the pre-trained first stage.
    main_qm9.main([
        "--exp_name", "ldm_stage", "--train_diffusion",
        "--ae_path", str(ae_dir),
    ] + common)
    assert (outdir / "ldm_stage" / "metrics.jsonl").exists()

    # The loaded VAE weights must equal the stage-1 checkpoint.
    import jax

    from geoldm_tpu.models import factory
    from geoldm_tpu.utils import checkpoint as ckpt

    ae_cfg = ckpt.load_config(str(ae_dir))
    vae_template = factory.init_params(jax.random.key(0), ae_cfg)
    saved = ckpt.load_checkpoint(
        str(ae_dir), template={"params": vae_template, "ema_params": vae_template},
        name="best",
    )
    ldm_cfg = ckpt.load_config(str(outdir / "ldm_stage"))
    ldm_template = factory.init_params(jax.random.key(1), ldm_cfg)
    ldm_state = ckpt.load_checkpoint(
        str(outdir / "ldm_stage"),
        template={"params": ldm_template, "ema_params": ldm_template},
        name="best",
    )
    a = np.asarray(saved["ema_params"]["encoder"]["egnn"]["embedding"]["w"])
    b = np.asarray(ldm_state["params"]["vae"]["encoder"]["egnn"]["embedding"]["w"])
    np.testing.assert_array_equal(a, b)


def test_resume_training(tmp_path):
    """--resume restores the full TrainState (params/opt/EMA/step) and the
    checkpoint's config wins over CLI flags."""
    from geoldm_tpu.cli import main_qm9

    _fake_qm9(tmp_path)
    outdir = tmp_path / "out"
    common = [
        "--exp_name", "resume_smoke",
        "--datadir", str(tmp_path), "--outdir", str(outdir),
        "--train_diffusion",
        "--test_epochs", "1", "--batch_size", "8",
        "--nf", "16", "--n_layers", "1", "--diffusion_steps", "6",
        "--n_stability_samples", "8", "--no_wandb",
        "--break_train_epoch", "True",
    ]
    main_qm9.main(common + ["--n_epochs", "1"])
    run_dir = outdir / "resume_smoke"
    assert (run_dir / "latest").exists()

    # Resume for one more epoch; pass a DIFFERENT nf to confirm the
    # checkpoint config overrides the CLI.
    main_qm9.main(common + [
        "--n_epochs", "2", "--start_epoch", "1",
        "--resume", str(run_dir), "--nf", "32",
    ])
    lines = [json.loads(l) for l in open(run_dir / "metrics.jsonl")]
    steps = [l["_step"] for l in lines if "_step" in l]
    assert 1 in steps  # epoch-1 metrics logged after resume

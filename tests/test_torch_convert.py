"""torch->geoldm-tpu checkpoint converter: a reference-initialized
EnLatentDiffusion state dict round-trips through the converter CLI into a
checkpoint that (a) carries exactly the weights the golden-parity transfer
produces and (b) eval_analyze can evaluate directly.

reference checkpoint format: utils.py:20-26 (torch.save state_dict),
main_qm9.py:283-298 (args.pickle + generative_model_ema.npy)."""

import argparse
import os
import pickle
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
if not os.path.isdir("/root/reference"):
    pytest.skip("reference repo not available", allow_module_level=True)
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

import jax  # noqa: E402

from egnn.models import EGNN_decoder_QM9, EGNN_dynamics_QM9, EGNN_encoder_QM9  # noqa: E402
from equivariant_diffusion.en_diffusion import (  # noqa: E402
    EnHierarchicalVAE,
    EnLatentDiffusion,
)

from geoldm_tpu.data.datasets_config import get_dataset_info  # noqa: E402
from tests.parity_utils import (  # noqa: E402
    decoder_params_from_torch,
    dynamics_params_from_torch,
    encoder_params_from_torch,
)

INFO = get_dataset_info("qm9")
NF, LAYERS, T, LATENT_NF = 16, 2, 10, 2


def _build_reference_ldm():
    torch.manual_seed(4)
    in_node_nf = 6
    enc = EGNN_encoder_QM9(
        in_node_nf=in_node_nf, context_node_nf=0, out_node_nf=LATENT_NF,
        n_dims=3, hidden_nf=NF, n_layers=1, attention=True, tanh=True,
        norm_constant=1.0, inv_sublayers=1, sin_embedding=False,
        normalization_factor=1.0, aggregation_method="sum", include_charges=True,
    )
    dec = EGNN_decoder_QM9(
        in_node_nf=LATENT_NF, context_node_nf=0, out_node_nf=in_node_nf,
        n_dims=3, hidden_nf=NF, n_layers=LAYERS, attention=True, tanh=True,
        norm_constant=1.0, inv_sublayers=1, sin_embedding=False,
        normalization_factor=1.0, aggregation_method="sum", include_charges=True,
    )
    vae = EnHierarchicalVAE(
        encoder=enc, decoder=dec, in_node_nf=in_node_nf, n_dims=3,
        latent_node_nf=LATENT_NF, kl_weight=0.01, norm_values=(1, 4, 10),
        include_charges=True,
    )
    dyn = EGNN_dynamics_QM9(
        in_node_nf=LATENT_NF + 1, context_node_nf=0, n_dims=3, hidden_nf=NF,
        n_layers=LAYERS, attention=True, tanh=True, norm_constant=1.0,
        inv_sublayers=1, sin_embedding=False, normalization_factor=1.0,
        aggregation_method="sum", condition_time=True,
    )
    ldm = EnLatentDiffusion(
        vae=vae, trainable_ae=True, dynamics=dyn, in_node_nf=LATENT_NF,
        n_dims=3, timesteps=T, noise_schedule="polynomial_2",
        noise_precision=1e-5, loss_type="l2", norm_values=(1.0, 4.0, 10.0),
        include_charges=True,
    )
    return ldm, enc, dec, dyn


def _reference_args():
    return argparse.Namespace(
        dataset="qm9", remove_h=False, include_charges=True, condition_time=True,
        context_node_nf=0, nf=NF, n_layers=LAYERS, latent_nf=LATENT_NF,
        kl_weight=0.01, trainable_ae=True, attention=True, tanh=True,
        norm_constant=1.0, inv_sublayers=1, sin_embedding=False,
        normalization_factor=1.0, aggregation_method="sum", train_diffusion=True,
        diffusion_steps=T, diffusion_noise_schedule="polynomial_2",
        diffusion_noise_precision=1e-5, diffusion_loss_type="l2",
        normalize_factors=(1.0, 4.0, 10.0), model="egnn_dynamics",
    )


def _write_reference_checkpoint(tmp_path, state_dict):
    os.makedirs(tmp_path, exist_ok=True)
    with open(os.path.join(tmp_path, "args.pickle"), "wb") as f:
        pickle.dump(_reference_args(), f)
    torch.save(state_dict, os.path.join(tmp_path, "generative_model_ema.npy"))


def test_converter_roundtrip_and_eval(tmp_path):
    from geoldm_tpu.cli import convert_torch_checkpoint, eval_analyze

    ldm, enc, dec, dyn = _build_reference_ldm()
    src = str(tmp_path / "torch_ckpt")
    # DataParallel-style prefix must be stripped too.
    sd = {f"module.{k}": v for k, v in ldm.state_dict().items()}
    _write_reference_checkpoint(src, sd)

    out = str(tmp_path / "converted")
    convert_torch_checkpoint.main(["--torch_path", src, "--out", out])
    assert os.path.exists(os.path.join(out, "config.json"))

    # (a) the converted weights equal the module-based golden transfer.
    from geoldm_tpu.utils import checkpoint as ckpt
    from geoldm_tpu.models import factory

    model_cfg = ckpt.load_config(out)
    template = {"params": factory.init_params(jax.random.key(0), model_cfg)}
    template["ema_params"] = template["params"]
    state = ckpt.load_checkpoint(out, template=template, name="best")

    expected = {
        "dynamics": dynamics_params_from_torch(dyn, LAYERS, 1, True),
        "vae": {
            "encoder": encoder_params_from_torch(enc, 1, 1, True),
            "decoder": decoder_params_from_torch(dec, LAYERS, 1, True),
        },
    }
    got = jax.tree_util.tree_leaves_with_path(state["ema_params"])
    want = jax.tree_util.tree_leaves_with_path(expected)
    assert len(got) == len(want)
    for (pg, g), (pw, w) in zip(got, want):
        assert pg == pw
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      err_msg=jax.tree_util.keystr(pg))

    # (b) eval_analyze runs end-to-end on the converted checkpoint.
    eval_analyze.main([
        "--model_path", out, "--n_samples", "4", "--batch_size_gen", "4",
        "--skip_nll",
    ])
    log = open(os.path.join(out, "eval_log.txt")).read()
    assert "mol_stable" in log and "validity" in log


def test_export_roundtrip_strict_load(tmp_path):
    """Reverse direction: a jax checkpoint exports back to the reference
    layout such that (a) args.pickle round-trips through
    model_config_from_reference_args to the identical ModelConfig and
    (b) a freshly built reference EnLatentDiffusion loads the exported
    state dict with strict=True and every tensor matches the original."""
    from geoldm_tpu.cli import convert_torch_checkpoint, export_torch_checkpoint
    from geoldm_tpu.utils import checkpoint as ckpt
    from geoldm_tpu.utils.torch_convert import model_config_from_reference_args

    ldm, _, _, _ = _build_reference_ldm()
    src = str(tmp_path / "torch_ckpt")
    _write_reference_checkpoint(src, ldm.state_dict())

    mid = str(tmp_path / "jax_ckpt")
    convert_torch_checkpoint.main(["--torch_path", src, "--out", mid])
    back = str(tmp_path / "torch_again")
    export_torch_checkpoint.main(["--model_path", mid, "--out", back])

    with open(os.path.join(back, "args.pickle"), "rb") as f:
        ns = pickle.load(f)
    assert model_config_from_reference_args(ns, INFO) == ckpt.load_config(mid)

    # the pickle alone drives the upstream model builder (qm9/models.py:103)
    from configs.datasets_config import get_dataset_info as ref_get_info
    from qm9.models import get_latent_diffusion

    upstream, _, _ = get_latent_diffusion(
        ns, torch.device("cpu"), ref_get_info(ns.dataset, ns.remove_h), None)
    upstream.load_state_dict(
        torch.load(os.path.join(back, "generative_model_ema.npy"),
                   weights_only=True),
        strict=True)

    fresh, _, _, _ = _build_reference_ldm()
    for fname in ("generative_model.npy", "generative_model_ema.npy"):
        sd = torch.load(os.path.join(back, fname), weights_only=True)
        fresh.load_state_dict(sd, strict=True)  # raises on any key mismatch
        orig = ldm.state_dict()
        assert set(sd) == set(orig)
        for k, v in fresh.state_dict().items():
            if k == "gamma.gamma" or k.endswith("buffer"):
                # non-trainable: regenerated schedule table / dummy buffer
                np.testing.assert_allclose(
                    v.numpy(), orig[k].numpy(), atol=1e-6, err_msg=k)
            else:
                np.testing.assert_array_equal(
                    v.numpy(), orig[k].numpy(), err_msg=k)


def test_load_checkpoint_mismatch_is_readable(tmp_path):
    """A template from a different config fails with a message naming the
    mismatched leaves instead of a raw orbax error."""
    from geoldm_tpu.models import factory
    from geoldm_tpu.utils import checkpoint as ckpt

    cfg_small = factory.make_diffusion_model_config(INFO, nf=8, n_layers=1,
                                                    diffusion_steps=4)
    cfg_big = factory.make_diffusion_model_config(INFO, nf=16, n_layers=1,
                                                  diffusion_steps=4)
    params = factory.init_params(jax.random.key(0), cfg_small)
    ckpt.save_checkpoint(str(tmp_path / "ck"), {"params": params}, cfg_small,
                         name="best")
    wrong = {"params": factory.init_params(jax.random.key(0), cfg_big)}
    with pytest.raises(ValueError, match="different config"):
        ckpt.load_checkpoint(str(tmp_path / "ck"), template=wrong, name="best")


def test_export_args_thread_real_ema_decay(capsys):
    """args.pickle must carry the decay the checkpoint was actually
    trained with; the 0.9999 reference default is only a fallback and
    prints a warning (upstream tooling reads this field, e.g. --ae_path
    reuse picks the ema weights file when it is > 0)."""
    from geoldm_tpu.models import factory
    from geoldm_tpu.utils.torch_convert import reference_args_from_model_config

    cfg = factory.make_latent_diffusion_config(
        INFO, nf=16, n_layers=1, latent_nf=1, diffusion_steps=6)
    ns = reference_args_from_model_config(cfg, ema_decay=0.995)
    assert ns.ema_decay == 0.995
    assert "warning" not in capsys.readouterr().out

    ns = reference_args_from_model_config(cfg)
    assert ns.ema_decay == 0.9999
    assert "ema_decay" in capsys.readouterr().out


def test_weight_transfer_copies_do_not_alias_torch_storage():
    """Regression for the round-4 aliasing bug: jax's CPU backend can
    zero-copy a numpy view of torch parameter storage, so an in-place
    torch update (optimizer step) silently mutated transferred weights.
    Both transfer paths must COPY."""
    from tests.parity_utils import t2j
    from geoldm_tpu.utils.torch_convert import _strip_module_prefix

    lin = torch.nn.Linear(4, 3)
    j = t2j(lin.weight)
    sd = _strip_module_prefix(lin.state_dict())
    before_t2j = np.asarray(j).copy()
    before_sd = sd["weight"].copy()

    with torch.no_grad():
        lin.weight.add_(1.0)  # in-place, like an optimizer step

    np.testing.assert_array_equal(np.asarray(j), before_t2j)
    np.testing.assert_array_equal(sd["weight"], before_sd)
    # and the torch side really did change (the test isn't vacuous)
    assert float((lin.weight.detach().numpy() - before_t2j).min()) > 0.5

"""Gradient golden-parity: jax.grad of the VDM / VAE / LDM losses against
torch autograd on the reference with copied weights and identical injected
randomness (fixed t draw + fixed combined CoM-zero/standard noise).

This is the backward-pass counterpart of test_model_parity.py: forward
parity proves the losses agree; these tests prove that what *training
actually consumes* — d(loss)/d(params) — agrees too, including the
LDM's stop-gradient semantics (encoder grads identically zero on both
sides; reference: en_diffusion.py:1155 z_xh.detach()).

reference: equivariant_diffusion/en_diffusion.py:568-714 (compute_loss),
:934-976 (EnHierarchicalVAE.compute_loss), :1136-1191
(EnLatentDiffusion.forward).
"""

import copy
import os
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
import jax.numpy as jnp  # noqa: E402

from egnn.models import EGNN_decoder_QM9, EGNN_dynamics_QM9, EGNN_encoder_QM9  # noqa: E402
from equivariant_diffusion.en_diffusion import (  # noqa: E402
    EnHierarchicalVAE,
    EnLatentDiffusion,
    EnVariationalDiffusion,
)

from geoldm_tpu.data.datasets_config import get_dataset_info  # noqa: E402
from geoldm_tpu.diffusion import latent as ldm_mod  # noqa: E402
from geoldm_tpu.diffusion import vae as vae_mod  # noqa: E402
from geoldm_tpu.diffusion import vdm  # noqa: E402
from geoldm_tpu.models import factory  # noqa: E402
from geoldm_tpu.ops.distance import build_edge_mask  # noqa: E402
from tests.parity_utils import (  # noqa: E402
    decoder_params_from_torch,
    dynamics_params_from_torch,
    encoder_params_from_torch,
)

INFO = get_dataset_info("qm9")
NF, LAYERS, SUBL, T = 32, 2, 1, 50
B, N = 2, 7
LATENT_NF = 2


# ---------------------------------------------------------------------------
# Shared fixtures: inputs, fixed noise, grad extraction, tree comparison
# ---------------------------------------------------------------------------


def _masked_inputs(seed=0):
    rng = np.random.default_rng(seed)
    node_mask = np.zeros((B, N, 1), dtype=np.float32)
    node_mask[0, :5] = 1.0
    node_mask[1, :7] = 1.0
    x = (rng.standard_normal((B, N, 3)) * node_mask).astype(np.float32)
    x -= x.sum(1, keepdims=True) / node_mask.sum(1, keepdims=True)
    x *= node_mask
    h_cat = (np.eye(5, dtype=np.float32)[rng.integers(0, 5, (B, N))]) * node_mask
    h_int = (rng.integers(1, 9, (B, N, 1)) * node_mask).astype(np.float32)
    return x, h_cat, h_int, node_mask


def _flat_edge_mask(node_mask):
    em = node_mask[:, :, None, 0] * node_mask[:, None, :, 0]
    em = em * (1 - np.eye(N, dtype=np.float32)[None])
    return em.reshape(-1, 1)


def _fixed_eps(node_mask, feat_nf, seed):
    """Valid combined noise: CoM-zero masked x-part + masked feature part."""
    rng = np.random.default_rng(seed)
    ex = rng.standard_normal((B, N, 3)).astype(np.float32) * node_mask
    ex -= ex.sum(1, keepdims=True) / node_mask.sum(1, keepdims=True)
    ex *= node_mask
    eh = rng.standard_normal((B, N, feat_nf)).astype(np.float32) * node_mask
    return np.concatenate([ex, eh], axis=2)


def _torch_grads_as_model(model):
    """Clone the module with each parameter replaced by its gradient, so the
    existing weight-transfer helpers map grads into the jax param layout."""
    g = copy.deepcopy(model)
    for p_src, p_dst in zip(model.parameters(), g.parameters()):
        p_dst.data = (
            p_src.grad.detach().clone()
            if p_src.grad is not None
            else torch.zeros_like(p_src)
        )
    return g


def _assert_tree_allclose(mine, ref_tree, rtol=2e-3, atol_scale=2e-4):
    pm = jax.tree_util.tree_leaves_with_path(mine)
    pr = jax.tree_util.tree_leaves_with_path(ref_tree)
    assert len(pm) == len(pr)
    checked = 0
    for (path_m, a), (path_r, b) in zip(pm, pr):
        assert path_m == path_r, f"{path_m} != {path_r}"
        b_np = np.asarray(b)
        atol = max(1e-7, atol_scale * float(np.abs(b_np).max()))
        np.testing.assert_allclose(
            np.asarray(a), b_np, rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(path_m),
        )
        checked += 1
    assert checked > 0


class _PatchedRandomness:
    """Pin t-draws and noise draws to fixed arrays on both frameworks."""

    def __init__(self, monkeypatch, t_int, eps_diff=None, eps_vae=None):
        self.t_int = np.asarray(t_int, dtype=np.int64).reshape(B, 1)
        # torch: t sampling + per-instance noise overrides (installed by tests)
        monkeypatch.setattr(
            torch,
            "randint",
            lambda lo, hi, size=None, device=None, **kw: torch.from_numpy(self.t_int),
        )
        # jax: t sampling
        monkeypatch.setattr(
            jax.random,
            "randint",
            lambda key, shape, lo, hi, dtype=jnp.int32: jnp.asarray(
                self.t_int.reshape(shape), dtype=jnp.int32
            ),
        )
        if eps_diff is not None:
            monkeypatch.setattr(
                vdm,
                "sample_combined_position_feature_noise",
                lambda key, nm, nd, fnf: jnp.asarray(eps_diff),
            )
        if eps_vae is not None:
            monkeypatch.setattr(
                vae_mod,
                "sample_combined_noise",
                lambda key, nm, nd, fnf: jnp.asarray(eps_vae),
            )


# ---------------------------------------------------------------------------
# VDM loss gradients (l2-training and vlb paths)
# ---------------------------------------------------------------------------


def _setup_vdm(loss_type="l2"):
    torch.manual_seed(0)
    in_node_nf = 6
    dyn = EGNN_dynamics_QM9(
        in_node_nf=in_node_nf + 1, context_node_nf=0, n_dims=3, hidden_nf=NF,
        n_layers=LAYERS, attention=True, tanh=True, norm_constant=1.0,
        inv_sublayers=SUBL, sin_embedding=False, normalization_factor=1.0,
        aggregation_method="sum", condition_time=True,
    )
    ref = EnVariationalDiffusion(
        dynamics=dyn, in_node_nf=in_node_nf, n_dims=3, timesteps=T,
        noise_schedule="polynomial_2", noise_precision=1e-5, loss_type=loss_type,
        norm_values=(1.0, 4.0, 10.0), include_charges=True,
    )
    cfg = factory.make_diffusion_model_config(
        INFO, nf=NF, n_layers=LAYERS, inv_sublayers=SUBL, diffusion_steps=T,
        normalization_factor=1.0, loss_type=loss_type,
    )
    params = {"dynamics": dynamics_params_from_torch(dyn, LAYERS, SUBL, True)}
    return ref, dyn, cfg, params


@pytest.mark.parametrize(
    "loss_type,t_int",
    [("l2", (37, 12)), ("l2", (0, 25)), ("vlb", (41, 3))],
    ids=["l2_mid_t", "l2_with_t0", "vlb"],
)
def test_vdm_training_grad_parity(monkeypatch, loss_type, t_int):
    ref, dyn, cfg, params = _setup_vdm(loss_type)
    x, h_cat, h_int, node_mask = _masked_inputs(seed=11)
    eps_diff = _fixed_eps(node_mask, 6, seed=21)
    _PatchedRandomness(monkeypatch, t_int, eps_diff=eps_diff)
    ref.sample_combined_position_feature_noise = (
        lambda n_samples, n_nodes, node_mask: torch.from_numpy(eps_diff)
    )

    ref.train()
    loss_r = ref(
        torch.from_numpy(x),
        {"categorical": torch.from_numpy(h_cat), "integer": torch.from_numpy(h_int)},
        torch.from_numpy(node_mask),
        torch.from_numpy(_flat_edge_mask(node_mask)),
        None,
    ).sum()
    loss_r.backward()
    grads_ref = {
        "dynamics": dynamics_params_from_torch(
            _torch_grads_as_model(dyn), LAYERS, SUBL, True
        )
    }

    nm = jnp.asarray(node_mask)

    def loss_fn(p):
        return vdm.vdm_nll(
            p, cfg.diffusion, cfg.dynamics, jax.random.key(0), jnp.asarray(x),
            jnp.asarray(h_cat), jnp.asarray(h_int), nm, build_edge_mask(nm),
            training=True,
        ).sum()

    loss_m, grads_m = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_m), float(loss_r.detach()), rtol=1e-4)
    _assert_tree_allclose(grads_m, grads_ref)


# ---------------------------------------------------------------------------
# VAE loss gradients (encoder through KL + reparam mean, decoder via recon)
# ---------------------------------------------------------------------------


def _setup_vae():
    torch.manual_seed(1)
    in_node_nf = 6
    enc = EGNN_encoder_QM9(
        in_node_nf=in_node_nf, context_node_nf=0, out_node_nf=LATENT_NF,
        n_dims=3, hidden_nf=NF, n_layers=1, attention=True, tanh=True,
        norm_constant=1.0, inv_sublayers=SUBL, sin_embedding=False,
        normalization_factor=1.0, aggregation_method="sum", include_charges=True,
    )
    dec = EGNN_decoder_QM9(
        in_node_nf=LATENT_NF, context_node_nf=0, out_node_nf=in_node_nf,
        n_dims=3, hidden_nf=NF, n_layers=LAYERS, attention=True, tanh=True,
        norm_constant=1.0, inv_sublayers=SUBL, sin_embedding=False,
        normalization_factor=1.0, aggregation_method="sum", include_charges=True,
    )
    ref = EnHierarchicalVAE(
        encoder=enc, decoder=dec, in_node_nf=in_node_nf, n_dims=3,
        latent_node_nf=LATENT_NF, kl_weight=0.01, norm_values=(1, 4, 10),
        include_charges=True,
    )
    cfg = factory.make_vae_config(
        INFO, nf=NF, n_layers=LAYERS, latent_nf=LATENT_NF, inv_sublayers=SUBL,
        normalization_factor=1.0,
    )
    params = {
        "encoder": encoder_params_from_torch(enc, 1, SUBL, True),
        "decoder": decoder_params_from_torch(dec, LAYERS, SUBL, True),
    }
    return ref, enc, dec, cfg, params


def test_vae_training_grad_parity(monkeypatch):
    ref, enc, dec, cfg, params = _setup_vae()
    x, h_cat, h_int, node_mask = _masked_inputs(seed=13)
    eps_vae = _fixed_eps(node_mask, LATENT_NF, seed=23)
    _PatchedRandomness(monkeypatch, (1, 1), eps_vae=eps_vae)
    ref.sample_normal = (
        lambda mu, sigma, node_mask, fix_noise=False: mu
        + sigma * torch.from_numpy(eps_vae)
    )

    ref.train()
    loss_r = ref(
        torch.from_numpy(x),
        {"categorical": torch.from_numpy(h_cat), "integer": torch.from_numpy(h_int)},
        torch.from_numpy(node_mask),
        torch.from_numpy(_flat_edge_mask(node_mask)),
        None,
    ).sum()
    loss_r.backward()
    grads_ref = {
        "encoder": encoder_params_from_torch(_torch_grads_as_model(enc), 1, SUBL, True),
        "decoder": decoder_params_from_torch(
            _torch_grads_as_model(dec), LAYERS, SUBL, True
        ),
    }

    nm = jnp.asarray(node_mask)

    def loss_fn(p):
        return vae_mod.vae_nll(
            p, cfg.vae, jax.random.key(0), jnp.asarray(x), jnp.asarray(h_cat),
            jnp.asarray(h_int), nm, build_edge_mask(nm), training=True,
        ).sum()

    loss_m, grads_m = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_m), float(loss_r.detach()), rtol=1e-4)
    _assert_tree_allclose(grads_m, grads_ref)


# ---------------------------------------------------------------------------
# LDM loss gradients: stop-gradient semantics + decoder/dynamics grads
# ---------------------------------------------------------------------------


def test_ldm_training_grad_parity(monkeypatch):
    ref_vae, enc, dec, vae_cfg, vae_params = _setup_vae()
    torch.manual_seed(2)
    dyn = EGNN_dynamics_QM9(
        in_node_nf=LATENT_NF + 1, context_node_nf=0, n_dims=3, hidden_nf=NF,
        n_layers=LAYERS, attention=True, tanh=True, norm_constant=1.0,
        inv_sublayers=SUBL, sin_embedding=False, normalization_factor=1.0,
        aggregation_method="sum", condition_time=True,
    )
    ref = EnLatentDiffusion(
        vae=ref_vae, trainable_ae=True, dynamics=dyn, in_node_nf=LATENT_NF,
        n_dims=3, timesteps=T, noise_schedule="polynomial_2",
        noise_precision=1e-5, loss_type="l2", norm_values=(1.0, 4.0, 10.0),
        include_charges=True,
    )
    cfg = factory.make_latent_diffusion_config(
        INFO, nf=NF, n_layers=LAYERS, latent_nf=LATENT_NF, inv_sublayers=SUBL,
        normalization_factor=1.0, diffusion_steps=T, trainable_ae=True,
    )
    params = {
        "dynamics": dynamics_params_from_torch(dyn, LAYERS, SUBL, True),
        "vae": vae_params,
    }

    x, h_cat, h_int, node_mask = _masked_inputs(seed=17)
    eps_vae = _fixed_eps(node_mask, LATENT_NF, seed=29)
    eps_lat = _fixed_eps(node_mask, LATENT_NF, seed=31)
    _PatchedRandomness(monkeypatch, (19, 44), eps_vae=eps_vae)
    monkeypatch.setattr(
        vdm,
        "sample_combined_position_feature_noise",
        lambda key, nm_, nd, fnf: jnp.asarray(eps_lat),
    )
    ref.vae.sample_normal = (
        lambda mu, sigma, node_mask, fix_noise=False: mu
        + sigma * torch.from_numpy(eps_vae)
    )
    ref.sample_combined_position_feature_noise = (
        lambda n_samples, n_nodes, node_mask: torch.from_numpy(eps_lat)
    )

    ref.train()
    loss_r = ref(
        torch.from_numpy(x),
        {"categorical": torch.from_numpy(h_cat), "integer": torch.from_numpy(h_int)},
        torch.from_numpy(node_mask),
        torch.from_numpy(_flat_edge_mask(node_mask)),
        None,
    ).sum()
    loss_r.backward()

    # Reference: the encoder must receive no gradient at all (z detached).
    for p in enc.parameters():
        assert p.grad is None or float(p.grad.abs().max()) == 0.0

    grads_ref = {
        "dynamics": dynamics_params_from_torch(
            _torch_grads_as_model(dyn), LAYERS, SUBL, True
        ),
        "vae": {
            "encoder": encoder_params_from_torch(
                _torch_grads_as_model(enc), 1, SUBL, True
            ),
            "decoder": decoder_params_from_torch(
                _torch_grads_as_model(dec), LAYERS, SUBL, True
            ),
        },
    }

    nm = jnp.asarray(node_mask)

    def loss_fn(p):
        return ldm_mod.ldm_nll(
            p, cfg.diffusion, cfg.dynamics, cfg.vae, jax.random.key(0),
            jnp.asarray(x), jnp.asarray(h_cat), jnp.asarray(h_int), nm,
            build_edge_mask(nm), training=True, trainable_ae=True,
        ).sum()

    loss_m, grads_m = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_m), float(loss_r.detach()), rtol=1e-4)

    # JAX: encoder grads identically zero (stop_gradient parity).
    enc_leaves = jax.tree_util.tree_leaves(grads_m["vae"]["encoder"])
    assert all(float(jnp.abs(l).max()) == 0.0 for l in enc_leaves)

    _assert_tree_allclose(grads_m["dynamics"], grads_ref["dynamics"])
    _assert_tree_allclose(grads_m["vae"]["decoder"], grads_ref["vae"]["decoder"])

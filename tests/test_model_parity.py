"""Golden-parity of the full diffusion / VAE math against the reference
EnVariationalDiffusion / EnHierarchicalVAE with transferred weights.

RNG-free comparisons: gamma tables, kl_prior, normalization constants, the
t=0 decode terms, the ancestral-step mean (noise patched to zero), the final
decode, and the VAE encode/reconstruction error.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
if not os.path.isdir("/root/reference"):
    pytest.skip("reference repo not available", allow_module_level=True)
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from egnn.models import EGNN_dynamics_QM9, EGNN_decoder_QM9, EGNN_encoder_QM9  # noqa: E402
from equivariant_diffusion import utils as ref_utils  # noqa: E402
from equivariant_diffusion.en_diffusion import (  # noqa: E402
    EnHierarchicalVAE,
    EnVariationalDiffusion,
)

from geoldm_tpu.data.datasets_config import get_dataset_info  # noqa: E402
from geoldm_tpu.diffusion import schedules as S  # noqa: E402
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


def _setup_vdm():
    torch.manual_seed(0)
    in_node_nf = 6  # 5 classes + charges
    dyn = EGNN_dynamics_QM9(
        in_node_nf=in_node_nf + 1, context_node_nf=0, n_dims=3, hidden_nf=NF,
        n_layers=LAYERS, attention=True, tanh=True, norm_constant=1.0,
        inv_sublayers=SUBL, sin_embedding=False, normalization_factor=1.0,
        aggregation_method="sum", condition_time=True,
    )
    ref = EnVariationalDiffusion(
        dynamics=dyn, in_node_nf=in_node_nf, n_dims=3, timesteps=T,
        noise_schedule="polynomial_2", noise_precision=1e-5, loss_type="l2",
        norm_values=(1.0, 4.0, 10.0), include_charges=True,
    )
    ref.eval()

    cfg = factory.make_diffusion_model_config(
        INFO, nf=NF, n_layers=LAYERS, inv_sublayers=SUBL, diffusion_steps=T,
        normalization_factor=1.0,
    )
    params = {"dynamics": dynamics_params_from_torch(dyn, LAYERS, SUBL, True)}
    return ref, cfg, params


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
    return em


def test_gamma_table_matches_reference():
    g_ref = ref.gamma.gamma.numpy() if False else None
    ref_m, cfg, _ = _setup_vdm()
    g_ref = ref_m.gamma.gamma.detach().numpy()
    g_mine = S.gamma_table("polynomial_2", T, 1e-5)
    np.testing.assert_allclose(g_mine, g_ref, rtol=1e-5, atol=1e-6)


def test_kl_prior_and_constants_parity():
    ref_m, cfg, params = _setup_vdm()
    x, h_cat, h_int, node_mask = _masked_inputs()
    xh = np.concatenate([x, h_cat, h_int], axis=2)

    kl_ref = ref_m.kl_prior(torch.from_numpy(xh), torch.from_numpy(node_mask)).numpy()
    gamma_fn = vdm.make_gamma_fn(cfg.diffusion, params)
    kl_mine = np.asarray(
        vdm.kl_prior(cfg.diffusion, gamma_fn, jnp.asarray(xh), jnp.asarray(node_mask))
    )
    np.testing.assert_allclose(kl_mine, kl_ref, rtol=1e-4, atol=1e-5)

    const_ref = ref_m.log_constants_p_x_given_z0(
        torch.from_numpy(x), torch.from_numpy(node_mask)
    ).numpy()
    const_mine = np.asarray(
        vdm.log_constants_p_x_given_z0(cfg.diffusion, gamma_fn, jnp.asarray(node_mask))
    )
    np.testing.assert_allclose(const_mine, const_ref, rtol=1e-4, atol=1e-4)


def test_log_pxh_given_z0_parity():
    ref_m, cfg, params = _setup_vdm()
    x, h_cat, h_int, node_mask = _masked_inputs()
    rng = np.random.default_rng(3)
    d = 3 + 6
    z0 = (rng.standard_normal((B, N, d)) * node_mask).astype(np.float32)
    eps = (rng.standard_normal((B, N, d)) * node_mask).astype(np.float32)
    net = (rng.standard_normal((B, N, d)) * node_mask).astype(np.float32)
    gamma_0 = np.full((B, 1), float(S.gamma_table("polynomial_2", T, 1e-5)[0]),
                      dtype=np.float32)

    # Normalized h as the loss sees it.
    xn, hc_n, hi_n, _ = vdm.normalize(
        cfg.diffusion, jnp.asarray(x), jnp.asarray(h_cat), jnp.asarray(h_int),
        jnp.asarray(node_mask),
    )

    ref_val = ref_m.log_pxh_given_z0_without_constants(
        torch.from_numpy(x),
        {"categorical": torch.from_numpy(np.asarray(hc_n)),
         "integer": torch.from_numpy(np.asarray(hi_n))},
        torch.from_numpy(z0),
        torch.from_numpy(gamma_0).reshape(B, 1, 1),
        torch.from_numpy(eps),
        torch.from_numpy(net),
        torch.from_numpy(node_mask),
    ).numpy()

    mine = np.asarray(
        vdm.log_pxh_given_z0_without_constants(
            cfg.diffusion, hc_n, hi_n, jnp.asarray(z0), jnp.asarray(gamma_0),
            jnp.asarray(eps), jnp.asarray(net), jnp.asarray(node_mask),
            training=False,
        )
    )
    np.testing.assert_allclose(mine, ref_val, rtol=1e-3, atol=1e-3)


def test_ancestral_step_mean_parity():
    """sample_p_zs_given_zt with noise patched to zero: compares the full
    posterior-mean computation including the denoiser forward."""
    ref_m, cfg, params = _setup_vdm()
    x, h_cat, h_int, node_mask = _masked_inputs()
    rng = np.random.default_rng(4)
    d = 9
    z = rng.standard_normal((B, N, d)).astype(np.float32) * node_mask
    z[:, :, :3] -= z[:, :, :3].sum(1, keepdims=True) / node_mask.sum(1, keepdims=True)
    z *= node_mask

    s_arr = np.full((B, 1), 10.0 / T, dtype=np.float32)
    t_arr = np.full((B, 1), 11.0 / T, dtype=np.float32)

    # Patch the reference samplers to return zeros (mu is deterministic).
    orig_cg = ref_utils.sample_center_gravity_zero_gaussian_with_mask
    orig_g = ref_utils.sample_gaussian_with_mask
    ref_utils.sample_center_gravity_zero_gaussian_with_mask = (
        lambda size, device, node_mask: torch.zeros(size)
    )
    ref_utils.sample_gaussian_with_mask = (
        lambda size, device, node_mask: torch.zeros(size)
    )
    try:
        with torch.no_grad():
            zs_ref = ref_m.sample_p_zs_given_zt(
                torch.from_numpy(s_arr), torch.from_numpy(t_arr),
                torch.from_numpy(z),
                torch.from_numpy(node_mask),
                torch.from_numpy(_flat_edge_mask(node_mask).reshape(-1, 1)),
                None,
            ).numpy()
    finally:
        ref_utils.sample_center_gravity_zero_gaussian_with_mask = orig_cg
        ref_utils.sample_gaussian_with_mask = orig_g

    gamma_fn = vdm.make_gamma_fn(cfg.diffusion, params)

    # Zero noise on our side: use a key but multiply sigma by 0 via a custom
    # sample step — replicate by calling the internals with sigma-free mean.
    import geoldm_tpu.ops.com as com

    orig_sample = vdm.sample_normal
    vdm_sample_normal = vdm.sample_normal
    try:
        vdm.sample_normal = lambda key, mu, sigma, node_mask, n_dims, feat_nf, fix_noise=False: mu
        zs_mine = np.asarray(
            vdm.sample_p_zs_given_zt(
                params, cfg.diffusion, cfg.dynamics, gamma_fn, jax.random.key(0),
                jnp.asarray(s_arr), jnp.asarray(t_arr), jnp.asarray(z),
                jnp.asarray(node_mask), build_edge_mask(jnp.asarray(node_mask)),
                None,
            )
        )
    finally:
        vdm.sample_normal = orig_sample
    np.testing.assert_allclose(zs_mine, zs_ref, rtol=1e-3, atol=2e-4)


def _setup_vae():
    torch.manual_seed(1)
    in_node_nf = 6
    latent_nf = 2
    enc = EGNN_encoder_QM9(
        in_node_nf=in_node_nf, context_node_nf=0, out_node_nf=latent_nf,
        n_dims=3, hidden_nf=NF, n_layers=1, attention=True, tanh=True,
        norm_constant=1.0, inv_sublayers=SUBL, sin_embedding=False,
        normalization_factor=1.0, aggregation_method="sum", include_charges=True,
    )
    dec = EGNN_decoder_QM9(
        in_node_nf=latent_nf, context_node_nf=0, out_node_nf=in_node_nf,
        n_dims=3, hidden_nf=NF, n_layers=LAYERS, attention=True, tanh=True,
        norm_constant=1.0, inv_sublayers=SUBL, sin_embedding=False,
        normalization_factor=1.0, aggregation_method="sum", include_charges=True,
    )
    ref = EnHierarchicalVAE(
        encoder=enc, decoder=dec, in_node_nf=in_node_nf, n_dims=3,
        latent_node_nf=latent_nf, kl_weight=0.01, norm_values=(1, 4, 10),
        include_charges=True,
    )
    ref.eval()

    cfg = factory.make_vae_config(
        INFO, nf=NF, n_layers=LAYERS, latent_nf=latent_nf, inv_sublayers=SUBL,
        normalization_factor=1.0,
    )
    params = {
        "encoder": encoder_params_from_torch(enc, 1, SUBL, True),
        "decoder": decoder_params_from_torch(dec, LAYERS, SUBL, True),
    }
    return ref, cfg, params


def test_vae_encode_decode_parity():
    ref_m, cfg, params = _setup_vae()
    x, h_cat, h_int, node_mask = _masked_inputs(seed=5)
    xh = np.concatenate([x, h_cat, h_int], axis=2)
    em_flat = torch.from_numpy(_flat_edge_mask(node_mask).reshape(-1, 1))

    with torch.no_grad():
        zx_mu_r, zx_sig_r, zh_mu_r, zh_sig_r = ref_m.encode(
            torch.from_numpy(x),
            {"categorical": torch.from_numpy(h_cat), "integer": torch.from_numpy(h_int)},
            torch.from_numpy(node_mask), em_flat, None,
        )

    zx_mu, zx_sig, zh_mu, zh_sig = vae_mod.encode(
        params, cfg.vae, jnp.asarray(x), jnp.asarray(h_cat), jnp.asarray(h_int),
        jnp.asarray(node_mask), build_edge_mask(jnp.asarray(node_mask)),
    )
    np.testing.assert_allclose(np.asarray(zx_mu), zx_mu_r.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(zh_mu), zh_mu_r.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(float(zx_sig[0, 0, 0]), float(zx_sig_r[0, 0, 0]))

    # Decode parity (argmax one-hot + rounded charges).
    z_xh = np.concatenate([np.asarray(zx_mu), np.asarray(zh_mu)], axis=2).astype(
        np.float32
    )
    with torch.no_grad():
        x_r, h_r = ref_m.decode(
            torch.from_numpy(z_xh), torch.from_numpy(node_mask), em_flat, None
        )
    x_m, hc_m, hi_m = vae_mod.decode(
        params, cfg.vae, jnp.asarray(z_xh), jnp.asarray(node_mask),
        build_edge_mask(jnp.asarray(node_mask)),
    )
    # The decode path runs z through the full decoder EGNN (tanh-amplified
    # coordinate updates), so f32 reduction-order noise grows to ~5e-3.
    np.testing.assert_allclose(np.asarray(x_m), x_r.numpy(), atol=1e-2, rtol=1e-2)
    np.testing.assert_array_equal(np.asarray(hc_m), h_r["categorical"].numpy())
    np.testing.assert_array_equal(np.asarray(hi_m), h_r["integer"].numpy())


def test_vae_reconstruction_error_parity():
    ref_m, cfg, params = _setup_vae()
    x, h_cat, h_int, node_mask = _masked_inputs(seed=6)
    xh = np.concatenate([x, h_cat, h_int], axis=2)
    rng = np.random.default_rng(7)
    xh_rec = (rng.standard_normal(xh.shape) * node_mask).astype(np.float32)

    ref_err = ref_m.compute_reconstruction_error(
        torch.from_numpy(xh_rec), torch.from_numpy(xh)
    ).numpy()
    mine = np.asarray(
        vae_mod.compute_reconstruction_error(
            cfg.vae, jnp.asarray(xh_rec), jnp.asarray(xh), training=False
        )
    )
    np.testing.assert_allclose(mine, ref_err, rtol=1e-4, atol=1e-4)


def test_conditional_dynamics_parity():
    """Context-conditioned denoiser forward matches the reference (guards
    the time/context channel append + slice-off order)."""
    torch.manual_seed(3)
    from egnn.models import EGNN_dynamics_QM9 as TorchDyn

    in_node_nf, ctx = 6, 2
    dyn = TorchDyn(
        in_node_nf=in_node_nf + 1, context_node_nf=ctx, n_dims=3, hidden_nf=NF,
        n_layers=LAYERS, attention=True, tanh=True, norm_constant=1.0,
        inv_sublayers=SUBL, sin_embedding=False, normalization_factor=1.0,
        aggregation_method="sum", condition_time=True,
    )
    dyn.eval()
    cfg = factory.make_diffusion_model_config(
        INFO, nf=NF, n_layers=LAYERS, inv_sublayers=SUBL, diffusion_steps=T,
        normalization_factor=1.0, context_node_nf=ctx,
    )
    params = dynamics_params_from_torch(dyn, LAYERS, SUBL, True)

    x, h_cat, h_int, node_mask = _masked_inputs(seed=9)
    xh = np.concatenate([x, h_cat, h_int], axis=2)
    rng = np.random.default_rng(10)
    context = (rng.standard_normal((B, N, ctx)) * node_mask).astype(np.float32)
    t_arr = np.full((B, 1), 0.37, dtype=np.float32)
    em_flat = _flat_edge_mask(node_mask)

    with torch.no_grad():
        out_ref = dyn._forward(
            torch.from_numpy(t_arr), torch.from_numpy(xh),
            torch.from_numpy(node_mask),
            torch.from_numpy(em_flat.reshape(-1, 1)),
            torch.from_numpy(context),
        ).numpy()

    from geoldm_tpu.nn.dynamics import dynamics_apply

    out = dynamics_apply(
        {"egnn": params["egnn"]}, cfg.dynamics, jnp.asarray(t_arr),
        jnp.asarray(xh), jnp.asarray(node_mask),
        build_edge_mask(jnp.asarray(node_mask)), jnp.asarray(context),
    )
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-4, rtol=1e-3)

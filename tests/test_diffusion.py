"""Tests for the generative model family: VDM, VAE, latent diffusion.

Covers loss finiteness/shapes for both objectives, sampler invariants
(masking, zero CoM, valid one-hot decode), fix_noise broadcasting, chain
sampling, and the frozen-VAE gradient-flow semantics of the latent model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoldm_tpu import config as C
from geoldm_tpu.data.datasets_config import get_dataset_info
from geoldm_tpu.diffusion import latent as ldm
from geoldm_tpu.diffusion import vae as vae_mod
from geoldm_tpu.diffusion import vdm
from geoldm_tpu.models import factory
from geoldm_tpu.ops import com
from geoldm_tpu.ops.distance import build_edge_mask

DATASET_INFO = get_dataset_info("qm9")


def tiny_model(kind="latent_diffusion", **kw):
    base = dict(nf=16, n_layers=2, diffusion_steps=12, inv_sublayers=1)
    base.update(kw)
    if kind == "diffusion":
        return factory.make_diffusion_model_config(DATASET_INFO, **base)
    if kind == "vae":
        base.pop("diffusion_steps", None)
        return factory.make_vae_config(DATASET_INFO, **base)
    return factory.make_latent_diffusion_config(DATASET_INFO, **base)


def make_batch(key, b=3, n=9, num_classes=5, n_real=(5, 9, 7)):
    kx, kc, ki = jax.random.split(key, 3)
    node_mask = np.zeros((b, n, 1), dtype=np.float32)
    for i, k in enumerate(n_real):
        node_mask[i, :k] = 1.0
    node_mask = jnp.asarray(node_mask)
    x = jax.random.normal(kx, (b, n, 3)) * node_mask
    x = com.remove_mean_with_mask(x, node_mask)
    labels = jax.random.randint(kc, (b, n), 0, num_classes)
    h_cat = jax.nn.one_hot(labels, num_classes) * node_mask
    h_int = jax.random.randint(ki, (b, n, 1), 1, 9).astype(jnp.float32) * node_mask
    edge_mask = build_edge_mask(node_mask)
    return x, h_cat, h_int, node_mask, edge_mask


# ---------------------------------------------------------------------------
# VDM
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("loss_type,training", [("l2", True), ("vlb", False), ("l2", False)])
def test_vdm_nll_finite(loss_type, training):
    cfg = tiny_model("diffusion", loss_type=loss_type)
    params = factory.init_params(jax.random.key(0), cfg)
    x, h_cat, h_int, node_mask, edge_mask = make_batch(jax.random.key(1))
    nll = vdm.vdm_nll(
        params, cfg.diffusion, cfg.dynamics, jax.random.key(2), x, h_cat, h_int,
        node_mask, edge_mask, training=training,
    )
    assert nll.shape == (3,)
    assert np.all(np.isfinite(np.asarray(nll)))


def test_vdm_sample_invariants():
    cfg = tiny_model("diffusion")
    params = factory.init_params(jax.random.key(0), cfg)
    _, _, _, node_mask, edge_mask = make_batch(jax.random.key(1))
    x, h_cat, h_int = vdm.vdm_sample(
        params, cfg.diffusion, cfg.dynamics, jax.random.key(3), node_mask, edge_mask
    )
    x, h_cat, h_int = map(np.asarray, (x, h_cat, h_int))
    mask = np.asarray(node_mask)
    # Masked and CoM-centered coordinates.
    assert np.abs(x * (1 - mask)).max() == 0.0
    np.testing.assert_allclose(x.sum(axis=1), 0.0, atol=1e-4)
    # One-hot atom types on real nodes, zeros on padding.
    assert np.all(np.isin(h_cat, [0.0, 1.0]))
    np.testing.assert_allclose(h_cat.sum(-1) * mask[..., 0], mask[..., 0])
    # Integer charges.
    np.testing.assert_allclose(h_int, np.round(h_int))


@pytest.mark.slow
def test_vdm_sample_fix_noise_broadcast():
    cfg = tiny_model("diffusion")
    params = factory.init_params(jax.random.key(0), cfg)
    b, n = 4, 6
    node_mask = jnp.ones((b, n, 1))
    edge_mask = build_edge_mask(node_mask)
    x, h_cat, h_int = vdm.vdm_sample(
        params, cfg.diffusion, cfg.dynamics, jax.random.key(3), node_mask, edge_mask,
        fix_noise=True,
    )
    x = np.asarray(x)
    for i in range(1, b):
        np.testing.assert_allclose(x[i], x[0], atol=1e-5)


@pytest.mark.slow
def test_vdm_sample_chain_shape():
    cfg = tiny_model("diffusion")
    params = factory.init_params(jax.random.key(0), cfg)
    node_mask = jnp.ones((1, 5, 1))
    edge_mask = build_edge_mask(node_mask)
    (x, h_cat, h_int), chain = vdm.vdm_sample(
        params, cfg.diffusion, cfg.dynamics, jax.random.key(3), node_mask, edge_mask,
        keep_frames=6,
    )
    assert chain.shape == (6, 1, 5, 3 + 5 + 1)
    # Frame 0 is the decoded final sample.
    np.testing.assert_allclose(
        np.asarray(chain[0]),
        np.asarray(jnp.concatenate([x, h_cat, h_int], axis=2)),
        atol=1e-5,
    )


@pytest.mark.slow
def test_vdm_learned_gamma_loss():
    cfg = tiny_model("diffusion", noise_schedule="learned", loss_type="vlb")
    params = factory.init_params(jax.random.key(0), cfg)
    assert "gamma" in params
    x, h_cat, h_int, node_mask, edge_mask = make_batch(jax.random.key(1))
    nll = vdm.vdm_nll(
        params, cfg.diffusion, cfg.dynamics, jax.random.key(2), x, h_cat, h_int,
        node_mask, edge_mask, training=True,
    )
    assert np.all(np.isfinite(np.asarray(nll)))

    # Gradients flow into the gamma network under the vlb loss.
    def loss_fn(p):
        return jnp.mean(
            vdm.vdm_nll(
                p, cfg.diffusion, cfg.dynamics, jax.random.key(2), x, h_cat, h_int,
                node_mask, edge_mask, training=True,
            )
        )

    g = jax.grad(loss_fn)(params)
    assert float(jnp.max(jnp.abs(g["gamma"]["l2"]["w"]))) > 0


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_vae_loss_and_grads():
    cfg = tiny_model("vae")
    params = factory.init_params(jax.random.key(0), cfg)
    x, h_cat, h_int, node_mask, edge_mask = make_batch(jax.random.key(1))

    def loss_fn(p):
        return jnp.mean(
            vae_mod.vae_nll(
                p, cfg.vae, jax.random.key(2), x, h_cat, h_int, node_mask,
                edge_mask, training=True,
            )
        )

    loss, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    # Both encoder and decoder receive gradients.
    enc_norm = float(jnp.max(jnp.abs(g["encoder"]["egnn"]["embedding"]["w"])))
    dec_norm = float(jnp.max(jnp.abs(g["decoder"]["egnn"]["embedding"]["w"])))
    assert enc_norm > 0 and dec_norm > 0


def test_vae_decode_valid_outputs():
    cfg = tiny_model("vae")
    params = factory.init_params(jax.random.key(0), cfg)
    x, h_cat, h_int, node_mask, edge_mask = make_batch(jax.random.key(1))
    z_x, _, z_h, _ = vae_mod.encode(
        params, cfg.vae, x, h_cat, h_int, node_mask, edge_mask
    )
    z_xh = jnp.concatenate([z_x, z_h], axis=2)
    xd, cd, idd = vae_mod.decode(params, cfg.vae, z_xh, node_mask, edge_mask)
    cd = np.asarray(cd)
    assert np.all(np.isin(cd, [0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(xd).sum(axis=1), 0.0, atol=1e-4)


# ---------------------------------------------------------------------------
# Latent diffusion
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_ldm_nll_finite_and_frozen_vae_grads():
    cfg = tiny_model("latent_diffusion", latent_nf=2)
    params = factory.init_params(jax.random.key(0), cfg)
    x, h_cat, h_int, node_mask, edge_mask = make_batch(jax.random.key(1))

    def loss_fn(p, trainable_ae):
        return jnp.mean(
            ldm.ldm_nll(
                p, cfg.diffusion, cfg.dynamics, cfg.vae, jax.random.key(2), x,
                h_cat, h_int, node_mask, edge_mask, training=True,
                trainable_ae=trainable_ae,
            )
        )

    loss, g = jax.value_and_grad(loss_fn)(params, False)
    assert np.isfinite(float(loss))
    # Encoder NEVER gets gradients (latent detached); decoder only through
    # the recon term, absent when trainable_ae=False.
    enc_g = float(jnp.max(jnp.abs(g["vae"]["encoder"]["egnn"]["embedding"]["w"])))
    dec_g = float(jnp.max(jnp.abs(g["vae"]["decoder"]["egnn"]["embedding"]["w"])))
    dyn_g = float(jnp.max(jnp.abs(g["dynamics"]["egnn"]["embedding"]["w"])))
    assert enc_g == 0.0
    assert dec_g == 0.0
    assert dyn_g > 0.0

    # With trainable_ae, the decoder now gets gradients; encoder still none.
    _, g2 = jax.value_and_grad(loss_fn)(params, True)
    enc_g2 = float(jnp.max(jnp.abs(g2["vae"]["encoder"]["egnn"]["embedding"]["w"])))
    dec_g2 = float(jnp.max(jnp.abs(g2["vae"]["decoder"]["egnn"]["embedding"]["w"])))
    assert enc_g2 == 0.0
    assert dec_g2 > 0.0


@pytest.mark.slow
def test_ldm_sample_and_chain():
    cfg = tiny_model("latent_diffusion", latent_nf=1)
    params = factory.init_params(jax.random.key(0), cfg)
    node_mask = jnp.ones((2, 6, 1))
    edge_mask = build_edge_mask(node_mask)
    x, h_cat, h_int = ldm.ldm_sample(
        params, cfg.diffusion, cfg.dynamics, cfg.vae, jax.random.key(3),
        node_mask, edge_mask,
    )
    assert x.shape == (2, 6, 3)
    assert h_cat.shape == (2, 6, 5)
    assert h_int.shape == (2, 6, 1)
    np.testing.assert_allclose(np.asarray(x).sum(axis=1), 0.0, atol=1e-4)
    assert np.all(np.isin(np.asarray(h_cat), [0.0, 1.0]))

    chain = ldm.ldm_sample_chain(
        params, cfg.diffusion, cfg.dynamics, cfg.vae, jax.random.key(4),
        node_mask[:1], edge_mask[:1], keep_frames=5,
    )
    assert chain.shape == (5, 1, 6, 3 + 5 + 1)
    assert np.all(np.isfinite(np.asarray(chain)))


@pytest.mark.slow
def test_factory_nll_and_sample_fns():
    for kind in ["diffusion", "vae", "latent_diffusion"]:
        cfg = tiny_model(kind)
        params = factory.init_params(jax.random.key(0), cfg)
        x, h_cat, h_int, node_mask, edge_mask = make_batch(jax.random.key(1))
        nll_fn = factory.model_nll_fn(cfg, training=True)
        nll = nll_fn(params, jax.random.key(2), x, h_cat, h_int, node_mask, edge_mask)
        assert nll.shape == (3,) and np.all(np.isfinite(np.asarray(nll)))


def test_config_roundtrip():
    cfg = tiny_model("latent_diffusion")
    s = C.dumps(cfg)
    cfg2 = C.loads(s)
    assert cfg == cfg2


@pytest.mark.slow
def test_bfloat16_full_sampling_mode():
    """The whole-EGNN bf16 mode samples valid molecules close to the f32 path."""
    cfg = tiny_model("latent_diffusion")
    params = factory.init_params(jax.random.key(0), cfg)
    node_mask = jnp.ones((2, 8, 1))
    edge_mask = build_edge_mask(node_mask)
    from geoldm_tpu.nn.core import resolve_compute

    x32, hc32, hi32 = ldm.ldm_sample(
        params, cfg.diffusion, cfg.dynamics, cfg.vae, jax.random.key(3),
        node_mask, edge_mask,
    )
    x16, hc16, hi16 = ldm.ldm_sample(
        params, cfg.diffusion, cfg.dynamics, cfg.vae, jax.random.key(3),
        node_mask, edge_mask, compute_dtype=resolve_compute("bfloat16_full"),
    )
    assert np.all(np.isfinite(np.asarray(x16)))
    # Same RNG stream; bf16 perturbs trajectories but keeps them in range.
    assert np.abs(np.asarray(x16)).max() < 10 * max(np.abs(np.asarray(x32)).max(), 1.0)
    np.testing.assert_allclose(np.asarray(x16).sum(axis=1), 0.0, atol=1e-2)
    assert np.all(np.isin(np.asarray(hc16), [0.0, 1.0]))


@pytest.mark.slow
def test_bfloat16_mixed_sampling_mode():
    """Mixed-precision schedule (bf16 bulk + f32 tail) samples validly."""
    cfg = tiny_model("latent_diffusion")
    params = factory.init_params(jax.random.key(0), cfg)
    node_mask = jnp.ones((2, 8, 1))
    edge_mask = build_edge_mask(node_mask)
    x, hc, hi = ldm.ldm_sample(
        params, cfg.diffusion, cfg.dynamics, cfg.vae, jax.random.key(3),
        node_mask, edge_mask, compute_dtype="bfloat16_mixed",
    )
    assert np.all(np.isfinite(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(x).sum(axis=1), 0.0, atol=1e-2)
    assert np.all(np.isin(np.asarray(hc), [0.0, 1.0]))


@pytest.mark.slow
def test_fix_noise_with_heterogeneous_sizes():
    """fix_noise with different molecule sizes: padded entries stay zero and
    each sample is CoM-centered under its own mask."""
    cfg = tiny_model("diffusion")
    params = factory.init_params(jax.random.key(0), cfg)
    node_mask = np.zeros((3, 8, 1), dtype=np.float32)
    node_mask[0, :4] = 1
    node_mask[1, :8] = 1
    node_mask[2, :6] = 1
    node_mask = jnp.asarray(node_mask)
    edge_mask = build_edge_mask(node_mask)
    x, h_cat, h_int = vdm.vdm_sample(
        params, cfg.diffusion, cfg.dynamics, jax.random.key(3), node_mask,
        edge_mask, fix_noise=True,
    )
    x = np.asarray(x)
    mask = np.asarray(node_mask)
    assert np.abs(x * (1 - mask)).max() == 0.0
    np.testing.assert_allclose(x.sum(axis=1), 0.0, atol=1e-4)


@pytest.mark.slow
def test_learned_gamma_sampling():
    """The learned-gamma network works inside the scanned sampler."""
    cfg = tiny_model("diffusion", noise_schedule="learned", loss_type="vlb",
                     diffusion_steps=8)
    params = factory.init_params(jax.random.key(0), cfg)
    node_mask = jnp.ones((2, 6, 1))
    edge_mask = build_edge_mask(node_mask)
    x, h_cat, h_int = vdm.vdm_sample(
        params, cfg.diffusion, cfg.dynamics, jax.random.key(1), node_mask, edge_mask
    )
    assert np.all(np.isfinite(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(x).sum(axis=1), 0.0, atol=1e-4)
    info = vdm.log_info(cfg.diffusion, params)
    assert info["log_SNR_max"] > info["log_SNR_min"]


def test_log_pxh_z0_finite_at_negative_cdf_rounding():
    """Regression: f32 erf rounding can make the categorical CDF difference
    (a probability mass) negative by ~1e-7, which turned the log into NaN
    and — because loss_term_0 is computed-then-masked for every t — poisoned
    the whole batch loss. The mass must be clamped at 0 before the log.

    The scalar pair below is a found counterexample: with centered=1.390018
    and sigma_0_cat=0.169883, cdf((c+.5)/s) - cdf((c-.5)/s) = -1.19e-7."""
    cfg = factory.make_diffusion_model_config(DATASET_INFO).diffusion
    c, s_cat = 1.390018105506897, 0.16988298296928406
    sigma_0 = s_cat / cfg.norm_values[1]
    gamma_0 = jnp.full((1, 1), np.log(sigma_0**2 / (1.0 - sigma_0**2)), jnp.float32)

    n, nc = 1, len(DATASET_INFO["atom_decoder"])
    node_mask = jnp.ones((1, n, 1))
    z_cat_val = (c + 1.0) / cfg.norm_values[1]  # est_h_cat*norm - 1 == c
    z_t = jnp.concatenate(
        [jnp.zeros((1, n, 3)), jnp.full((1, n, nc), z_cat_val), jnp.zeros((1, n, 1))],
        axis=2,
    )
    h_cat = jax.nn.one_hot(jnp.zeros((1, n), jnp.int32), nc)
    h_int = jnp.zeros((1, n, 1))
    eps = jnp.zeros_like(z_t)
    net_out = jnp.zeros_like(z_t)
    out = vdm.log_pxh_given_z0_without_constants(
        cfg, h_cat, h_int, z_t, gamma_0, eps, net_out, node_mask, training=True
    )
    assert np.all(np.isfinite(np.asarray(out)))

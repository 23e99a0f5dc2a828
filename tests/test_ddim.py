"""Tests for the strided DDIM-family sampler (few-step generation).

This capability goes beyond the reference, which only steps the dense
t -> t-1/T grid (reference: en_diffusion.py:716-747, :762-838). The key
algebraic fact under test: with eta=1 the generalized jump equals the
exact ancestral posterior step, so the strided sampler with n_steps == T
reproduces the dense sampler; with eta=0 each jump is deterministic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoldm_tpu.data.datasets_config import get_dataset_info
from geoldm_tpu.diffusion import schedules as S
from geoldm_tpu.diffusion import vdm
from geoldm_tpu.models import factory
from geoldm_tpu.ops.distance import build_edge_mask

DATASET_INFO = get_dataset_info("qm9")


def tiny_model(kind="diffusion", **kw):
    base = dict(nf=16, n_layers=2, diffusion_steps=12, inv_sublayers=1)
    base.update(kw)
    if kind == "diffusion":
        return factory.make_diffusion_model_config(DATASET_INFO, **base)
    return factory.make_latent_diffusion_config(DATASET_INFO, **base)


def masked_batch(b=3, n=9, n_real=(5, 9, 7)):
    node_mask = np.zeros((b, n, 1), dtype=np.float32)
    for i, k in enumerate(n_real):
        node_mask[i, :k] = 1.0
    node_mask = jnp.asarray(node_mask)
    return node_mask, build_edge_mask(node_mask)


@pytest.mark.slow
def test_ddim_step_eta1_matches_ancestral():
    """One eta=1 generalized jump over a single grid cell is algebraically
    the exact ancestral step (same key -> same noise -> equal outputs)."""
    cfg = tiny_model()
    params = factory.init_params(jax.random.key(0), cfg)
    node_mask, edge_mask = masked_batch()
    gamma_fn = vdm.make_gamma_fn(cfg.diffusion, params)
    T = cfg.diffusion.timesteps
    b = node_mask.shape[0]
    zt = vdm.sample_combined_position_feature_noise(
        jax.random.key(1), node_mask, 3, cfg.diffusion.in_node_nf
    )
    s = jnp.full((b, 1), 6.0 / T)
    t = jnp.full((b, 1), 7.0 / T)
    k = jax.random.key(2)
    anc = vdm.sample_p_zs_given_zt(
        params, cfg.diffusion, cfg.dynamics, gamma_fn, k, s, t, zt,
        node_mask, edge_mask, None,
    )
    ddim = vdm.sample_p_zs_given_zt_ddim(
        params, cfg.diffusion, cfg.dynamics, gamma_fn, k, s, t, zt,
        node_mask, edge_mask, None, eta=1.0,
    )
    np.testing.assert_allclose(np.asarray(ddim), np.asarray(anc),
                               rtol=1e-4, atol=1e-5)


def test_strided_full_T_eta1_matches_dense_sampler():
    """n_steps == T with eta=1 visits the same grid with the same keys as
    the dense ancestral sampler -> identical molecules (float tolerance)."""
    cfg = tiny_model()
    params = factory.init_params(jax.random.key(0), cfg)
    node_mask, edge_mask = masked_batch()
    key = jax.random.key(3)
    dense = vdm.vdm_sample(
        params, cfg.diffusion, cfg.dynamics, key, node_mask, edge_mask
    )
    strided = vdm.vdm_sample(
        params, cfg.diffusion, cfg.dynamics, key, node_mask, edge_mask,
        n_steps=cfg.diffusion.timesteps, eta=1.0,
    )
    for a, b_ in zip(dense, strided):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


def test_ddim_step_eta0_ignores_key():
    """With eta=0 the jump is deterministic: the noise key must not matter."""
    cfg = tiny_model()
    params = factory.init_params(jax.random.key(0), cfg)
    node_mask, edge_mask = masked_batch()
    gamma_fn = vdm.make_gamma_fn(cfg.diffusion, params)
    T = cfg.diffusion.timesteps
    b = node_mask.shape[0]
    zt = vdm.sample_combined_position_feature_noise(
        jax.random.key(1), node_mask, 3, cfg.diffusion.in_node_nf
    )
    s = jnp.full((b, 1), 3.0 / T)
    t = jnp.full((b, 1), 9.0 / T)
    outs = [
        vdm.sample_p_zs_given_zt_ddim(
            params, cfg.diffusion, cfg.dynamics, gamma_fn, jax.random.key(k),
            s, t, zt, node_mask, edge_mask, None, eta=0.0,
        )
        for k in (10, 11)
    ]
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(outs[1]))


@pytest.mark.parametrize("n_steps,eta", [
    (4, 0.0),
    pytest.param(4, 1.0, marks=pytest.mark.slow),
    pytest.param(1, 0.0, marks=pytest.mark.slow),
    pytest.param(7, 0.5, marks=pytest.mark.slow),
])
def test_few_step_sample_invariants(n_steps, eta):
    """Few-step sampling keeps the sampler invariants: masked padding stays
    zero, coordinates are CoM-centered, one-hot decode is valid."""
    cfg = tiny_model()
    params = factory.init_params(jax.random.key(0), cfg)
    node_mask, edge_mask = masked_batch()
    x, h_cat, h_int = vdm.vdm_sample(
        params, cfg.diffusion, cfg.dynamics, jax.random.key(4), node_mask,
        edge_mask, n_steps=n_steps, eta=eta,
    )
    x = np.asarray(x)
    mask = np.asarray(node_mask)
    assert np.all(np.isfinite(x))
    assert np.abs(x * (1 - mask)).max() == 0.0
    np.testing.assert_allclose(x.sum(axis=1), 0.0, atol=1e-4)
    assert np.all(np.isin(np.asarray(h_cat), [0.0, 1.0]))


@pytest.mark.slow
def test_few_step_ldm_through_factory():
    """The latent model's decode path composes with the strided sampler via
    model_sample_fn (the closure used by train/sampling.py)."""
    cfg = tiny_model("latent_diffusion", latent_nf=1)
    params = factory.init_params(jax.random.key(0), cfg)
    node_mask, edge_mask = masked_batch()
    fn = factory.model_sample_fn(cfg, n_steps=3, eta=0.0)
    x, h_cat, h_int = fn(params, jax.random.key(5), node_mask, edge_mask)
    assert np.all(np.isfinite(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(x).sum(axis=1), 0.0, atol=1e-3)


@pytest.mark.parametrize("n_steps", [1, 4, 12])
def test_dpm2m_sample_invariants(n_steps):
    """DPM-Solver++(2M) few-step sampling keeps the sampler invariants."""
    cfg = tiny_model()
    params = factory.init_params(jax.random.key(0), cfg)
    node_mask, edge_mask = masked_batch()
    x, h_cat, h_int = vdm.vdm_sample(
        params, cfg.diffusion, cfg.dynamics, jax.random.key(8), node_mask,
        edge_mask, n_steps=n_steps, method="dpm2m",
    )
    x = np.asarray(x)
    mask = np.asarray(node_mask)
    assert np.all(np.isfinite(x))
    assert np.abs(x * (1 - mask)).max() == 0.0
    np.testing.assert_allclose(x.sum(axis=1), 0.0, atol=1e-4)
    assert np.all(np.isin(np.asarray(h_cat), [0.0, 1.0]))


def test_dpm2m_single_jump_equals_ddim_eta0():
    """With one jump (no multistep history) DPM-Solver++(2M) reduces
    algebraically to the deterministic DDIM update:
    sigma_s/sigma_t z - alpha_s expm1(-h) x == alpha_s x + sigma_s eps_hat
    since alpha_s(1 - e^{-h}) = alpha_s - alpha_t sigma_s/sigma_t. Same key
    -> same z_T and decode noise -> equal molecules to float tolerance."""
    cfg = tiny_model()
    params = factory.init_params(jax.random.key(0), cfg)
    node_mask, edge_mask = masked_batch()
    key = jax.random.key(9)
    a = vdm.vdm_sample(params, cfg.diffusion, cfg.dynamics, key, node_mask,
                       edge_mask, n_steps=1, eta=0.0)
    b_ = vdm.vdm_sample(params, cfg.diffusion, cfg.dynamics, key, node_mask,
                        edge_mask, n_steps=1, method="dpm2m")
    for x, y in zip(a, b_):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_dpm2m_ldm_through_factory():
    cfg = tiny_model("latent_diffusion", latent_nf=1)
    params = factory.init_params(jax.random.key(0), cfg)
    node_mask, edge_mask = masked_batch()
    fn = factory.model_sample_fn(cfg, n_steps=4, method="dpm2m")
    x, h_cat, h_int = fn(params, jax.random.key(5), node_mask, edge_mask)
    assert np.all(np.isfinite(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(x).sum(axis=1), 0.0, atol=1e-3)


@pytest.mark.parametrize("method", ["ddim", "dpm2m"])
def test_few_step_with_conditioning_context(method):
    """Property-conditioned sampling composes with both few-step methods
    (the context rides through every strided jump)."""
    cfg = tiny_model(context_node_nf=1)
    params = factory.init_params(jax.random.key(0), cfg)
    node_mask, edge_mask = masked_batch()
    context = jnp.ones((node_mask.shape[0], node_mask.shape[1], 1)) * node_mask
    x, h_cat, h_int = vdm.vdm_sample(
        params, cfg.diffusion, cfg.dynamics, jax.random.key(11), node_mask,
        edge_mask, context=context, n_steps=4,
        eta=0.0 if method == "dpm2m" else 1.0, method=method,
    )
    assert np.all(np.isfinite(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(x).sum(axis=1), 0.0, atol=1e-4)


def test_unknown_method_raises():
    cfg = tiny_model()
    params = factory.init_params(jax.random.key(0), cfg)
    node_mask, edge_mask = masked_batch()
    with pytest.raises(ValueError, match="method"):
        vdm.vdm_sample(params, cfg.diffusion, cfg.dynamics, jax.random.key(0),
                       node_mask, edge_mask, n_steps=4, method="heun")


def test_strided_grid_is_strictly_decreasing():
    """The integer sub-grid tau has strictly decreasing, in-range entries
    for every K in [1, T]."""
    T = 12
    for K in range(1, T + 1):
        tau = [((K - k) * T) // K for k in range(K + 1)]
        assert tau[0] == T and tau[-1] == 0
        assert all(a > b for a, b in zip(tau, tau[1:]))


def test_strided_rejects_bad_args():
    cfg = tiny_model()
    params = factory.init_params(jax.random.key(0), cfg)
    node_mask, edge_mask = masked_batch()
    with pytest.raises(ValueError, match="n_steps"):
        vdm.vdm_sample(params, cfg.diffusion, cfg.dynamics, jax.random.key(0),
                       node_mask, edge_mask, n_steps=0)
    with pytest.raises(ValueError, match="n_steps"):
        vdm.vdm_sample(params, cfg.diffusion, cfg.dynamics, jax.random.key(0),
                       node_mask, edge_mask,
                       n_steps=cfg.diffusion.timesteps + 1)
    with pytest.raises(ValueError, match="chain"):
        vdm.vdm_sample(params, cfg.diffusion, cfg.dynamics, jax.random.key(0),
                       node_mask, edge_mask, n_steps=4, keep_frames=3)


@pytest.mark.slow
def test_few_step_mixed_precision_tail():
    """The bfloat16_mixed tail schedule applies to the strided scan too."""
    cfg = tiny_model()
    params = factory.init_params(jax.random.key(0), cfg)
    node_mask, edge_mask = masked_batch()
    x, h_cat, h_int = vdm.vdm_sample(
        params, cfg.diffusion, cfg.dynamics, jax.random.key(6), node_mask,
        edge_mask, compute_dtype="bfloat16_full", n_steps=6, eta=0.0,
    )
    assert np.all(np.isfinite(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(x).sum(axis=1), 0.0, atol=1e-2)

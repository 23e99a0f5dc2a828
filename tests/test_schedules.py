"""Unit tests for noise schedules and the gamma algebra.

Closed-form identities: sigma^2 + alpha^2 = 1, SNR monotonicity, schedule
endpoint values, and consistency of the transition coefficients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoldm_tpu.diffusion import schedules as S


def test_polynomial_schedule_endpoints():
    a2 = S.polynomial_schedule(1000, s=1e-5, power=2.0)
    assert a2.shape == (1001,)
    # alpha^2 close to 1 at t=0, close to s at t=T.
    assert a2[0] > 0.999
    assert a2[-1] < 1e-3
    # Monotone decreasing.
    assert np.all(np.diff(a2) <= 0)
    # Bounded in (0, 1).
    assert np.all(a2 > 0) and np.all(a2 < 1)


def test_cosine_schedule_monotone():
    a2 = S.cosine_beta_schedule(1000)
    assert np.all(np.diff(a2) <= 1e-12)
    assert np.all(a2 > 0) and np.all(a2 <= 1)


def test_clip_noise_schedule_ratio_bound():
    raw = np.linspace(1.0, 1e-8, 101) ** 2
    clipped = S.clip_noise_schedule(raw, clip_value=0.05)
    ratios = clipped[1:] / clipped[:-1]
    assert np.all(ratios >= 0.05 - 1e-12)
    assert np.all(ratios <= 1.0 + 1e-12)


def test_gamma_table_monotone_increasing():
    for sched in ["polynomial_2", "cosine"]:
        g = S.gamma_table(sched, 1000, 1e-5)
        assert g.shape == (1001,)
        assert np.all(np.diff(g) >= 0), sched


def test_sigma_alpha_identity():
    g = jnp.asarray(S.gamma_table("polynomial_2", 1000, 1e-5), dtype=jnp.float32)
    sig = S.sigma(g, ndim=1)
    al = S.alpha(g, ndim=1)
    np.testing.assert_allclose(np.asarray(sig**2 + al**2), 1.0, atol=1e-5)
    # SNR = alpha^2 / sigma^2 = exp(-gamma)
    np.testing.assert_allclose(
        np.asarray(S.snr(g)), np.asarray(al**2 / sig**2), rtol=1e-4, atol=1e-7
    )


def test_gamma_lookup_roundtrip():
    table = jnp.asarray(S.gamma_table("polynomial_2", 1000, 1e-5))
    t = jnp.array([0.0, 0.5, 1.0])
    g = S.gamma_lookup(table, t, 1000)
    np.testing.assert_allclose(np.asarray(g), np.asarray(table)[[0, 500, 1000]], rtol=1e-6)


def test_sigma_and_alpha_t_given_s_consistency():
    """alpha_{t|s} * alpha_s == alpha_t and sigma_t^2 = alpha^2_{t|s} sigma_s^2 + sigma^2_{t|s}."""
    table = jnp.asarray(S.gamma_table("polynomial_2", 1000, 1e-5), dtype=jnp.float32)
    t = jnp.array([0.3, 0.7, 1.0])
    s = jnp.array([0.299, 0.699, 0.999])
    g_t = S.gamma_lookup(table, t, 1000)
    g_s = S.gamma_lookup(table, s, 1000)
    sigma2_ts, sigma_ts, alpha_ts = S.sigma_and_alpha_t_given_s(g_t, g_s, ndim=1)
    alpha_t = S.alpha(g_t, 1)
    alpha_s = S.alpha(g_s, 1)
    sigma_t = S.sigma(g_t, 1)
    sigma_s = S.sigma(g_s, 1)
    np.testing.assert_allclose(np.asarray(alpha_ts * alpha_s), np.asarray(alpha_t), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(alpha_ts**2 * sigma_s**2 + sigma2_ts),
        np.asarray(sigma_t**2),
        rtol=1e-4,
        atol=1e-6,
    )


def test_learned_gamma_monotone_and_endpoints():
    params = S.gamma_network_init(jax.random.key(0))
    t = jnp.linspace(0, 1, 101).reshape(-1, 1)
    g = S.gamma_network_apply(params, t)
    g = np.asarray(g).reshape(-1)
    assert np.all(np.diff(g) >= -1e-5)
    np.testing.assert_allclose(g[0], -5.0, atol=1e-4)
    np.testing.assert_allclose(g[-1], 10.0, atol=1e-4)


def test_learned_gamma_monotone_any_params():
    """Monotonicity must hold for arbitrary (e.g. trained) parameter values."""
    params = S.gamma_network_init(jax.random.key(1))
    # Perturb weights arbitrarily, including negative values.
    params = jax.tree.map(lambda p: p - 3.0, params)
    params["gamma_0"] = jnp.array([-7.0])
    params["gamma_1"] = jnp.array([3.0])
    t = jnp.linspace(0, 1, 64).reshape(-1, 1)
    g = np.asarray(S.gamma_network_apply(params, t)).reshape(-1)
    assert np.all(np.diff(g) >= -1e-5)


def test_check_issues_norm_values():
    table = S.gamma_table("polynomial_2", 1000, 1e-5)
    # Default QM9 normalization should pass.
    S.check_issues_norm_values(table, (1.0, 4.0, 10.0))
    with pytest.raises(ValueError):
        S.check_issues_norm_values(table, (1.0, 4.0, 1e6))

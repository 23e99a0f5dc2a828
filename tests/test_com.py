"""Tests for masked CoM-subspace utilities: projection exactness, masking
invariance, sampler statistics, and analytic log-likelihood values."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from geoldm_tpu.ops import com


def _random_masked(key, b=4, n=8, d=3, n_real=(3, 5, 8, 2)):
    kx, _ = jax.random.split(key)
    x = jax.random.normal(kx, (b, n, d))
    node_mask = np.zeros((b, n, 1), dtype=np.float32)
    for i, k in enumerate(n_real):
        node_mask[i, :k] = 1.0
    node_mask = jnp.asarray(node_mask)
    return x * node_mask, node_mask


def test_remove_mean_exact_zero_com():
    x, mask = _random_masked(jax.random.key(0))
    y = com.remove_mean_with_mask(x, mask)
    # Per-molecule sum over real nodes is ~0.
    s = np.asarray(jnp.sum(y, axis=1))
    np.testing.assert_allclose(s, 0.0, atol=1e-5)
    # Padded entries stay exactly zero.
    assert float(com.masked_residual(y, mask)) == 0.0


def test_remove_mean_idempotent():
    x, mask = _random_masked(jax.random.key(1))
    y1 = com.remove_mean_with_mask(x, mask)
    y2 = com.remove_mean_with_mask(y1, mask)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_sampler_masked_and_centered():
    _, mask = _random_masked(jax.random.key(2))
    z = com.sample_center_gravity_zero_gaussian_with_mask(
        jax.random.key(3), (4, 8, 3), mask
    )
    assert float(com.masked_residual(z, mask)) == 0.0
    np.testing.assert_allclose(np.asarray(jnp.sum(z, axis=1)), 0.0, atol=1e-5)


def test_sampler_subspace_variance():
    """Projected noise has total variance (N-1)*D per molecule."""
    n_real = 5
    mask = jnp.ones((4096, n_real, 1))
    z = com.sample_center_gravity_zero_gaussian_with_mask(
        jax.random.key(4), (4096, n_real, 3), mask
    )
    r2 = np.asarray(com.sum_except_batch(jnp.square(z)))
    expected = (n_real - 1) * 3
    np.testing.assert_allclose(r2.mean(), expected, rtol=0.05)


def test_com_loglik_analytic():
    """At x=0 the log-likelihood equals the normalizing constant."""
    b, n, d = 2, 6, 3
    mask = jnp.ones((b, n, 1))
    x = jnp.zeros((b, n, d))
    ll = np.asarray(com.center_gravity_zero_gaussian_log_likelihood_with_mask(x, mask))
    expected = -0.5 * (n - 1) * d * math.log(2 * math.pi)
    np.testing.assert_allclose(ll, expected, rtol=1e-6)


def test_standard_loglik_masked_invariance():
    """Changing padded entries of x must not change the masked log-likelihood."""
    x, mask = _random_masked(jax.random.key(5))
    ll1 = com.standard_gaussian_log_likelihood_with_mask(x, mask)
    x_dirty = x + (1.0 - mask) * 100.0
    ll2 = com.standard_gaussian_log_likelihood_with_mask(x_dirty, mask)
    np.testing.assert_allclose(np.asarray(ll1), np.asarray(ll2), atol=1e-4)


def test_gaussian_kl_zero_for_identical():
    x, mask = _random_masked(jax.random.key(6))
    sig = jnp.ones_like(x)
    kl = np.asarray(com.gaussian_kl(x, sig, x, sig, mask))
    np.testing.assert_allclose(kl, 0.0, atol=1e-5)


def test_gaussian_kl_for_dimension_standard_identity():
    """KL(N(mu, 1) || N(0, 1)) on d dims = 0.5 * ||mu||^2."""
    b, n, dd = 3, 5, 3
    mask = jnp.ones((b, n, 1))
    mu = jax.random.normal(jax.random.key(7), (b, n, dd)) * mask
    mu = com.remove_mean_with_mask(mu, mask)
    d = com.subspace_dimensionality(mask, dd)
    ones = jnp.ones((b,))
    kl = np.asarray(com.gaussian_kl_for_dimension(mu, ones, jnp.zeros_like(mu), ones, d))
    expected = 0.5 * np.asarray(com.sum_except_batch(jnp.square(mu)))
    np.testing.assert_allclose(kl, expected, rtol=1e-5)


def test_cdf_standard_gaussian():
    vals = np.asarray(com.cdf_standard_gaussian(jnp.array([0.0, 100.0, -100.0])))
    np.testing.assert_allclose(vals, [0.5, 1.0, 0.0], atol=1e-7)

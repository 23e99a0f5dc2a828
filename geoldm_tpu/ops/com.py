"""Masked center-of-mass (CoM) subspace utilities and masked Gaussians.

All distributions over coordinates live on the zero-CoM linear subspace of
dimension (N-1)*3 per molecule, where N is the number of *real* (unmasked)
nodes. These are the TPU-native equivalents of the reference's
equivariant_diffusion/utils.py (remove_mean_with_mask :31,
sample_center_gravity_zero_gaussian_with_mask :107,
center_gravity_zero_gaussian_log_likelihood_with_mask :87,
sample_gaussian_with_mask :137, gaussian KLs in en_diffusion.py:83-120).

Design differences vs the reference:
- no runtime ``.item()`` asserts on the hot path (the reference syncs the
  device on every call — equivariant_diffusion/utils.py:32-33); invariants
  are enforced in the test suite and via ``checkify``-style debug helpers.
- explicit ``jax.random`` keys instead of global torch RNG.

Shapes: ``x`` is ``[B, N, D]``, ``node_mask`` is ``[B, N, 1]`` with values in
{0, 1}; padded entries of any masked tensor are exactly zero.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def sum_except_batch(x: Array) -> Array:
    """Sum over all axes except the leading batch axis. -> [B]"""
    return jnp.sum(x.reshape(x.shape[0], -1), axis=-1)


def num_nodes(node_mask: Array) -> Array:
    """Number of real nodes per molecule. node_mask [B, N, 1] -> [B]"""
    return jnp.sum(node_mask[:, :, 0], axis=1)


def subspace_dimensionality(node_mask: Array, n_dims: int) -> Array:
    """Dimension of the zero-CoM subspace: (N - 1) * n_dims. -> [B]

    reference: en_diffusion.py:339-342.
    """
    return (num_nodes(node_mask) - 1.0) * n_dims


def remove_mean_with_mask(x: Array, node_mask: Array) -> Array:
    """Project x onto the zero-CoM subspace, respecting the node mask.

    Assumes padded rows of ``x`` are already zero (so they do not contribute
    to the sum). reference: equivariant_diffusion/utils.py:31-38.
    """
    n = jnp.sum(node_mask, axis=1, keepdims=True)  # [B, 1, 1]
    mean = jnp.sum(x, axis=1, keepdims=True) / n
    return x - mean * node_mask


def sample_gaussian_with_mask(key: Array, shape, node_mask: Array, dtype=jnp.float32) -> Array:
    """Standard normal noise, zeroed at padded nodes.

    reference: equivariant_diffusion/utils.py:137-140.
    """
    x = jax.random.normal(key, shape, dtype=dtype)
    return x * node_mask


def sample_center_gravity_zero_gaussian_with_mask(
    key: Array, shape, node_mask: Array, dtype=jnp.float32
) -> Array:
    """Normal noise projected onto the masked zero-CoM subspace.

    Valid because the isotropic Gaussian is rotation invariant around zero
    (so the orthogonal projection of a standard normal is a standard normal
    on the subspace). reference: equivariant_diffusion/utils.py:107-116.
    """
    x = jax.random.normal(key, shape, dtype=dtype) * node_mask
    return remove_mean_with_mask(x, node_mask)


def center_gravity_zero_gaussian_log_likelihood_with_mask(
    x: Array, node_mask: Array
) -> Array:
    """log N(x; 0, I) on the (N-1)*D-dim zero-CoM subspace. -> [B]

    reference: equivariant_diffusion/utils.py:87-104.
    """
    assert x.ndim == 3
    d = x.shape[2]
    r2 = sum_except_batch(jnp.square(x))
    degrees_of_freedom = subspace_dimensionality(node_mask, d)
    log_norm_const = -0.5 * degrees_of_freedom * math.log(2 * math.pi)
    return -0.5 * r2 + log_norm_const


def standard_gaussian_log_likelihood_with_mask(x: Array, node_mask: Array) -> Array:
    """Masked elementwise standard-normal log density, summed per molecule.

    reference: equivariant_diffusion/utils.py:130-134.
    """
    log_px = -0.5 * x * x - 0.5 * math.log(2 * math.pi)
    return sum_except_batch(log_px * node_mask)


def gaussian_kl(q_mu: Array, q_sigma: Array, p_mu: Array, p_sigma: Array, node_mask: Array) -> Array:
    """KL(q || p) between diagonal Gaussians, masked + summed per molecule.

    reference: en_diffusion.py:83-100.
    """
    term = (
        jnp.log(p_sigma / (q_sigma + 1e-8) + 1e-8)
        + 0.5 * (jnp.square(q_sigma) + jnp.square(q_mu - p_mu)) / jnp.square(p_sigma)
        - 0.5
    )
    return sum_except_batch(term * node_mask)


def gaussian_kl_for_dimension(q_mu: Array, q_sigma: Array, p_mu: Array, p_sigma: Array, d: Array) -> Array:
    """KL between isotropic Gaussians on a d-dimensional subspace.

    ``q_sigma``/``p_sigma`` are per-batch scalars [B]; ``d`` is the subspace
    dimension per batch element [B]. reference: en_diffusion.py:103-120.
    """
    mu_norm2 = sum_except_batch(jnp.square(q_mu - p_mu))
    assert q_sigma.ndim == 1 and p_sigma.ndim == 1
    return (
        d * jnp.log(p_sigma / (q_sigma + 1e-8) + 1e-8)
        + 0.5 * (d * jnp.square(q_sigma) + mu_norm2) / jnp.square(p_sigma)
        - 0.5 * d
    )


def cdf_standard_gaussian(x: Array) -> Array:
    """Standard normal CDF. reference: en_diffusion.py:250-251."""
    return 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


# ---------------------------------------------------------------------------
# Debug-mode invariants (the reference runs these on every batch with .item()
# device syncs; here they are opt-in helpers for tests / debugging).
# ---------------------------------------------------------------------------


def masked_residual(x: Array, node_mask: Array) -> Array:
    """Max |x| over padded entries (should be 0 for correctly masked x)."""
    return jnp.max(jnp.abs(x * (1.0 - node_mask)))


def mean_residual(x: Array, node_mask: Array, eps: float = 1e-10) -> Array:
    """Relative CoM drift (should be ~0 for zero-CoM x)."""
    largest = jnp.max(jnp.abs(x))
    err = jnp.max(jnp.abs(jnp.sum(x, axis=1, keepdims=True)))
    return err / (largest + eps)

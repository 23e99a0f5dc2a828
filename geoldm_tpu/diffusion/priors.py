"""Standalone priors over (coordinates, features).

Functional equivalents of the reference PositionFeaturePrior / PositionPrior
(equivariant_diffusion/distributions.py:11-57 — orphaned in the reference but
part of its API surface): zero-CoM Gaussian over coordinates x, standard
Gaussian over invariant features h.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from geoldm_tpu.ops import com

Array = jax.Array


def position_feature_prior_log_prob(z_x: Array, z_h: Array, node_mask: Array) -> Array:
    """log p(z_x, z_h) on the masked zero-CoM x subspace + standard h. [B]"""
    log_pz_x = com.center_gravity_zero_gaussian_log_likelihood_with_mask(z_x, node_mask)
    log_pz_h = com.standard_gaussian_log_likelihood_with_mask(z_h, node_mask)
    return log_pz_x + log_pz_h


def position_feature_prior_sample(
    key: Array, n_dim: int, in_node_nf: int, node_mask: Array
):
    """-> (z_x [B,N,n_dim], z_h [B,N,in_node_nf])."""
    b, n, _ = node_mask.shape
    kx, kh = jax.random.split(key)
    z_x = com.sample_center_gravity_zero_gaussian_with_mask(kx, (b, n, n_dim), node_mask)
    z_h = com.sample_gaussian_with_mask(kh, (b, n, in_node_nf), node_mask)
    return z_x, z_h


def position_prior_log_prob(x: Array) -> Array:
    """Unmasked zero-CoM Gaussian log-density (all nodes real). [B]"""
    b, n, d = x.shape
    mask = jnp.ones((b, n, 1), dtype=x.dtype)
    return com.center_gravity_zero_gaussian_log_likelihood_with_mask(x, mask)


def position_prior_sample(key: Array, shape) -> Array:
    b, n, d = shape
    mask = jnp.ones((b, n, 1))
    return com.sample_center_gravity_zero_gaussian_with_mask(key, shape, mask)

"""E(n) hierarchical VAE: first stage of the latent diffusion model.

Functional re-design of the reference EnHierarchicalVAE
(equivariant_diffusion/en_diffusion.py:858-1048): an EGNN encoder mapping a
molecule (x, h) to a per-node latent with 3 equivariant coordinate channels
and ``latent_nf`` invariant channels, plus an EGNN decoder back to
(x, one-hot atom types, integer charges). The encoder posterior std is a
fixed constant (0.0032 — reference :1012-1013); the ELBO combines
reconstruction error with a KL against the CoM-subspace standard normal.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from geoldm_tpu.config import VAEConfig
from geoldm_tpu.nn.dynamics import (
    decoder_apply,
    decoder_init,
    encoder_apply,
    encoder_init,
)
from geoldm_tpu.ops import com

Array = jax.Array


def vae_init(key: Array, cfg: VAEConfig) -> dict:
    k_enc, k_dec = jax.random.split(key)
    return {
        "encoder": encoder_init(k_enc, cfg.encoder_egnn, cfg.latent_nf),
        "decoder": decoder_init(k_dec, cfg.decoder_egnn),
    }


def sample_combined_noise(key, node_mask, n_dims, latent_nf):
    b, n, _ = node_mask.shape
    kx, kh = jax.random.split(key)
    z_x = com.sample_center_gravity_zero_gaussian_with_mask(kx, (b, n, n_dims), node_mask)
    z_h = com.sample_gaussian_with_mask(kh, (b, n, latent_nf), node_mask)
    return jnp.concatenate([z_x, z_h], axis=2)


def encode(
    params: dict,
    cfg: VAEConfig,
    x: Array,
    h_cat: Array,
    h_int: Array,
    node_mask: Array,
    edge_mask: Array,
    context: Optional[Array] = None,
    compute_dtype=None,
):
    """q(z | x, h) -> (z_x_mu [B,N,3], sigma_0_x [B,1,1], z_h_mu [B,N,latent],
    sigma_0_h [B,1,latent]); posterior stds are the fixed constant.

    reference: en_diffusion.py:1000-1015."""
    xh = jnp.concatenate([x, h_cat, h_int], axis=2)
    z_x_mu, _, z_h_mu, _ = encoder_apply(
        params["encoder"], cfg.encoder_egnn, cfg.latent_nf, cfg.n_dims,
        xh, node_mask, edge_mask, context, compute_dtype,
    )
    b = z_x_mu.shape[0]
    sigma_0_x = jnp.full((b, 1, 1), cfg.encoder_sigma, dtype=z_x_mu.dtype)
    sigma_0_h = jnp.full((b, 1, cfg.latent_nf), cfg.encoder_sigma, dtype=z_h_mu.dtype)
    return z_x_mu, sigma_0_x, z_h_mu, sigma_0_h


def decode(
    params: dict,
    cfg: VAEConfig,
    z_xh: Array,
    node_mask: Array,
    edge_mask: Array,
    context: Optional[Array] = None,
    compute_dtype=None,
):
    """p(x, h | z): decoder EGNN then argmax one-hot / rounded charges.

    reference: en_diffusion.py:1017-1035."""
    x_recon, h_recon = decoder_apply(
        params["decoder"], cfg.decoder_egnn, cfg.n_dims, z_xh, node_mask, edge_mask,
        context, compute_dtype,
    )
    xh = jnp.concatenate([x_recon, h_recon], axis=2)
    x = xh[:, :, : cfg.n_dims]
    inc = int(cfg.include_charges)
    h_int = xh[:, :, xh.shape[2] - inc :] if inc else jnp.zeros_like(xh[:, :, :0])
    h_cat_raw = xh[:, :, cfg.n_dims : xh.shape[2] - inc]
    h_cat = jax.nn.one_hot(jnp.argmax(h_cat_raw, axis=2), cfg.num_classes) * node_mask
    h_int = jnp.round(h_int) * node_mask
    return x, h_cat, h_int


def compute_reconstruction_error(
    cfg: VAEConfig, xh_rec: Array, xh: Array, training: bool
) -> Array:
    """MSE on x + cross-entropy on atom types + MSE on charges.

    reference: en_diffusion.py:892-926."""
    nd, nc = cfg.n_dims, cfg.num_classes
    x_rec, x = xh_rec[:, :, :nd], xh[:, :, :nd]
    error_x = com.sum_except_batch(jnp.square(x_rec - x))

    h_cat_rec = xh_rec[:, :, nd : nd + nc]
    h_cat = xh[:, :, nd : nd + nc]
    logp = jax.nn.log_softmax(h_cat_rec, axis=-1)
    labels = jnp.argmax(h_cat, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]  # [B,N]
    error_h_cat = jnp.sum(ce, axis=1)

    if cfg.include_charges:
        h_int_rec = xh_rec[:, :, -1:]
        h_int = xh[:, :, -1:]
        error_h_int = com.sum_except_batch(jnp.square(h_int_rec - h_int))
    else:
        error_h_int = 0.0

    error = error_x + error_h_cat + error_h_int
    if training:
        denom = (cfg.n_dims + cfg.in_node_nf) * xh.shape[1]
        error = error / denom
    return error


class VAELossInfo(NamedTuple):
    loss_recon: Array
    loss_kl: Array


def compute_loss(
    params: dict,
    cfg: VAEConfig,
    key: Array,
    x: Array,
    h_cat: Array,
    h_int: Array,
    node_mask: Array,
    edge_mask: Array,
    context: Optional[Array],
    training: bool,
    compute_dtype=None,
) -> tuple[Array, VAELossInfo]:
    """ELBO estimator: recon + kl_weight * KL. reference: en_diffusion.py:934-974."""
    xh = jnp.concatenate([x, h_cat, h_int], axis=2)

    z_x_mu, z_x_sigma, z_h_mu, z_h_sigma = encode(
        params, cfg, x, h_cat, h_int, node_mask, edge_mask, context, compute_dtype
    )

    # KL for invariant features — against N(0, 1), with unit posterior std
    # (the fixed-sigma term is dropped, as in the reference which passes
    # ones for q_sigma — en_diffusion.py:945-946).
    ones_h = jnp.ones_like(z_h_mu)
    loss_kl_h = com.gaussian_kl(z_h_mu, ones_h, jnp.zeros_like(z_h_mu), ones_h, node_mask)

    # KL for equivariant features on the (N-1)*3 subspace.
    b = z_x_mu.shape[0]
    subspace_d = com.subspace_dimensionality(node_mask, cfg.n_dims)
    ones_b = jnp.ones((b,), dtype=z_x_mu.dtype)
    loss_kl_x = com.gaussian_kl_for_dimension(
        z_x_mu, ones_b, jnp.zeros_like(z_x_mu), ones_b, subspace_d
    )
    loss_kl = loss_kl_h + loss_kl_x

    # Reparametrized latent sample.
    z_xh_mean = jnp.concatenate([z_x_mu, z_h_mu], axis=2)
    z_xh_sigma = jnp.concatenate(
        [jnp.broadcast_to(z_x_sigma, z_x_mu.shape), jnp.broadcast_to(z_h_sigma, z_h_mu.shape)],
        axis=2,
    )
    eps = sample_combined_noise(key, node_mask, cfg.n_dims, cfg.latent_nf)
    z_xh = z_xh_mean + z_xh_sigma * eps

    x_recon, h_recon = decoder_apply(
        params["decoder"], cfg.decoder_egnn, cfg.n_dims, z_xh, node_mask, edge_mask,
        context, compute_dtype,
    )
    xh_rec = jnp.concatenate([x_recon, h_recon], axis=2)
    loss_recon = compute_reconstruction_error(cfg, xh_rec, xh, training)

    loss = loss_recon + cfg.kl_weight * loss_kl
    return loss, VAELossInfo(loss_recon=loss_recon, loss_kl=loss_kl)


def vae_nll(
    params: dict,
    cfg: VAEConfig,
    key: Array,
    x: Array,
    h_cat: Array,
    h_int: Array,
    node_mask: Array,
    edge_mask: Array,
    context: Optional[Array] = None,
    training: bool = False,
    compute_dtype=None,
) -> Array:
    """ELBO-based NLL estimate [B]. reference: en_diffusion.py:976-985."""
    loss, _ = compute_loss(
        params, cfg, key, x, h_cat, h_int, node_mask, edge_mask, context, training,
        compute_dtype,
    )
    return loss

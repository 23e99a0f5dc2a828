"""E(n) latent diffusion: DDPM in the VAE's per-node latent space.

Functional re-design of the reference EnLatentDiffusion
(equivariant_diffusion/en_diffusion.py:1057-1243). Composition semantics:

- The data (x, h) is encoded by the first-stage VAE; the latent is sampled
  with the *diffusion's* sigma_0 (not the VAE's fixed sigma) and then
  ALWAYS detached (``stop_gradient``) — the encoder receives no gradients
  ever (reference: en_diffusion.py:1142-1155).
- When ``trainable_ae``, the decoder is additionally trained through a
  reconstruction term on the detached latent (reference :1159-1166);
  otherwise the whole VAE is frozen (handled by the optimizer mask,
  reference :1234-1243 instantiate_first_stage).
- The diffusion loss runs on z = [z_x, z_h] with the latent treated as the
  'integer' feature block; the t=0 decoder term collapses to the plain
  eps error (reference :1124-1134).
- Sampling diffuses in latent space then decodes with the VAE
  (reference :1194-1232).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from geoldm_tpu.config import DiffusionConfig, DynamicsConfig, VAEConfig
from geoldm_tpu.diffusion import schedules as S
from geoldm_tpu.diffusion import vae as vae_mod
from geoldm_tpu.diffusion import vdm
from geoldm_tpu.ops import com

Array = jax.Array


def ldm_init(key: Array, cfg: DiffusionConfig, dyn_cfg: DynamicsConfig, vae_cfg: VAEConfig) -> dict:
    k_vdm, k_vae = jax.random.split(key)
    params = vdm.vdm_init(k_vdm, cfg, dyn_cfg)
    params["vae"] = vae_mod.vae_init(k_vae, vae_cfg)
    return params


def log_constants_p_h_given_z0(cfg: DiffusionConfig, gamma_fn, node_mask) -> Array:
    """Constant part of log p(h | z0) in latent space.

    Note: uses n_nodes * n_dims degrees of freedom exactly as the reference
    does (en_diffusion.py:1083-1097), preserved for parity."""
    b = node_mask.shape[0]
    n_nodes = com.num_nodes(node_mask)
    degrees_of_freedom_h = n_nodes * cfg.n_dims
    zeros = jnp.zeros((b, 1), dtype=jnp.float32)
    gamma_0 = gamma_fn(zeros)
    log_sigma_x = 0.5 * gamma_0.reshape(b)
    return degrees_of_freedom_h * (-log_sigma_x - 0.5 * math.log(2 * math.pi))


class LDMLossInfo(NamedTuple):
    loss_diffusion: Array
    loss_recon: Array


def ldm_nll(
    params: dict,
    cfg: DiffusionConfig,
    dyn_cfg: DynamicsConfig,
    vae_cfg: VAEConfig,
    key: Array,
    x: Array,
    h_cat: Array,
    h_int: Array,
    node_mask: Array,
    edge_mask: Array,
    context: Optional[Array] = None,
    training: bool = False,
    trainable_ae: bool = False,
    compute_dtype=None,
) -> Array:
    """-log p(x, h) estimator for the latent diffusion model [B].

    reference: en_diffusion.py:1136-1191 (forward)."""
    gamma_fn = vdm.make_gamma_fn(cfg, params)
    k_enc, k_loss = jax.random.split(key)

    # Encode to latent space.
    z_x_mu, _, z_h_mu, _ = vae_mod.encode(
        params["vae"], vae_cfg, x, h_cat, h_int, node_mask, edge_mask, context,
        compute_dtype,
    )
    b = x.shape[0]
    t_zeros = jnp.zeros((b, 1), dtype=jnp.float32)
    gamma_0 = gamma_fn(t_zeros)
    sigma_0 = S.sigma(gamma_0, x.ndim)

    z_xh_mean = jnp.concatenate([z_x_mu, z_h_mu], axis=2)
    eps = vae_mod.sample_combined_noise(k_enc, node_mask, cfg.n_dims, vae_cfg.latent_nf)
    z_xh = z_xh_mean + sigma_0 * eps
    z_xh = jax.lax.stop_gradient(z_xh)  # Always keep the encoder fixed.

    # Decoder reconstruction term (only contributes when trainable_ae).
    if trainable_ae:
        xh = jnp.concatenate([x, h_cat, h_int], axis=2)
        from geoldm_tpu.nn.dynamics import decoder_apply

        x_recon, h_recon = decoder_apply(
            params["vae"]["decoder"], vae_cfg.decoder_egnn, vae_cfg.n_dims, z_xh,
            node_mask, edge_mask, context, compute_dtype,
        )
        xh_rec = jnp.concatenate([x_recon, h_recon], axis=2)
        loss_recon = vae_mod.compute_reconstruction_error(vae_cfg, xh_rec, xh, training)
    else:
        loss_recon = jnp.zeros((b,))

    # Diffusion loss in latent space: z_h is the 'integer' block.
    z_x = z_xh[:, :, : cfg.n_dims]
    z_h = z_xh[:, :, cfg.n_dims :]
    empty_cat = jnp.zeros_like(z_h[:, :, :0])

    loss_ld, _ = vdm.compute_loss(
        params, cfg, dyn_cfg, k_loss, z_x, empty_cat, z_h, node_mask, edge_mask,
        context, t0_always=not training, training=training,
        compute_dtype=compute_dtype, latent_space=True,
    )

    neg_log_constants = -log_constants_p_h_given_z0(cfg, gamma_fn, node_mask)
    if training and cfg.loss_type == "l2":
        neg_log_constants = jnp.zeros_like(neg_log_constants)

    return loss_ld + loss_recon + neg_log_constants


def ldm_sample(
    params: dict,
    cfg: DiffusionConfig,
    dyn_cfg: DynamicsConfig,
    vae_cfg: VAEConfig,
    key: Array,
    node_mask: Array,
    edge_mask: Array,
    context: Optional[Array] = None,
    fix_noise: bool = False,
    compute_dtype=None,
    n_steps: Optional[int] = None,
    eta: float = 1.0,
    method: str = "ddim",
    guidance_scale: float = 1.0,
    clip_z: float = 0.0,
):
    """Diffuse in latent space, then decode with the VAE.

    ``n_steps``/``eta``/``method`` select the strided few-step sampler and
    ``guidance_scale`` classifier-free guidance (see vdm.vdm_sample).
    reference: en_diffusion.py:1194-1204."""
    k_diff, _ = jax.random.split(key)
    z_x, z_cat, z_int = vdm.vdm_sample(
        params, cfg, dyn_cfg, k_diff, node_mask, edge_mask, context, fix_noise,
        compute_dtype, latent_space=True, n_steps=n_steps, eta=eta,
        method=method, guidance_scale=guidance_scale, clip_z=clip_z,
    )
    z_xh = jnp.concatenate([z_x, z_cat, z_int], axis=2)
    return vae_mod.decode(
        params["vae"], vae_cfg, z_xh, node_mask, edge_mask, context, compute_dtype
    )


def ldm_sample_chain(
    params: dict,
    cfg: DiffusionConfig,
    dyn_cfg: DynamicsConfig,
    vae_cfg: VAEConfig,
    key: Array,
    node_mask: Array,
    edge_mask: Array,
    context: Optional[Array] = None,
    keep_frames: int = 100,
    compute_dtype=None,
):
    """Latent chain + per-frame VAE decode for visualization.

    reference: en_diffusion.py:1207-1232. Returns [keep_frames, B, N, 3+C+1]
    decoded states (frame 0 is the final sample)."""
    (x, h_cat, h_int), chain = vdm.vdm_sample(
        params, cfg, dyn_cfg, key, node_mask, edge_mask, context, False,
        compute_dtype, latent_space=True, keep_frames=keep_frames,
    )

    def decode_frame(z_xh):
        xf, cf, inf_ = vae_mod.decode(
            params["vae"], vae_cfg, z_xh, node_mask, edge_mask, context, compute_dtype
        )
        return jnp.concatenate([xf, cf, inf_], axis=2)

    chain_decoded = jax.lax.map(decode_frame, chain)
    return chain_decoded

"""Model factories: wire configs + init params for the three model kinds.

TPU-native equivalent of the reference factories (qm9/models.py:12-166
get_model / get_autoencoder / get_latent_diffusion): given dataset metadata
and a handful of architecture hyperparameters, build the frozen config tree
and initialize the parameter pytree.
"""

from __future__ import annotations

from typing import Tuple

import jax

from geoldm_tpu.config import (
    DiffusionConfig,
    DynamicsConfig,
    EGNNConfig,
    ModelConfig,
    VAEConfig,
)
from geoldm_tpu.diffusion import latent as ldm
from geoldm_tpu.diffusion import vae as vae_mod
from geoldm_tpu.diffusion import vdm

Array = jax.Array


def _egnn_cfg(
    in_node_nf: int,
    out_node_nf: int,
    nf: int,
    n_layers: int,
    *,
    attention: bool = True,
    tanh: bool = True,
    norm_constant: float = 1.0,
    inv_sublayers: int = 1,
    sin_embedding: bool = False,
    normalization_factor: float = 1.0,
    aggregation_method: str = "sum",
    remat: bool = False,
) -> EGNNConfig:
    return EGNNConfig(
        in_node_nf=in_node_nf,
        out_node_nf=out_node_nf,
        hidden_nf=nf,
        n_layers=n_layers,
        inv_sublayers=inv_sublayers,
        attention=attention,
        tanh=tanh,
        coords_range=15.0,
        norm_constant=norm_constant,
        sin_embedding=sin_embedding,
        normalization_factor=normalization_factor,
        aggregation_method=aggregation_method,
        remat=remat,
    )


def make_diffusion_model_config(
    dataset_info: dict,
    *,
    include_charges: bool = True,
    condition_time: bool = True,
    context_node_nf: int = 0,
    context_indicator: bool = False,
    nf: int = 256,
    n_layers: int = 9,
    attention: bool = True,
    tanh: bool = True,
    norm_constant: float = 1.0,
    inv_sublayers: int = 1,
    sin_embedding: bool = False,
    normalization_factor: float = 1.0,
    aggregation_method: str = "sum",
    remat: bool = False,
    diffusion_steps: int = 1000,
    noise_schedule: str = "polynomial_2",
    noise_precision: float = 1e-5,
    loss_type: str = "l2",
    normalize_factors: Tuple[float, float, float] = (1.0, 4.0, 10.0),
    model: str = "egnn_dynamics",
) -> ModelConfig:
    """Plain E(n) diffusion over (x, h). reference: qm9/models.py:12-51."""
    if context_indicator:
        context_node_nf += 1  # trailing is-conditioned channel (CFG null)
    in_node_nf = len(dataset_info["atom_decoder"]) + int(include_charges)
    dyn_in = in_node_nf + int(condition_time)
    # gnn_dynamics consumes [x, h] concat and emits [vel, h]
    # (reference: egnn/models.py:25-30): 3 extra in/out channels.
    extra = 3 if model == "gnn_dynamics" else 0
    egnn = _egnn_cfg(
        dyn_in + context_node_nf + extra,
        dyn_in + context_node_nf + extra,
        nf,
        n_layers,
        attention=attention,
        tanh=tanh,
        norm_constant=norm_constant,
        inv_sublayers=inv_sublayers,
        sin_embedding=sin_embedding,
        normalization_factor=normalization_factor,
        aggregation_method=aggregation_method,
        remat=remat,
    )
    dynamics = DynamicsConfig(
        in_node_nf=in_node_nf,
        context_node_nf=context_node_nf,
        n_dims=3,
        condition_time=condition_time,
        mode=model,
        egnn=egnn,
    )
    diffusion = DiffusionConfig(
        in_node_nf=in_node_nf,
        n_dims=3,
        timesteps=diffusion_steps,
        noise_schedule=noise_schedule,
        noise_precision=noise_precision,
        loss_type=loss_type,
        norm_values=tuple(normalize_factors),
        include_charges=include_charges,
    )
    return ModelConfig(kind="diffusion", diffusion=diffusion, dynamics=dynamics,
                       context_indicator=context_indicator)


def make_vae_config(
    dataset_info: dict,
    *,
    include_charges: bool = True,
    context_node_nf: int = 0,
    context_indicator: bool = False,
    nf: int = 256,
    n_layers: int = 9,
    latent_nf: int = 1,
    kl_weight: float = 0.01,
    attention: bool = True,
    tanh: bool = True,
    norm_constant: float = 1.0,
    inv_sublayers: int = 1,
    sin_embedding: bool = False,
    normalization_factor: float = 1.0,
    aggregation_method: str = "sum",
    remat: bool = False,
) -> ModelConfig:
    """First-stage VAE. The encoder always has n_layers=1
    (reference: qm9/models.py:69-77); the decoder uses the full depth."""
    if context_indicator:
        context_node_nf += 1  # trailing is-conditioned channel (CFG null)
    in_node_nf = len(dataset_info["atom_decoder"]) + int(include_charges)
    common = dict(
        attention=attention,
        tanh=tanh,
        norm_constant=norm_constant,
        inv_sublayers=inv_sublayers,
        sin_embedding=sin_embedding,
        normalization_factor=normalization_factor,
        aggregation_method=aggregation_method,
        remat=remat,
    )
    encoder_egnn = _egnn_cfg(
        in_node_nf + context_node_nf, nf, nf, 1, **common
    )
    decoder_egnn = _egnn_cfg(
        latent_nf + context_node_nf, in_node_nf, nf, n_layers, **common
    )
    vae = VAEConfig(
        in_node_nf=in_node_nf,
        latent_nf=latent_nf,
        n_dims=3,
        kl_weight=kl_weight,
        include_charges=include_charges,
        encoder_egnn=encoder_egnn,
        decoder_egnn=decoder_egnn,
        context_node_nf=context_node_nf,
    )
    return ModelConfig(kind="vae", vae=vae,
                       context_indicator=context_indicator)


def make_latent_diffusion_config(
    dataset_info: dict,
    *,
    include_charges: bool = True,
    condition_time: bool = True,
    context_node_nf: int = 0,
    context_indicator: bool = False,
    nf: int = 256,
    n_layers: int = 9,
    latent_nf: int = 1,
    kl_weight: float = 0.01,
    trainable_ae: bool = False,
    attention: bool = True,
    tanh: bool = True,
    norm_constant: float = 1.0,
    inv_sublayers: int = 1,
    sin_embedding: bool = False,
    normalization_factor: float = 1.0,
    aggregation_method: str = "sum",
    remat: bool = False,
    diffusion_steps: int = 1000,
    noise_schedule: str = "polynomial_2",
    noise_precision: float = 1e-5,
    loss_type: str = "l2",
    normalize_factors: Tuple[float, float, float] = (1.0, 4.0, 10.0),
    model: str = "egnn_dynamics",
) -> ModelConfig:
    """Latent diffusion = VAE (first stage) + diffusion in latent space.

    reference: qm9/models.py:103-166. The diffusion's in_node_nf is the
    latent dimension; include_charges semantics carry over so num_classes =
    latent_nf - include_charges (matching the reference's bookkeeping)."""
    if context_indicator:
        context_node_nf += 1  # trailing is-conditioned channel (CFG null)
    vae_model = make_vae_config(
        dataset_info,
        include_charges=include_charges,
        context_node_nf=context_node_nf,
        nf=nf,
        n_layers=n_layers,
        latent_nf=latent_nf,
        kl_weight=kl_weight,
        attention=attention,
        tanh=tanh,
        norm_constant=norm_constant,
        inv_sublayers=inv_sublayers,
        sin_embedding=sin_embedding,
        normalization_factor=normalization_factor,
        aggregation_method=aggregation_method,
        remat=remat,
    )
    dyn_in = latent_nf + int(condition_time)
    extra = 3 if model == "gnn_dynamics" else 0
    egnn = _egnn_cfg(
        dyn_in + context_node_nf + extra,
        dyn_in + context_node_nf + extra,
        nf,
        n_layers,
        attention=attention,
        tanh=tanh,
        norm_constant=norm_constant,
        inv_sublayers=inv_sublayers,
        sin_embedding=sin_embedding,
        normalization_factor=normalization_factor,
        aggregation_method=aggregation_method,
        remat=remat,
    )
    dynamics = DynamicsConfig(
        in_node_nf=latent_nf,
        context_node_nf=context_node_nf,
        n_dims=3,
        condition_time=condition_time,
        mode=model,
        egnn=egnn,
    )
    diffusion = DiffusionConfig(
        in_node_nf=latent_nf,
        n_dims=3,
        timesteps=diffusion_steps,
        noise_schedule=noise_schedule,
        noise_precision=noise_precision,
        loss_type=loss_type,
        norm_values=tuple(normalize_factors),
        include_charges=include_charges,
    )
    return ModelConfig(
        kind="latent_diffusion",
        diffusion=diffusion,
        dynamics=dynamics,
        vae=vae_model.vae,
        trainable_ae=trainable_ae,
        context_indicator=context_indicator,
    )


def init_params(key: Array, model_cfg: ModelConfig) -> dict:
    """Initialize the parameter pytree for any model kind."""
    if model_cfg.kind == "diffusion":
        return vdm.vdm_init(key, model_cfg.diffusion, model_cfg.dynamics)
    if model_cfg.kind == "vae":
        return vae_mod.vae_init(key, model_cfg.vae)
    if model_cfg.kind == "latent_diffusion":
        return ldm.ldm_init(key, model_cfg.diffusion, model_cfg.dynamics, model_cfg.vae)
    raise ValueError(model_cfg.kind)


def model_nll_fn(model_cfg: ModelConfig, training: bool, compute_dtype=None):
    """Return nll(params, key, x, h_cat, h_int, node_mask, edge_mask, context)
    -> [B] for the configured model kind."""
    if model_cfg.kind == "diffusion":

        def nll(params, key, x, h_cat, h_int, node_mask, edge_mask, context=None):
            return vdm.vdm_nll(
                params, model_cfg.diffusion, model_cfg.dynamics, key, x, h_cat,
                h_int, node_mask, edge_mask, context, training, compute_dtype,
            )

        return nll
    if model_cfg.kind == "vae":

        def nll(params, key, x, h_cat, h_int, node_mask, edge_mask, context=None):
            return vae_mod.vae_nll(
                params, model_cfg.vae, key, x, h_cat, h_int, node_mask, edge_mask,
                context, training, compute_dtype,
            )

        return nll
    if model_cfg.kind == "latent_diffusion":

        def nll(params, key, x, h_cat, h_int, node_mask, edge_mask, context=None):
            return ldm.ldm_nll(
                params, model_cfg.diffusion, model_cfg.dynamics, model_cfg.vae, key,
                x, h_cat, h_int, node_mask, edge_mask, context, training,
                model_cfg.trainable_ae, compute_dtype,
            )

        return nll
    raise ValueError(model_cfg.kind)


def model_sample_fn(model_cfg: ModelConfig, compute_dtype=None,
                    n_steps=None, eta: float = 1.0, method: str = "ddim",
                    guidance_scale: float = 1.0, clip_z: float = 0.0):
    """Return sample(params, key, node_mask, edge_mask, context, fix_noise)
    -> (x, h_cat, h_int) for generative model kinds.

    ``n_steps``/``eta``/``method``/``guidance_scale`` (static, baked into
    the closure) select the strided few-step sampler and classifier-free
    guidance — beyond the reference."""
    if model_cfg.kind == "diffusion":

        def sample(params, key, node_mask, edge_mask, context=None, fix_noise=False):
            return vdm.vdm_sample(
                params, model_cfg.diffusion, model_cfg.dynamics, key, node_mask,
                edge_mask, context, fix_noise, compute_dtype,
                n_steps=n_steps, eta=eta, method=method,
                guidance_scale=guidance_scale, clip_z=clip_z,
            )

        return sample
    if model_cfg.kind == "latent_diffusion":

        def sample(params, key, node_mask, edge_mask, context=None, fix_noise=False):
            return ldm.ldm_sample(
                params, model_cfg.diffusion, model_cfg.dynamics, model_cfg.vae, key,
                node_mask, edge_mask, context, fix_noise, compute_dtype,
                n_steps=n_steps, eta=eta, method=method,
                guidance_scale=guidance_scale, clip_z=clip_z,
            )

        return sample
    raise ValueError(f"{model_cfg.kind} is not a generative sampler")

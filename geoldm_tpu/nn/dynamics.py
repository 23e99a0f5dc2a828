"""Dynamics / encoder / decoder wrappers around the dense EGNN.

TPU-native equivalents of the reference wrappers (egnn/models.py):
- ``dynamics``: the diffusion denoiser — appends time (and context) channels
  to h, runs the EGNN, returns [vel, h] with the velocity projected back to
  the zero-CoM subspace (reference: egnn/models.py:8-113 EGNN_dynamics_QM9).
- ``encoder``: one-block EGNN + final MLP producing a per-graph scalar
  vel_std logit and per-node latent mean/std (reference: egnn/models.py:
  137-263 EGNN_encoder_QM9).
- ``decoder``: latent -> (x, h) reconstruction (reference: egnn/models.py:
  287-402 EGNN_decoder_QM9).

Everything operates on ``[B, N, ...]`` tensors; no flatten to ``[B*N, ...]``
and no cached edge-index (the reference's get_adj_matrix at
egnn/models.py:115-134 has no dense equivalent — masks carry the structure).

The reference's NaN guards (egnn/models.py:100-102, :227-229, :247-253)
become branchless ``jnp.where`` resets so they compile under jit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from geoldm_tpu.config import DynamicsConfig, EGNNConfig
from geoldm_tpu.nn.core import linear, linear_init, resolve_compute, silu
from geoldm_tpu.nn.egnn import egnn_apply, egnn_init, gnn_apply, gnn_init
from geoldm_tpu.ops.com import remove_mean_with_mask

Array = jax.Array


def _run_egnn(egnn_params, egnn_cfg, h, x, node_mask, edge_mask, compute_dtype):
    """Dispatch to the XLA graph or the fused Pallas kernel per ComputeSpec."""
    spec = resolve_compute(compute_dtype)
    if spec.full and spec.dtype is not None:
        # Whole-network low precision: cast params + activations once (the
        # cast is loop-invariant under the sampler scan, XLA hoists it);
        # outputs return to f32 for the schedule/CoM algebra.
        assert spec.backend == "xla", "full-precision-cast mode is XLA-only"
        dt = spec.dtype
        egnn_params = jax.tree.map(lambda a: a.astype(dt), egnn_params)
        hf, xf = egnn_apply(
            egnn_params, egnn_cfg, h.astype(dt), x.astype(dt),
            node_mask.astype(dt), edge_mask.astype(dt), None,
        )
        return hf.astype(jnp.float32), xf.astype(jnp.float32)
    if spec.backend == "pallas":
        from geoldm_tpu.ops.pallas_egnn import egnn_apply_pallas

        return egnn_apply_pallas(egnn_params, egnn_cfg, h, x, node_mask, spec.dtype)
    if spec.backend == "sp":
        # Sequence parallelism: atom rows sharded over the mesh's ``seq``
        # axis (edge mask is derived from the node mask, same contract as
        # the pallas path). Differentiable — used by SP training.
        from geoldm_tpu.parallel.sp import egnn_apply_sp

        return egnn_apply_sp(
            egnn_params, egnn_cfg, h, x, node_mask, spec.sp_mesh, spec.dtype,
            use_pallas=spec.sp_pallas, interpret=spec.interpret,
        )
    return egnn_apply(egnn_params, egnn_cfg, h, x, node_mask, edge_mask, spec)


def _nan_reset(x: Array, fill: float = 0.0) -> Array:
    """Replace the whole tensor by ``fill`` if it contains any NaN."""
    has_nan = jnp.any(jnp.isnan(x))
    return jnp.where(has_nan, jnp.full_like(x, fill), x)


# ---------------------------------------------------------------------------
# Dynamics (the denoiser phi).
# ---------------------------------------------------------------------------


def dynamics_init(key: Array, cfg: DynamicsConfig) -> dict:
    if cfg.mode == "egnn_dynamics":
        return {"egnn": egnn_init(key, cfg.egnn)}
    if cfg.mode == "gnn_dynamics":
        return {"gnn": gnn_init(key, cfg.egnn, in_edge_nf=0)}
    raise ValueError(cfg.mode)


def dynamics_apply(
    params: dict,
    cfg: DynamicsConfig,
    t: Array,
    xh: Array,
    node_mask: Array,
    edge_mask: Array,
    context: Optional[Array] = None,
    compute_dtype=None,
) -> Array:
    """eps-prediction network. t: [B, 1] (or scalar broadcast), xh [B, N, D].

    reference: egnn/models.py:49-113 (_forward).
    """
    b, n, dims = xh.shape
    h_dims = dims - cfg.n_dims
    xh = xh * node_mask
    x = xh[..., : cfg.n_dims]
    if h_dims == 0:
        h = jnp.ones((b, n, 1), dtype=xh.dtype)
    else:
        h = xh[..., cfg.n_dims :]

    if cfg.condition_time:
        t = jnp.asarray(t, dtype=xh.dtype)
        h_time = jnp.broadcast_to(t.reshape(-1, 1, 1), (b, n, 1))
        h = jnp.concatenate([h, h_time], axis=-1)

    if context is not None:
        h = jnp.concatenate([h, context], axis=-1)

    if cfg.mode == "egnn_dynamics":
        h_final, x_final = _run_egnn(
            params["egnn"], cfg.egnn, h, x, node_mask, edge_mask, compute_dtype
        )
        vel = (x_final - x) * node_mask
    elif cfg.mode == "gnn_dynamics":
        out = gnn_apply(
            params["gnn"], cfg.egnn, jnp.concatenate([x, h], axis=-1),
            None, node_mask, edge_mask, compute_dtype,
        )
        vel = out[..., : cfg.n_dims] * node_mask
        h_final = out[..., cfg.n_dims :]
    else:
        raise ValueError(cfg.mode)

    if context is not None:
        h_final = h_final[..., : h_final.shape[-1] - cfg.context_node_nf]
    if cfg.condition_time:
        h_final = h_final[..., :-1]

    vel = _nan_reset(vel)
    vel = remove_mean_with_mask(vel, node_mask)

    if h_dims == 0:
        return vel
    return jnp.concatenate([vel, h_final], axis=-1)


# ---------------------------------------------------------------------------
# VAE encoder.
# ---------------------------------------------------------------------------


def encoder_init(key: Array, cfg: EGNNConfig, latent_nf: int) -> dict:
    """EGNN (out_node_nf = hidden_nf) + final MLP -> 2*latent_nf + 1.

    reference: egnn/models.py:152-171 (encoder egnn + final_mlp).
    """
    k_egnn, k1, k2 = jax.random.split(key, 3)
    return {
        "egnn": egnn_init(k_egnn, cfg),
        "final_mlp": (
            linear_init(k1, cfg.hidden_nf, cfg.hidden_nf),
            linear_init(k2, cfg.hidden_nf, 2 * latent_nf + 1),
        ),
    }


def encoder_apply(
    params: dict,
    cfg: EGNNConfig,
    latent_nf: int,
    n_dims: int,
    xh: Array,
    node_mask: Array,
    edge_mask: Array,
    context: Optional[Array] = None,
    compute_dtype=None,
):
    """-> (vel_mean [B,N,3], vel_std [B,1,1], h_mean [B,N,latent],
    h_std [B,N,latent]). vel_std is a per-graph scalar: the logit is summed
    over nodes (reference: egnn/models.py:240-245)."""
    b, n, dims = xh.shape
    xh = xh * node_mask
    x = xh[..., :n_dims]
    h = xh[..., n_dims:] if dims > n_dims else jnp.ones((b, n, 1), dtype=xh.dtype)
    if context is not None:
        h = jnp.concatenate([h, context], axis=-1)

    h_final, x_final = _run_egnn(
        params["egnn"], cfg, h, x, node_mask, edge_mask, compute_dtype
    )
    vel = x_final * node_mask
    vel = _nan_reset(vel)
    vel = remove_mean_with_mask(vel, node_mask)

    h_final = linear(
        params["final_mlp"][1],
        silu(linear(params["final_mlp"][0], h_final, compute_dtype)),
        compute_dtype,
    )
    h_final = h_final * node_mask

    vel_std_logit = jnp.sum(h_final[..., :1], axis=1, keepdims=True)  # [B,1,1]
    vel_std = jnp.exp(0.5 * vel_std_logit)
    h_mean = h_final[..., 1 : 1 + latent_nf]
    h_std = jnp.exp(0.5 * h_final[..., 1 + latent_nf :])

    vel_std = jnp.where(jnp.any(jnp.isnan(vel_std)), jnp.ones_like(vel_std), vel_std)
    h_std = jnp.where(jnp.any(jnp.isnan(h_std)), jnp.ones_like(h_std), h_std)
    return vel, vel_std, h_mean, h_std


# ---------------------------------------------------------------------------
# VAE decoder.
# ---------------------------------------------------------------------------


def decoder_init(key: Array, cfg: EGNNConfig) -> dict:
    return {"egnn": egnn_init(key, cfg)}


def decoder_apply(
    params: dict,
    cfg: EGNNConfig,
    n_dims: int,
    z_xh: Array,
    node_mask: Array,
    edge_mask: Array,
    context: Optional[Array] = None,
    compute_dtype=None,
):
    """latent [B,N,3+latent_nf] -> (x_recon [B,N,3], h_recon [B,N,out]).

    reference: egnn/models.py:335-381."""
    b, n, dims = z_xh.shape
    z_xh = z_xh * node_mask
    x = z_xh[..., :n_dims]
    h = z_xh[..., n_dims:] if dims > n_dims else jnp.ones((b, n, 1), dtype=z_xh.dtype)
    if context is not None:
        h = jnp.concatenate([h, context], axis=-1)

    h_final, x_final = _run_egnn(
        params["egnn"], cfg, h, x, node_mask, edge_mask, compute_dtype
    )
    vel = x_final * node_mask
    vel = _nan_reset(vel)
    vel = remove_mean_with_mask(vel, node_mask)
    h_final = h_final * node_mask
    return vel, h_final

"""Jitted, sharded training step with EMA.

The step fuses: loss (NLL minus the molecule-size log-prior), grads,
adaptive clipping, AMSGrad update, and the EMA pytree lerp — one compiled
SPMD program per step. The reference splits this across Python
(train_test.py:15-94) with host syncs for asserts/clipping; here the only
host interaction is the metrics fetch.

Batches are dicts of arrays:
  x [B,N,3], h_cat [B,N,C], h_int [B,N,0/1], node_mask [B,N,1],
  edge_mask [B,N,N,1], log_pN [B], (optional) context [B,N,ctx].
``log_pN`` is the host-precomputed log p(N) from DistributionNodes
(reference: qm9/losses.py:25-31).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from geoldm_tpu.config import ModelConfig, TrainConfig
from geoldm_tpu.models import factory
from geoldm_tpu.train import optim as optim_mod

Array = jax.Array


class TrainState(NamedTuple):
    step: Array
    params: Any
    opt_state: Any
    ema_params: Any


def create_train_state(
    key: Array, model_cfg: ModelConfig, train_cfg: TrainConfig
) -> tuple[TrainState, optax.GradientTransformation]:
    params = factory.init_params(key, model_cfg)
    mask = optim_mod.trainable_mask(params, model_cfg.kind, model_cfg.trainable_ae)
    tx = optim_mod.make_optimizer(
        lr=train_cfg.lr,
        weight_decay=train_cfg.weight_decay,
        clip_grad=train_cfg.clip_grad,
        frozen_mask=mask,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
    )
    return state, tx


def make_train_step(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    tx: optax.GradientTransformation,
    compute_dtype=None,
):
    """Build the pure train_step(state, batch, key) -> (state, metrics)."""
    nll_fn = factory.model_nll_fn(model_cfg, training=True, compute_dtype=compute_dtype)
    ema_decay = train_cfg.ema_decay
    ctx_drop = float(getattr(train_cfg, "context_dropout", 0.0))

    def loss_fn(params, batch, key):
        context = batch.get("context")
        if context is not None and ctx_drop > 0.0:
            # Classifier-free guidance training (Ho & Salimans 2022):
            # per molecule, replace the context with the all-zero null
            # condition with probability context_dropout, so the one model
            # learns both scores and sampling can blend them
            # (vdm.guided_eps).
            key, k_drop = jax.random.split(key)
            keep = jax.random.bernoulli(
                k_drop, 1.0 - ctx_drop, (context.shape[0], 1, 1))
            context = context * keep.astype(context.dtype)
        nll = nll_fn(
            params,
            key,
            batch["x"],
            batch["h_cat"],
            batch["h_int"],
            batch["node_mask"],
            batch["edge_mask"],
            context,
        )
        nll = nll - batch["log_pN"]
        return jnp.mean(nll)

    def train_step(state: TrainState, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if ema_decay > 0:
            ema_params = optim_mod.ema_update(state.ema_params, params, ema_decay)
        else:
            ema_params = params
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
        )
        return new_state, metrics

    return train_step


def make_eval_nll(model_cfg: ModelConfig, compute_dtype=None):
    """Eval NLL (t0_always two-pass estimator) -> mean NLL over batch.

    An optional ``weight`` entry ([B], 0/1) turns the mean into a weighted
    mean — used to pad uneven tail batches to a shardable size with
    repeated zero-weight molecules instead of dropping molecules (repeats,
    not zero-mask rows: an all-zero mask NaNs the latent per-graph
    reductions and NaN * 0 = NaN)."""
    nll_fn = factory.model_nll_fn(model_cfg, training=False, compute_dtype=compute_dtype)

    def eval_nll(params, batch, key):
        nll = nll_fn(
            params,
            key,
            batch["x"],
            batch["h_cat"],
            batch["h_int"],
            batch["node_mask"],
            batch["edge_mask"],
            batch.get("context"),
        )
        nll = nll - batch["log_pN"]
        w = batch.get("weight")
        if w is None:
            return jnp.mean(nll)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

    return eval_nll

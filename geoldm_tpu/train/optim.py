"""Optimizer stack: AMSGrad + tiny weight decay + adaptive gradient clipping.

The reference trains with AdamW(amsgrad=True, wd=1e-12) (qm9/models.py:
169-175) and clips gradients to 1.5*mean + 2*std of the last 50 observed
grad norms, seeded with a large flushable value (utils.py:30-66 Queue +
gradient_clipping; main_qm9.py:216-217). Here the whole thing is a single
optax chain whose clipping state lives in the optimizer state pytree — no
host-side queue, no device syncs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


class AdaptiveClipState(NamedTuple):
    norms: Array  # [max_len] ring buffer of recent (clipped) grad norms
    count: Array  # [] int32 — number of valid entries
    head: Array  # [] int32 — next write position


def adaptive_grad_clip(max_len: int = 50, init_value: float = 3000.0) -> optax.GradientTransformation:
    """Clip the global grad norm at 1.5*mean + 2*std of recent history.

    The history receives min(grad_norm, allowed) each step, so one loss
    spike cannot poison the threshold. reference: utils.py:50-66."""

    def init_fn(params):
        del params
        norms = jnp.zeros((max_len,), dtype=jnp.float32).at[0].set(init_value)
        return AdaptiveClipState(
            norms=norms, count=jnp.array(1, jnp.int32), head=jnp.array(1, jnp.int32)
        )

    def update_fn(updates, state, params=None):
        del params
        grad_norm = optax.global_norm(updates)

        valid = (
            jnp.arange(state.norms.shape[0]) < state.count
        ).astype(jnp.float32)
        n = jnp.maximum(state.count.astype(jnp.float32), 1.0)
        mean = jnp.sum(state.norms * valid) / n
        var = jnp.sum(jnp.square(state.norms - mean) * valid) / n
        std = jnp.sqrt(jnp.maximum(var, 0.0))
        max_grad_norm = 1.5 * mean + 2.0 * std

        scale = jnp.minimum(1.0, max_grad_norm / (grad_norm + 1e-12))
        updates = jax.tree.map(lambda g: g * scale, updates)

        recorded = jnp.minimum(grad_norm, max_grad_norm)
        norms = state.norms.at[state.head % state.norms.shape[0]].set(recorded)
        new_state = AdaptiveClipState(
            norms=norms,
            count=jnp.minimum(state.count + 1, state.norms.shape[0]),
            head=state.head + 1,
        )
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_amsgrad_torch(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """AMSGrad with PyTorch's bias-correction placement.

    torch maxes the RAW second-moment EMA and divides the max by the
    CURRENT step's bias correction (``denom = sqrt(max_nu / bc2) + eps``,
    torch/optim/adam.py), so an early gradient spike's influence decays
    as ``bc2 -> 1``. ``optax.scale_by_amsgrad`` instead maxes the
    bias-CORRECTED ``nu_hat``, permanently locking in the inflated
    early-step values: under a decaying-gradient sequence its step sizes
    shrink to ~0.26x torch's within 300 steps (measured, both optimizers
    fed identical gradients), which surfaced as PARITY_TRAIN's
    early-window loss-ratio bump (pooled jax/torch 1.084 in steps 50-99,
    all 5 seeds > 1, decaying to ~1.00 by step 250). The reference trains
    with AdamW(amsgrad=True) (qm9/models.py:169-175), so torch semantics
    are the parity-correct choice. State layout reuses
    optax.ScaleByAmsgradState — checkpoint templates are unchanged.

    Resume caveat: optimizer state saved by the pre-round-4 optax
    variant loads structurally, but its ``nu_max`` holds the max of
    bias-corrected nu-hat; this rule divides it by bc2 again, so a
    resume from an EARLY-stage old checkpoint (bc2 far from 1)
    transiently shrinks step sizes until fresh nu maxima take over.
    Late-stage resumes (bc2 ~= 1, the practical case) are unaffected;
    no version marker is kept because the two interpretations converge
    with training and the discrepancy is self-healing."""

    def init_fn(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)  # noqa: E731
        return optax.ScaleByAmsgradState(
            count=jnp.zeros([], jnp.int32), mu=zeros(), nu=zeros(),
            nu_max=zeros(),
        )

    def update_fn(updates, state, params=None):
        del params
        count_inc = optax.safe_increment(state.count)
        mu = jax.tree.map(lambda g, m: b1 * m + (1 - b1) * g,
                          updates, state.mu)
        nu = jax.tree.map(lambda g, v: b2 * v + (1 - b2) * g * g,
                          updates, state.nu)
        nu_max = jax.tree.map(jnp.maximum, state.nu_max, nu)
        c = count_inc.astype(jnp.float32)
        bc1 = 1.0 - jnp.asarray(b1, jnp.float32) ** c
        bc2 = 1.0 - jnp.asarray(b2, jnp.float32) ** c
        updates = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu_max
        )
        return updates, optax.ScaleByAmsgradState(
            count=count_inc, mu=mu, nu=nu, nu_max=nu_max
        )

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 1e-12,
    clip_grad: bool = True,
    frozen_mask=None,
) -> optax.GradientTransformation:
    """AMSGrad (torch semantics) + decoupled weight decay (+ adaptive
    clipping).

    ``frozen_mask``: optional pytree of bools (True = trainable); frozen
    leaves receive zero updates — the reference's requires_grad=False
    freezing of the first-stage VAE (en_diffusion.py:1234-1243)."""
    parts = []
    if clip_grad:
        parts.append(adaptive_grad_clip())
    parts.append(scale_by_amsgrad_torch())
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale(-lr))
    tx = optax.chain(*parts)
    if frozen_mask is not None:
        tx = optax.masked(tx, frozen_mask)
        if not all(jax.tree.leaves(frozen_mask)):
            # optax.masked passes masked-OUT leaves' updates through
            # UNCHANGED (the raw gradient, not zero) — the frozen VAE would
            # only stay frozen while its grads happen to be exactly zero.
            # Explicitly zero the frozen leaves so freezing holds even if a
            # future loss term sends gradient into them. Only added when
            # something IS frozen: the wrapper changes the opt_state pytree
            # structure, and an all-True mask would churn every
            # non-frozen-model checkpoint for a no-op transform.
            inverse = jax.tree.map(lambda t: not t, frozen_mask)
            tx = optax.chain(tx, optax.masked(optax.set_to_zero(), inverse))
    return tx


def trainable_mask(params, model_kind: str, trainable_ae: bool):
    """True = trainable. The VAE subtree is frozen for latent diffusion
    unless trainable_ae (and even then the encoder gets no grads via
    stop_gradient, matching the reference detach semantics)."""
    if model_kind != "latent_diffusion" or trainable_ae:
        return jax.tree.map(lambda _: True, params)
    return {
        k: jax.tree.map(lambda _: k != "vae", v) if k == "vae" else jax.tree.map(lambda _: True, v)
        for k, v in params.items()
    }


def ema_update(ema_params, params, decay: float):
    """Polyak averaging (reference: equivariant_diffusion/utils.py:5-18)."""
    return jax.tree.map(lambda e, p: e * decay + p * (1.0 - decay), ema_params, params)

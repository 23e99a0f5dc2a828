"""Noise schedules and the gamma parametrization of the diffusion process.

The process is parametrized by gamma(t) = -log(alpha_t^2 / sigma_t^2) with
alpha_t^2 = sigmoid(-gamma), sigma_t^2 = sigmoid(gamma), t in [0, 1].

Predefined schedules are (T+1)-entry lookup tables built on host with numpy
(reference: en_diffusion.py:23-72 schedule constructors, :172-207
PredefinedNoiseSchedule); the learned schedule is a monotone network of
positive-weight linear layers (reference: en_diffusion.py:122-152
PositiveLinear, :210-247 GammaNetwork). All gamma/sigma/alpha algebra runs in
float32 — the sampler's numerical parity depends on it.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# Predefined schedules (host-side table construction).
# ---------------------------------------------------------------------------


def clip_noise_schedule(alphas2: np.ndarray, clip_value: float = 0.001) -> np.ndarray:
    """Clip per-step alpha ratios for sampling stability.

    reference: en_diffusion.py:23-35.
    """
    alphas2 = np.concatenate([np.ones(1), alphas2], axis=0)
    alphas_step = alphas2[1:] / alphas2[:-1]
    alphas_step = np.clip(alphas_step, a_min=clip_value, a_max=1.0)
    return np.cumprod(alphas_step, axis=0)


def polynomial_schedule(timesteps: int, s: float = 1e-4, power: float = 2.0) -> np.ndarray:
    """alpha^2 schedule (1 - (t/T)^power)^2 with precision clamp.

    reference: en_diffusion.py:38-52.
    """
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas2 = (1 - np.power(x / steps, power)) ** 2
    alphas2 = clip_noise_schedule(alphas2, clip_value=0.001)
    precision = 1 - 2 * s
    return precision * alphas2 + s


def cosine_beta_schedule(timesteps: int, s: float = 0.008, raise_to_power: float = 1.0) -> np.ndarray:
    """Cosine alpha-bar schedule (Nichol & Dhariwal).

    reference: en_diffusion.py:55-72.
    """
    steps = timesteps + 2
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    betas = np.clip(betas, a_min=0, a_max=0.999)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    if raise_to_power != 1:
        alphas_cumprod = np.power(alphas_cumprod, raise_to_power)
    return alphas_cumprod


def gamma_table(noise_schedule: str, timesteps: int, precision: float) -> np.ndarray:
    """(T+1)-entry gamma lookup table for a predefined schedule.

    reference: en_diffusion.py:176-203 (PredefinedNoiseSchedule.__init__).
    """
    if noise_schedule == "cosine":
        alphas2 = cosine_beta_schedule(timesteps)
    elif "polynomial" in noise_schedule:
        splits = noise_schedule.split("_")
        assert len(splits) == 2, noise_schedule
        power = float(splits[1])
        alphas2 = polynomial_schedule(timesteps, s=precision, power=power)
    else:
        raise ValueError(f"unknown noise schedule {noise_schedule!r}")
    sigmas2 = 1 - alphas2
    gamma = -(np.log(alphas2) - np.log(sigmas2))
    return gamma.astype(np.float64)


def gamma_lookup(table: Array, t: Array, timesteps: int) -> Array:
    """gamma(t) for t in [0, 1] via rounded table lookup.

    ``t`` has shape [B] or [B, 1]; the return matches ``t``'s shape.
    reference: en_diffusion.py:205-207.
    """
    t_int = jnp.round(t.astype(jnp.float32) * timesteps).astype(jnp.int32)
    return table.astype(jnp.float32)[t_int]


# ---------------------------------------------------------------------------
# Learned monotone gamma network.
# ---------------------------------------------------------------------------


def _torch_linear_uniform(key: Array, in_f: int, out_f: int, offset: float = 0.0):
    """Torch-default kaiming_uniform(a=sqrt(5)) init => U(-1/sqrt(fan_in), ...)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_f)
    w = jax.random.uniform(kw, (in_f, out_f), minval=-bound, maxval=bound) + offset
    b = jax.random.uniform(kb, (out_f,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def gamma_network_init(key: Array) -> dict:
    """Params for the learned gamma network.

    Layer sizes 1->1, 1->1024, 1024->1 with softplus-positive weights and a
    weight-init offset of -2 (reference: en_diffusion.py:122-148, :210-221).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "l1": _torch_linear_uniform(k1, 1, 1, offset=-2.0),
        "l2": _torch_linear_uniform(k2, 1, 1024, offset=-2.0),
        "l3": _torch_linear_uniform(k3, 1024, 1, offset=-2.0),
        "gamma_0": jnp.array([-5.0], dtype=jnp.float32),
        "gamma_1": jnp.array([10.0], dtype=jnp.float32),
    }


def _positive_linear(p: dict, x: Array) -> Array:
    return x @ jax.nn.softplus(p["w"]) + p["b"]


def _gamma_tilde(params: dict, t: Array) -> Array:
    l1_t = _positive_linear(params["l1"], t)
    return l1_t + _positive_linear(params["l3"], jax.nn.sigmoid(_positive_linear(params["l2"], l1_t)))


def gamma_network_apply(params: dict, t: Array) -> Array:
    """Monotone gamma(t), normalized to [gamma_0, gamma_1] over t in [0, 1].

    ``t`` has shape [B, 1]. reference: en_diffusion.py:229-247.
    """
    t = t.astype(jnp.float32)
    zeros = jnp.zeros_like(t)
    ones = jnp.ones_like(t)
    g0 = _gamma_tilde(params, zeros)
    g1 = _gamma_tilde(params, ones)
    gt = _gamma_tilde(params, t)
    normalized = (gt - g0) / (g1 - g0)
    return params["gamma_0"] + (params["gamma_1"] - params["gamma_0"]) * normalized


# ---------------------------------------------------------------------------
# gamma -> (sigma, alpha, SNR) algebra. Always float32.
# ---------------------------------------------------------------------------


def inflate(array: Array, ndim: int) -> Array:
    """Reshape [B] or [B,1] to [B, 1, ..., 1] with ``ndim`` axes total.

    reference: en_diffusion.py:319-325.
    """
    return array.reshape(array.shape[0], *([1] * (ndim - 1)))


def sigma(gamma: Array, ndim: int) -> Array:
    """sqrt(sigmoid(gamma)). reference: en_diffusion.py:327-329."""
    return inflate(jnp.sqrt(jax.nn.sigmoid(gamma)), ndim)


def alpha(gamma: Array, ndim: int) -> Array:
    """sqrt(sigmoid(-gamma)). reference: en_diffusion.py:331-333."""
    return inflate(jnp.sqrt(jax.nn.sigmoid(-gamma)), ndim)


def snr(gamma: Array) -> Array:
    """alpha^2/sigma^2 = exp(-gamma). reference: en_diffusion.py:335-337."""
    return jnp.exp(-gamma)


def sigma_and_alpha_t_given_s(gamma_t: Array, gamma_s: Array, ndim: int):
    """Transition coefficients between two noise levels (used in sampling).

    sigma^2_{t|s} = -expm1(softplus(gamma_s) - softplus(gamma_t)),
    alpha_{t|s} = alpha_t / alpha_s computed in log space.
    reference: en_diffusion.py:382-405.
    """
    sigma2_t_given_s = inflate(
        -jnp.expm1(jax.nn.softplus(gamma_s) - jax.nn.softplus(gamma_t)), ndim
    )
    log_alpha2_t = jax.nn.log_sigmoid(-gamma_t)
    log_alpha2_s = jax.nn.log_sigmoid(-gamma_s)
    alpha_t_given_s = inflate(jnp.exp(0.5 * (log_alpha2_t - log_alpha2_s)), ndim)
    sigma_t_given_s = jnp.sqrt(sigma2_t_given_s)
    return sigma2_t_given_s, sigma_t_given_s, alpha_t_given_s


def check_issues_norm_values(
    table: np.ndarray, norm_values, num_stdevs: int = 8
) -> None:
    """Raise if sigma_0 is too large for the chosen normalization.

    reference: en_diffusion.py:299-312.
    """
    gamma_0 = float(table[0])
    sigma_0 = math.sqrt(1.0 / (1.0 + math.exp(-gamma_0)))  # sqrt(sigmoid(gamma_0))
    max_norm_value = max(norm_values[1], norm_values[2])
    if sigma_0 * num_stdevs > 1.0 / max_norm_value:
        raise ValueError(
            f"Normalization value {max_norm_value} probably too large with "
            f"sigma_0 {sigma_0:.5f} and 1/norm_value = {1.0 / max_norm_value}"
        )

"""E(n) variational diffusion model (VDM) over joint [x, h] molecule states.

Functional re-design of the reference EnVariationalDiffusion
(equivariant_diffusion/en_diffusion.py:254-855): eps-parametrized DDPM with
T discrete steps, VLB and L2 losses, and an ancestral sampler. All
distributions over the coordinate part live on the masked zero-CoM subspace.

TPU-first changes vs the reference:
- pure functions over explicit param pytrees + RNG keys,
- the T-step reverse loop is a single ``lax.scan`` (reference runs a Python
  loop with one host-driven launch per step — en_diffusion.py:776-782),
- gamma/sigma/alpha algebra in float32; the denoiser EGNN may run bf16,
- no `.item()` asserts; invariants live in the test suite.

The "h" part of a molecule is split into a categorical one-hot block
``h_cat [B,N,num_classes]`` and an integer block ``h_int [B,N,include_charges]``
(the reference's ``h = {'categorical', 'integer'}`` dict).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from geoldm_tpu.config import DiffusionConfig, DynamicsConfig
from geoldm_tpu.diffusion import schedules as S
from geoldm_tpu.nn.dynamics import dynamics_apply, dynamics_init
from geoldm_tpu.ops import com

Array = jax.Array


# ---------------------------------------------------------------------------
# Params / gamma plumbing
# ---------------------------------------------------------------------------


def vdm_init(key: Array, cfg: DiffusionConfig, dyn_cfg: DynamicsConfig) -> dict:
    """Build the VDM parameter pytree: denoiser + (optionally) learned gamma."""
    k_dyn, k_gamma = jax.random.split(key)
    params = {"dynamics": dynamics_init(k_dyn, dyn_cfg)}
    if cfg.noise_schedule == "learned":
        assert cfg.loss_type == "vlb", "learned schedule requires vlb loss"
        params["gamma"] = S.gamma_network_init(k_gamma)
    else:
        S.check_issues_norm_values(
            S.gamma_table(cfg.noise_schedule, cfg.timesteps, cfg.noise_precision),
            cfg.norm_values,
        )
    return params


def make_gamma_fn(cfg: DiffusionConfig, params: dict) -> Callable[[Array], Array]:
    """gamma(t) for t in [0,1], shape-preserving over [B] or [B,1] inputs."""
    if cfg.noise_schedule == "learned":
        gamma_params = params["gamma"]

        def gamma_fn(t: Array) -> Array:
            t2 = t.reshape(-1, 1)
            out = S.gamma_network_apply(gamma_params, t2)
            return out.reshape(t.shape)

        return gamma_fn

    table = jnp.asarray(
        S.gamma_table(cfg.noise_schedule, cfg.timesteps, cfg.noise_precision),
        dtype=jnp.float32,
    )

    def gamma_fn(t: Array) -> Array:
        return S.gamma_lookup(table, t, cfg.timesteps)

    return gamma_fn


# ---------------------------------------------------------------------------
# Normalization (reference: en_diffusion.py:344-380)
# ---------------------------------------------------------------------------


def normalize(cfg: DiffusionConfig, x, h_cat, h_int, node_mask):
    x = x / cfg.norm_values[0]
    delta_log_px = -com.subspace_dimensionality(node_mask, cfg.n_dims) * math.log(
        cfg.norm_values[0]
    )
    h_cat = (h_cat.astype(jnp.float32) - cfg.norm_biases[1]) / cfg.norm_values[1]
    h_cat = h_cat * node_mask
    h_int = (h_int.astype(jnp.float32) - cfg.norm_biases[2]) / cfg.norm_values[2]
    if cfg.include_charges:
        h_int = h_int * node_mask
    return x, h_cat, h_int, delta_log_px


def unnormalize(cfg: DiffusionConfig, x, h_cat, h_int, node_mask):
    x = x * cfg.norm_values[0]
    h_cat = (h_cat * cfg.norm_values[1] + cfg.norm_biases[1]) * node_mask
    h_int = h_int * cfg.norm_values[2] + cfg.norm_biases[2]
    if cfg.include_charges:
        h_int = h_int * node_mask
    return x, h_cat, h_int


def unnormalize_z(cfg: DiffusionConfig, z, node_mask):
    """reference: en_diffusion.py:371-380."""
    nd, nc = cfg.n_dims, cfg.num_classes
    x = z[:, :, :nd]
    h_cat = z[:, :, nd : nd + nc]
    h_int = z[:, :, nd + nc : nd + nc + int(cfg.include_charges)]
    x, h_cat, h_int = unnormalize(cfg, x, h_cat, h_int, node_mask)
    return jnp.concatenate([x, h_cat, h_int], axis=2)


# ---------------------------------------------------------------------------
# Noise / prior pieces
# ---------------------------------------------------------------------------


def sample_combined_position_feature_noise(
    key: Array, node_mask: Array, n_dims: int, feat_nf: int
) -> Array:
    """CoM-zero noise on the x block, standard masked normal on the h block.

    reference: en_diffusion.py:749-760."""
    b, n, _ = node_mask.shape
    kx, kh = jax.random.split(key)
    z_x = com.sample_center_gravity_zero_gaussian_with_mask(
        kx, (b, n, n_dims), node_mask
    )
    z_h = com.sample_gaussian_with_mask(kh, (b, n, feat_nf), node_mask)
    return jnp.concatenate([z_x, z_h], axis=2)


def kl_prior(cfg: DiffusionConfig, gamma_fn, xh, node_mask) -> Array:
    """KL(q(z_T | x) || N(0, I)) — negligible but diagnostic.

    reference: en_diffusion.py:407-435."""
    b = xh.shape[0]
    ones = jnp.ones((b, 1), dtype=jnp.float32)
    gamma_T = gamma_fn(ones)
    alpha_T = S.alpha(gamma_T, xh.ndim)
    mu_T = alpha_T * xh
    mu_T_x, mu_T_h = mu_T[:, :, : cfg.n_dims], mu_T[:, :, cfg.n_dims :]
    sigma_T_x = S.sigma(gamma_T, 1).reshape(b)
    sigma_T_h = S.sigma(gamma_T, mu_T_h.ndim)

    kl_h = com.gaussian_kl(
        mu_T_h, sigma_T_h * jnp.ones_like(mu_T_h), jnp.zeros_like(mu_T_h),
        jnp.ones_like(mu_T_h), node_mask,
    )
    subspace_d = com.subspace_dimensionality(node_mask, cfg.n_dims)
    kl_x = com.gaussian_kl_for_dimension(
        mu_T_x, sigma_T_x, jnp.zeros_like(mu_T_x), jnp.ones((b,)), subspace_d
    )
    return kl_x + kl_h


def compute_x_pred(cfg: DiffusionConfig, net_out, zt, gamma_t) -> Array:
    """Most-likely x given the eps prediction. reference: en_diffusion.py:437-449."""
    sigma_t = S.sigma(gamma_t, net_out.ndim)
    alpha_t = S.alpha(gamma_t, net_out.ndim)
    return 1.0 / alpha_t * (zt - sigma_t * net_out)


def compute_error(cfg: DiffusionConfig, net_out, eps, training: bool) -> Array:
    """Squared eps error; mean-normalized under training l2.

    reference: en_diffusion.py:451-459."""
    err = com.sum_except_batch(jnp.square(eps - net_out))
    if training and cfg.loss_type == "l2":
        denom = (cfg.n_dims + cfg.in_node_nf) * net_out.shape[1]
        err = err / denom
    return err


def log_constants_p_x_given_z0(cfg: DiffusionConfig, gamma_fn, node_mask) -> Array:
    """Constant part of log p(x | z0) on the (N-1)*3 subspace.

    reference: en_diffusion.py:461-475."""
    b = node_mask.shape[0]
    n_nodes = com.num_nodes(node_mask)
    degrees_of_freedom_x = (n_nodes - 1.0) * cfg.n_dims
    zeros = jnp.zeros((b, 1), dtype=jnp.float32)
    gamma_0 = gamma_fn(zeros)
    log_sigma_x = 0.5 * gamma_0.reshape(b)
    return degrees_of_freedom_x * (-log_sigma_x - 0.5 * math.log(2 * math.pi))


def log_pxh_given_z0_without_constants(
    cfg: DiffusionConfig, h_cat, h_int, z_t, gamma_0, eps, net_out, node_mask,
    training: bool, epsilon: float = 1e-10,
) -> Array:
    """Cross-entropy style terms for the t=0 decoding of x, one-hot h and
    integer charges. reference: en_diffusion.py:505-566."""
    nd = cfg.n_dims
    inc = int(cfg.include_charges)
    z_h_cat = z_t[:, :, nd : z_t.shape[2] - inc]
    z_h_int = z_t[:, :, z_t.shape[2] - inc :] if inc else jnp.zeros_like(z_t[:, :, :0])

    eps_x = eps[:, :, :nd]
    net_x = net_out[:, :, :nd]

    sigma_0 = S.sigma(gamma_0, z_t.ndim)
    sigma_0_cat = sigma_0 * cfg.norm_values[1]
    sigma_0_int = sigma_0 * cfg.norm_values[2]

    # x-part: eps-error with weight exactly 1.
    log_p_x_given_z_wc = -0.5 * compute_error(cfg, net_x, eps_x, training)

    # Integer part: integrate the Gaussian over +-0.5 around the target.
    # The CDF difference is a probability mass; f32 erf rounding can make it
    # (harmlessly) negative by ~1e-7 at extreme arguments, which would turn
    # the log into NaN — and with this term computed-then-masked for every t
    # (the t_is_zero select below), a single NaN would poison the whole
    # batch loss. Clamp at 0 before the epsilon.
    h_integer = jnp.round(h_int * cfg.norm_values[2] + cfg.norm_biases[2])
    est_h_int = z_h_int * cfg.norm_values[2] + cfg.norm_biases[2]
    h_int_centered = h_integer - est_h_int
    log_ph_integer = jnp.log(
        jnp.maximum(
            com.cdf_standard_gaussian((h_int_centered + 0.5) / sigma_0_int)
            - com.cdf_standard_gaussian((h_int_centered - 0.5) / sigma_0_int),
            0.0,
        )
        + epsilon
    )
    log_ph_integer = com.sum_except_batch(log_ph_integer * node_mask)

    # Categorical part: integral around the one-hot peak, normalized.
    onehot = h_cat * cfg.norm_values[1] + cfg.norm_biases[1]
    est_h_cat = z_h_cat * cfg.norm_values[1] + cfg.norm_biases[1]
    centered = est_h_cat - 1.0
    log_ph_cat_prop = jnp.log(
        jnp.maximum(
            com.cdf_standard_gaussian((centered + 0.5) / sigma_0_cat)
            - com.cdf_standard_gaussian((centered - 0.5) / sigma_0_cat),
            0.0,
        )
        + epsilon
    )
    log_z = jax.nn.logsumexp(log_ph_cat_prop, axis=2, keepdims=True)
    log_probabilities = log_ph_cat_prop - log_z
    log_ph_cat = com.sum_except_batch(log_probabilities * onehot * node_mask)

    return log_p_x_given_z_wc + log_ph_integer + log_ph_cat


# ---------------------------------------------------------------------------
# Loss (reference: en_diffusion.py:568-714)
# ---------------------------------------------------------------------------


class VDMLossInfo(NamedTuple):
    t_int: Array
    error: Array


def compute_loss(
    params: dict,
    cfg: DiffusionConfig,
    dyn_cfg: DynamicsConfig,
    key: Array,
    x: Array,
    h_cat: Array,
    h_int: Array,
    node_mask: Array,
    edge_mask: Array,
    context: Optional[Array],
    t0_always: bool,
    training: bool,
    compute_dtype=None,
    latent_space: bool = False,
) -> tuple[Array, VDMLossInfo]:
    """Estimator of -log p(x, h) (up to normalization constants handled by
    the caller). Inputs are already normalized.

    With ``latent_space=True`` the t=0 decoding term collapses to the plain
    eps error — the EnLatentDiffusion override of
    log_pxh_given_z0_without_constants (reference: en_diffusion.py:1124-1134).
    """

    def log_pxh_z0(h_cat_, h_int_, z_, gamma_, eps_, net_out_):
        if latent_space:
            return -0.5 * compute_error(cfg, net_out_, eps_, training)
        return log_pxh_given_z0_without_constants(
            cfg, h_cat_, h_int_, z_, gamma_, eps_, net_out_, node_mask, training
        )

    gamma_fn = make_gamma_fn(cfg, params)
    b, n, _ = x.shape
    feat_nf = cfg.in_node_nf

    k_t, k_eps, k_eps0 = jax.random.split(key, 3)

    lowest_t = 1 if t0_always else 0
    t_int = jax.random.randint(k_t, (b, 1), lowest_t, cfg.timesteps + 1).astype(
        jnp.float32
    )
    s_int = t_int - 1
    t_is_zero = (t_int == 0).astype(jnp.float32)

    s = s_int / cfg.timesteps
    t = t_int / cfg.timesteps

    gamma_s = gamma_fn(s)
    gamma_t = gamma_fn(t)

    alpha_t = S.alpha(gamma_t, x.ndim)
    sigma_t = S.sigma(gamma_t, x.ndim)

    eps = sample_combined_position_feature_noise(k_eps, node_mask, cfg.n_dims, feat_nf)
    xh = jnp.concatenate([x, h_cat, h_int], axis=2)
    z_t = alpha_t * xh + sigma_t * eps

    net_out = dynamics_apply(
        params["dynamics"], dyn_cfg, t, z_t, node_mask, edge_mask, context,
        compute_dtype,
    )

    error = compute_error(cfg, net_out, eps, training)

    if training and cfg.loss_type == "l2":
        snr_weight = jnp.ones_like(error)
    else:
        snr_weight = (S.snr(gamma_s - gamma_t) - 1.0).reshape(b)
    loss_t_larger_than_zero = 0.5 * snr_weight * error

    neg_log_constants = -log_constants_p_x_given_z0(cfg, gamma_fn, node_mask)
    if training and cfg.loss_type == "l2":
        neg_log_constants = jnp.zeros_like(neg_log_constants)

    kl_prior_ = kl_prior(cfg, gamma_fn, xh, node_mask)

    if t0_always:
        # Dedicated second pass at t=0 (eval path; lower-variance estimator).
        loss_t = loss_t_larger_than_zero
        estimator_loss_terms = cfg.timesteps * loss_t

        t_zeros = jnp.zeros_like(s)
        gamma_0 = gamma_fn(t_zeros)
        alpha_0 = S.alpha(gamma_0, x.ndim)
        sigma_0 = S.sigma(gamma_0, x.ndim)

        eps_0 = sample_combined_position_feature_noise(
            k_eps0, node_mask, cfg.n_dims, feat_nf
        )
        z_0 = alpha_0 * xh + sigma_0 * eps_0
        net_out0 = dynamics_apply(
            params["dynamics"], dyn_cfg, t_zeros, z_0, node_mask, edge_mask, context,
            compute_dtype,
        )
        loss_term_0 = -log_pxh_z0(h_cat, h_int, z_0, gamma_0, eps_0, net_out0)
        loss = kl_prior_ + estimator_loss_terms + neg_log_constants + loss_term_0
    else:
        # Single pass; the t=0 term is selected by masking.
        loss_term_0 = -log_pxh_z0(h_cat, h_int, z_t, gamma_t, eps, net_out)
        t_is_not_zero = 1.0 - t_is_zero
        loss_t = (
            loss_term_0 * t_is_zero.reshape(b)
            + t_is_not_zero.reshape(b) * loss_t_larger_than_zero
        )
        if training and cfg.loss_type == "l2":
            estimator_loss_terms = loss_t
        else:
            estimator_loss_terms = (cfg.timesteps + 1) * loss_t
        loss = kl_prior_ + estimator_loss_terms + neg_log_constants

    return loss, VDMLossInfo(t_int=t_int.reshape(b), error=error)


def vdm_nll(
    params: dict,
    cfg: DiffusionConfig,
    dyn_cfg: DynamicsConfig,
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
    """-log p(x, h) per molecule [B] (the l2 surrogate when training with l2).

    reference: en_diffusion.py:690-714 (forward)."""
    x, h_cat, h_int, delta_log_px = normalize(cfg, x, h_cat, h_int, node_mask)
    if training and cfg.loss_type == "l2":
        delta_log_px = jnp.zeros_like(delta_log_px)
    loss, _ = compute_loss(
        params, cfg, dyn_cfg, key, x, h_cat, h_int, node_mask, edge_mask, context,
        t0_always=not training, training=training, compute_dtype=compute_dtype,
    )
    return loss - delta_log_px


# ---------------------------------------------------------------------------
# Sampling (reference: en_diffusion.py:477-503, :716-838)
# ---------------------------------------------------------------------------


def sample_normal(key, mu, sigma, node_mask, n_dims, feat_nf, fix_noise=False):
    """mu + sigma * eps with combined CoM-zero/standard noise.

    With fix_noise a single [1, N, D] noise draw is broadcast over the batch
    and then masked/CoM-projected per sample (reference: en_diffusion.py:
    499-503 with the bs=1 draw broadcasting against the full node_mask in
    utils.py:107-116) — correct even when batch elements have different
    sizes."""
    if fix_noise:
        b, n, _ = node_mask.shape
        kx, kh = jax.random.split(key)
        raw_x = jax.random.normal(kx, (1, n, n_dims)) * node_mask  # -> [B,N,3]
        z_x = com.remove_mean_with_mask(raw_x, node_mask)
        z_h = jax.random.normal(kh, (1, n, feat_nf)) * node_mask
        eps = jnp.concatenate([z_x, z_h], axis=2)
    else:
        eps = sample_combined_position_feature_noise(key, node_mask, n_dims, feat_nf)
    return mu + sigma * eps


def guided_eps(
    params, dyn_cfg, t, z, node_mask, edge_mask, context, compute_dtype,
    guidance_scale: float = 1.0,
):
    """Denoiser eps-hat with classifier-free guidance (Ho & Salimans,
    "Classifier-Free Diffusion Guidance", 2022) — beyond the reference,
    which has no guidance mechanism.

    ``guidance_scale`` w blends the conditional and unconditional scores:
    eps = eps_uncond + w * (eps_cond - eps_uncond). w=1 (or context=None)
    is the plain conditional model; the branch resolves at trace time, so
    the default compiles to a single denoiser call. The null condition is
    the all-zero context — exactly what ``--context_dropout`` training
    shows the model (train/train_step.py)."""
    if context is None or guidance_scale == 0.0:
        # w=0 IS the null-condition model — one denoiser call, not two
        # (XLA cannot fold x*0 under float semantics).
        context = None if context is None else jnp.zeros_like(context)
        return dynamics_apply(
            params["dynamics"], dyn_cfg, t, z, node_mask, edge_mask, context,
            compute_dtype,
        )
    eps = dynamics_apply(
        params["dynamics"], dyn_cfg, t, z, node_mask, edge_mask, context,
        compute_dtype,
    )
    if guidance_scale == 1.0:
        return eps
    eps_u = dynamics_apply(
        params["dynamics"], dyn_cfg, t, z, node_mask, edge_mask,
        jnp.zeros_like(context), compute_dtype,
    )
    return eps_u + guidance_scale * (eps - eps_u)


def sample_p_zs_given_zt(
    params, cfg, dyn_cfg, gamma_fn, key, s, t, zt, node_mask, edge_mask, context,
    fix_noise=False, compute_dtype=None, guidance_scale: float = 1.0,
):
    """One ancestral step zs ~ p(z_s | z_t). reference: en_diffusion.py:716-747."""
    gamma_s = gamma_fn(s)
    gamma_t = gamma_fn(t)
    sigma2_t_given_s, sigma_t_given_s, alpha_t_given_s = S.sigma_and_alpha_t_given_s(
        gamma_t, gamma_s, zt.ndim
    )
    sigma_s = S.sigma(gamma_s, zt.ndim)
    sigma_t = S.sigma(gamma_t, zt.ndim)

    eps_t = guided_eps(
        params, dyn_cfg, t, zt, node_mask, edge_mask, context, compute_dtype,
        guidance_scale,
    )

    mu = zt / alpha_t_given_s - (sigma2_t_given_s / alpha_t_given_s / sigma_t) * eps_t
    sigma = sigma_t_given_s * sigma_s / sigma_t

    zs = sample_normal(key, mu, sigma, node_mask, cfg.n_dims, cfg.in_node_nf, fix_noise)

    # Project the coordinate part back to zero CoM to stop numeric drift.
    zs = jnp.concatenate(
        [
            com.remove_mean_with_mask(zs[:, :, : cfg.n_dims], node_mask),
            zs[:, :, cfg.n_dims :],
        ],
        axis=2,
    )
    return zs


def sample_p_zs_given_zt_ddim(
    params, cfg, dyn_cfg, gamma_fn, key, s, t, zt, node_mask, edge_mask, context,
    eta=0.0, fix_noise=False, compute_dtype=None, guidance_scale: float = 1.0,
):
    """Generalized reverse jump z_t -> z_s for ANY s < t (DDIM family).

    Song et al., "Denoising Diffusion Implicit Models" (ICLR 2021) eq. 12 in
    the VDM gamma parameterization: predict x from eps, then re-noise to
    level s with stochasticity ``eta``. eta=1 is algebraically identical to
    the exact ancestral posterior step ``sample_p_zs_given_zt`` (proof:
    sigma_s^2 - sigma~^2 = alpha_{t|s}^2 sigma_s^4 / sigma_t^2, matching the
    ancestral eps coefficient); eta=0 is the deterministic probability-flow
    jump. Beyond the reference, which only steps t -> t-1/T
    (en_diffusion.py:716-747) — this enables T-independent few-step
    sampling (``n_steps`` in ``vdm_sample``).
    """
    gamma_s = gamma_fn(s)
    gamma_t = gamma_fn(t)
    _, sigma_t_given_s, _ = S.sigma_and_alpha_t_given_s(gamma_t, gamma_s, zt.ndim)
    alpha_s = S.alpha(gamma_s, zt.ndim)
    sigma_s = S.sigma(gamma_s, zt.ndim)
    sigma_t = S.sigma(gamma_t, zt.ndim)

    eps_t = guided_eps(
        params, dyn_cfg, t, zt, node_mask, edge_mask, context, compute_dtype,
        guidance_scale,
    )
    x_pred = compute_x_pred(cfg, eps_t, zt, gamma_t)

    # Noise split: eta scales the ancestral posterior std; the remaining
    # variance rides the predicted eps direction so Var(z_s) stays sigma_s^2.
    sigma_tilde = eta * (sigma_t_given_s * sigma_s / sigma_t)
    dir_coef = jnp.sqrt(jnp.clip(sigma_s**2 - sigma_tilde**2, 0.0, None))
    mu = alpha_s * x_pred + dir_coef * eps_t

    zs = sample_normal(key, mu, sigma_tilde, node_mask, cfg.n_dims, cfg.in_node_nf, fix_noise)
    zs = jnp.concatenate(
        [
            com.remove_mean_with_mask(zs[:, :, : cfg.n_dims], node_mask),
            zs[:, :, cfg.n_dims :],
        ],
        axis=2,
    )
    return zs


def sample_p_xh_given_z0(
    params, cfg, dyn_cfg, gamma_fn, key, z0, node_mask, edge_mask, context,
    fix_noise=False, compute_dtype=None, latent_space=False,
    guidance_scale: float = 1.0,
):
    """Final decode step p(x, h | z_0).

    With ``latent_space=True`` the output stays in the latent representation
    (no unnormalize / argmax) — the EnLatentDiffusion override
    (reference: en_diffusion.py:1099-1122 vs :477-497)."""
    b = z0.shape[0]
    zeros = jnp.zeros((b, 1), dtype=jnp.float32)
    gamma_0 = gamma_fn(zeros)
    # sigma_x = sqrt(sigma_0^2 / alpha_0^2) = SNR(-0.5 gamma_0)
    sigma_x = S.snr(-0.5 * gamma_0).reshape(b, 1, 1)
    net_out = guided_eps(
        params, dyn_cfg, zeros, z0, node_mask, edge_mask, context,
        compute_dtype, guidance_scale,
    )
    mu_x = compute_x_pred(cfg, net_out, z0, gamma_0)
    xh = sample_normal(key, mu_x, sigma_x, node_mask, cfg.n_dims, cfg.in_node_nf, fix_noise)

    x = xh[:, :, : cfg.n_dims]
    if latent_space:
        h_int = xh[:, :, cfg.n_dims :]
        h_cat = jnp.zeros_like(xh[:, :, :0])
        return x, h_cat, h_int

    inc = int(cfg.include_charges)
    h_int = z0[:, :, z0.shape[2] - inc :] if inc else jnp.zeros_like(z0[:, :, :0])
    h_cat_raw = z0[:, :, cfg.n_dims : z0.shape[2] - inc]
    x, h_cat, h_int = unnormalize(cfg, x, h_cat_raw, h_int, node_mask)
    h_cat = (
        jax.nn.one_hot(jnp.argmax(h_cat, axis=2), cfg.num_classes) * node_mask
    )
    h_int = jnp.round(h_int) * node_mask
    return x, h_cat, h_int


def vdm_sample(
    params: dict,
    cfg: DiffusionConfig,
    dyn_cfg: DynamicsConfig,
    key: Array,
    node_mask: Array,
    edge_mask: Array,
    context: Optional[Array] = None,
    fix_noise: bool = False,
    compute_dtype=None,
    latent_space: bool = False,
    keep_frames: Optional[int] = None,
    n_steps: Optional[int] = None,
    eta: float = 1.0,
    method: str = "ddim",
    guidance_scale: float = 1.0,
    clip_z: float = 0.0,
):
    """Full reverse-diffusion sampling as one scanned, jittable program.

    Returns (x, h_cat, h_int) and, if keep_frames is set, a chain tensor
    [keep_frames, B, N, D] of intermediate (raw latent-space) states written
    like the reference's sample_chain (reference: en_diffusion.py:762-838).

    ``n_steps`` (default: cfg.timesteps) runs the strided few-step sampler
    over an integer sub-grid of the T training timesteps — beyond the
    reference's fixed-T Python loop. ``method`` selects the jump rule:

    - "ddim": DDIM family with stochasticity ``eta`` (1.0 = ancestral
      posterior noise per jump, 0.0 = deterministic first-order
      probability-flow). With n_steps == T and eta == 1.0 this is the
      dense ancestral sampler (same program as the defaults).
    - "dpm2m": DPM-Solver++(2M) (Lu et al. 2022) — deterministic
      second-order multistep solver in data-prediction form; ``eta`` is
      ignored. Higher-order accuracy in the half-log-SNR variable
      lambda = -gamma/2 keeps quality at much smaller K than first order.

    ``guidance_scale`` applies classifier-free guidance to every denoiser
    evaluation (see ``guided_eps``); 1.0 (default) is the plain
    conditional/unconditional model. ``clip_z`` > 0 clamps every reverse
    step's state to [-clip_z, clip_z] (coordinates re-projected to zero
    CoM afterwards) — a dynamic-range guard in the spirit of Imagen's
    static thresholding (Saharia et al. 2022): guided (w > 1) or
    sparse-data conditional scores can push rare trajectories off the
    data manifold, and an unbounded excursion never recovers. 0 (default)
    is the reference protocol, bit-identical to no guard.
    """
    if method not in ("ddim", "dpm2m"):
        raise ValueError(f"unknown sampling method {method!r}")
    gamma_fn = make_gamma_fn(cfg, params)

    def _guard(z):
        # Trace-time branch: clip_z=0 compiles to the identity.
        if clip_z <= 0:
            return z
        zx = com.remove_mean_with_mask(
            jnp.clip(z[:, :, : cfg.n_dims], -clip_z, clip_z) * node_mask,
            node_mask,
        )
        zh = jnp.clip(z[:, :, cfg.n_dims :], -clip_z, clip_z)
        return jnp.concatenate([zx, zh], axis=2) * node_mask
    b = node_mask.shape[0]
    k_init, k_scan, k_final = jax.random.split(key, 3)

    if fix_noise:
        # One [1, N, D] draw broadcast over the batch, masked/CoM-projected
        # per sample (reference: en_diffusion.py:767-771).
        z = sample_normal(
            k_init, 0.0, 1.0, node_mask, cfg.n_dims, cfg.in_node_nf, fix_noise=True
        )
    else:
        z = sample_combined_position_feature_noise(
            k_init, node_mask, cfg.n_dims, cfg.in_node_nf
        )

    T = cfg.timesteps
    K = T if n_steps is None else int(n_steps)
    if not 1 <= K <= T:
        raise ValueError(f"n_steps must be in [1, {T}], got {K}")
    # Explicit n_steps (even == T) selects the strided machinery so its
    # K == T case stays directly comparable against the dense path in tests.
    strided = n_steps is not None or eta != 1.0 or method != "ddim"
    want_chain = keep_frames is not None
    if strided and want_chain:
        raise ValueError("chain visualization requires the dense sampler "
                         "(n_steps=None, eta=1.0)")
    n_frames = keep_frames if want_chain else 1

    # Mixed-precision schedule: under a ``full`` low-precision ComputeSpec
    # with mixed_tail > 0, the final fraction of steps (and the decode) run
    # in f32 — the low-noise tail is where sub-1e-2 geometry matters.
    from geoldm_tpu.nn.core import resolve_compute

    spec = resolve_compute(compute_dtype)

    if strided:
        # Integer sub-grid tau_0=T > ... > tau_K=0 (strictly decreasing for
        # K <= T since consecutive gaps are >= floor(T/K) >= 1).
        tau = [((K - k) * T) // K for k in range(K + 1)]
        t_vals = jnp.asarray(tau[:-1], dtype=jnp.float32) / T
        s_vals = jnp.asarray(tau[1:], dtype=jnp.float32) / T

        if method == "dpm2m":
            # DPM-Solver++(2M): carry = (z, x_prev, h_prev, not_first).
            # Each jump t -> s evaluates x_pred once at level t and linearly
            # extrapolates x(lambda) through the previous evaluation: with
            # h = lambda_s - lambda_t and c = h / (2 h_prev),
            #   D = (1 + c) x_t - c x_prev          (first step: D = x_t)
            #   z_s = (sigma_s/sigma_t) z - alpha_s * expm1(-h) * D
            # (c is the first-order moment of the exponential weight over
            # the current jump, scaled by the backward difference step.)
            def make_jump(step_dtype):
                def step(carry, inp):
                    z, x_prev, h_prev, not_first = carry
                    s_v, t_v = inp
                    s_arr = jnp.full((b, 1), s_v, dtype=jnp.float32)
                    t_arr = jnp.full((b, 1), t_v, dtype=jnp.float32)
                    gamma_s = gamma_fn(s_arr)
                    gamma_t = gamma_fn(t_arr)
                    lam_s = S.inflate(-0.5 * gamma_s, z.ndim)
                    lam_t = S.inflate(-0.5 * gamma_t, z.ndim)
                    h = lam_s - lam_t  # > 0: lambda grows as t decreases
                    eps_t = guided_eps(
                        params, dyn_cfg, t_arr, z, node_mask, edge_mask,
                        context, step_dtype, guidance_scale,
                    )
                    x_t = compute_x_pred(cfg, eps_t, z, gamma_t)
                    c = not_first * (h / (2.0 * h_prev))
                    d = (1.0 + c) * x_t - c * x_prev
                    z_s = (S.sigma(gamma_s, z.ndim) / S.sigma(gamma_t, z.ndim)) * z \
                        - S.alpha(gamma_s, z.ndim) * jnp.expm1(-h) * d
                    z_s = jnp.concatenate(
                        [
                            com.remove_mean_with_mask(
                                z_s[:, :, : cfg.n_dims], node_mask),
                            z_s[:, :, cfg.n_dims :],
                        ],
                        axis=2,
                    ) * node_mask
                    return (_guard(z_s), x_t, h, jnp.ones(())), None

                return step

            xs = (s_vals, t_vals)
            carry = (z, jnp.zeros_like(z), jnp.ones((b, 1, 1)), jnp.zeros(()))
        else:

            def make_jump(step_dtype):
                def step(z, inp):
                    s_v, t_v, k = inp
                    s_arr = jnp.full((b, 1), s_v, dtype=jnp.float32)
                    t_arr = jnp.full((b, 1), t_v, dtype=jnp.float32)
                    z = sample_p_zs_given_zt_ddim(
                        params, cfg, dyn_cfg, gamma_fn, k, s_arr, t_arr, z,
                        node_mask, edge_mask, context, eta, fix_noise, step_dtype,
                        guidance_scale,
                    )
                    return _guard(z), None

                return step

            xs = (s_vals, t_vals, jax.random.split(k_scan, K))
            carry = z

        tail = int(round(spec.mixed_tail * K)) if spec.full else 0
        if tail > 0:
            head = K - tail
            carry, _ = jax.lax.scan(make_jump(spec), carry,
                                    tuple(a[:head] for a in xs))
            carry, _ = jax.lax.scan(make_jump(None), carry,
                                    tuple(a[head:] for a in xs))
            compute_dtype_final = None
        else:
            carry, _ = jax.lax.scan(make_jump(compute_dtype), carry, xs)
            compute_dtype_final = compute_dtype
        z = carry[0] if method == "dpm2m" else carry
        frames = None
    else:

        def make_step(step_dtype):
            def step(z, inp):
                s_idx, k = inp
                s_arr = jnp.full((b, 1), s_idx, dtype=jnp.float32) / T
                t_arr = jnp.full((b, 1), s_idx + 1, dtype=jnp.float32) / T
                z = sample_p_zs_given_zt(
                    params, cfg, dyn_cfg, gamma_fn, k, s_arr, t_arr, z, node_mask,
                    edge_mask, context, fix_noise, step_dtype, guidance_scale,
                )
                z = _guard(z)
                if want_chain:
                    frame = unnormalize_z(cfg, z, node_mask) if not latent_space else z
                    return z, frame
                return z, None

            return step

        s_indices = jnp.arange(T - 1, -1, -1)
        step_keys = jax.random.split(k_scan, T)

        tail = int(round(spec.mixed_tail * T)) if (spec.full and not want_chain) else 0
        if tail > 0:
            head = T - tail
            z, frames = jax.lax.scan(
                make_step(spec), z, (s_indices[:head], step_keys[:head])
            )
            z, _ = jax.lax.scan(
                make_step(None), z, (s_indices[head:], step_keys[head:])
            )
            compute_dtype_final = None
        else:
            z, frames = jax.lax.scan(make_step(compute_dtype), z, (s_indices, step_keys))
            compute_dtype_final = compute_dtype

    x, h_cat, h_int = sample_p_xh_given_z0(
        params, cfg, dyn_cfg, gamma_fn, k_final, z, node_mask, edge_mask, context,
        fix_noise, compute_dtype_final, latent_space, guidance_scale,
    )

    # Final CoM-drift guard (reference: en_diffusion.py:789-793): always
    # re-project — branchless and exact.
    x = com.remove_mean_with_mask(x * node_mask, node_mask)

    if want_chain:
        # The reference writes frame slot floor(s*keep/T) at every step s, so
        # the surviving frame per slot k is the smallest s in that slot,
        # s_k = ceil(k*T/keep). frames[i] holds the state after step
        # s = T-1-i, so slot k reads frames[T-1-s_k] — a static gather
        # (deterministic, unlike a duplicate-index scatter).
        slot_s = [-(-(k * T) // n_frames) for k in range(n_frames)]
        gather_idx = jnp.asarray([T - 1 - s for s in slot_s], dtype=jnp.int32)
        chain = frames[gather_idx]
        chain = chain.at[0].set(jnp.concatenate([x, h_cat, h_int], axis=2))
        return (x, h_cat, h_int), chain

    return x, h_cat, h_int


def log_info(cfg: DiffusionConfig, params: dict) -> dict:
    """log_SNR_max/min diagnostics (reference: en_diffusion.py:840-855)."""
    gamma_fn = make_gamma_fn(cfg, params)
    zeros = jnp.zeros((1, 1), dtype=jnp.float32)
    ones = jnp.ones((1, 1), dtype=jnp.float32)
    return {
        "log_SNR_max": float(-gamma_fn(zeros).reshape(())),
        "log_SNR_min": float(-gamma_fn(ones).reshape(())),
    }

"""Classifier-free guidance (Ho & Salimans 2022) — beyond the reference,
which has no guidance mechanism.

Covers the algebraic identities (w=1 is the plain conditional program,
w=0 is the unconditional model), composition with the few-step samplers,
and the training-side context dropout that teaches the model the null
condition.
"""

import jax
import numpy as np
import pytest

from geoldm_tpu.config import TrainConfig
from geoldm_tpu.data.collate import build_masks
from geoldm_tpu.data.datasets_config import get_dataset_info
from geoldm_tpu.models import factory
from geoldm_tpu.train import sampling as S
from geoldm_tpu.train import train_step as ts

INFO = get_dataset_info("qm9")


def tiny_cfg(**kw):
    base = dict(nf=16, n_layers=1, diffusion_steps=8, latent_nf=1,
                context_node_nf=1)
    base.update(kw)
    return factory.make_latent_diffusion_config(INFO, **base)


def _ctx(rng, b):
    return rng.standard_normal((b, 1)).astype(np.float32)


def _sample(cfg, params, ctx, **kw):
    return S.sample(
        cfg, params, jax.random.key(1), INFO, np.array([6, 9]), context=ctx,
        pad_nodes=12, rng=np.random.default_rng(0), **kw,
    )


def test_guidance_scale_one_is_identity():
    """w=1 must be the exact same compiled program as no guidance."""
    cfg = tiny_cfg()
    params = factory.init_params(jax.random.key(0), cfg)
    ctx = _ctx(np.random.default_rng(0), 2)
    base = _sample(cfg, params, ctx)
    same = _sample(cfg, params, ctx, guidance_scale=1.0)
    for a, b in zip(base, same):
        np.testing.assert_array_equal(a, b)


def test_guidance_scale_zero_is_unconditional():
    """w=0 collapses to the null-condition (all-zero context) model."""
    cfg = tiny_cfg()
    params = factory.init_params(jax.random.key(0), cfg)
    ctx = _ctx(np.random.default_rng(0), 2)
    guided0 = _sample(cfg, params, ctx, guidance_scale=0.0)
    uncond = _sample(cfg, params, np.zeros_like(ctx))
    # Algebraically exact; the tolerance absorbs compile-level reduction
    # reordering (different fused programs) amplified across the 8 steps
    # of a random-init model.
    for a, b in zip(guided0, uncond):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_guidance_changes_output_and_composes_with_fewstep():
    cfg = tiny_cfg()
    params = factory.init_params(jax.random.key(0), cfg)
    ctx = _ctx(np.random.default_rng(0), 2)
    for kw in ({}, {"n_steps": 3, "eta": 0.0}, {"n_steps": 3, "method": "dpm2m"}):
        base = _sample(cfg, params, ctx, **kw)
        guided = _sample(cfg, params, ctx, guidance_scale=4.0, **kw)
        one_hot, charges, x, node_mask = guided
        assert np.any(x != base[2]), kw
        assert np.all(np.isfinite(x)), kw
        assert np.abs(x * (1 - node_mask)).max() == 0.0, kw
        np.testing.assert_allclose(x.sum(axis=1), 0.0, atol=1e-3)


@pytest.mark.slow
def test_clip_z_guard():
    """clip_z bounds the sampler state: a generous bound is numerically
    the identity, an aggressive bound shrinks the output scale, and the
    masked/CoM invariants survive the clamp."""
    cfg = factory.make_diffusion_model_config(
        INFO, nf=16, n_layers=1, diffusion_steps=8, context_node_nf=1)
    params = factory.init_params(jax.random.key(0), cfg)
    ctx = _ctx(np.random.default_rng(0), 2)

    def run(**kw):
        return S.sample(cfg, params, jax.random.key(1), INFO,
                        np.array([6, 9]), context=ctx, pad_nodes=12,
                        rng=np.random.default_rng(0), **kw)

    base = run()
    loose = run(clip_z=1e6)
    for a, b in zip(base, loose):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    tight = run(clip_z=0.3)
    _, _, x, node_mask = tight
    assert np.all(np.isfinite(x))
    assert np.abs(x * (1 - node_mask)).max() == 0.0
    np.testing.assert_allclose(x.sum(axis=1), 0.0, atol=1e-3)
    assert np.abs(x).max() < np.abs(base[2]).max()
    # composes with guidance + few-step
    g = run(clip_z=0.3, guidance_scale=3.0, n_steps=4, eta=0.0)
    assert np.all(np.isfinite(g[2]))


def _train_batch(rng, b=4, n=12, ctx_nf=1, num_classes=len(INFO["atom_decoder"])):
    sizes = rng.integers(4, n, size=b)
    node_mask, edge_mask = build_masks(sizes, n)
    x = rng.standard_normal((b, n, 3)).astype(np.float32) * node_mask
    x = x - x.sum(1, keepdims=True) / np.maximum(node_mask.sum(1, keepdims=True), 1)
    h_cat = np.eye(num_classes, dtype=np.float32)[rng.integers(0, num_classes, (b, n))]
    return {
        "x": x * node_mask,
        "h_cat": h_cat * node_mask,
        "h_int": rng.integers(1, 9, (b, n, 1)).astype(np.float32) * node_mask,
        "node_mask": node_mask,
        "edge_mask": edge_mask,  # build_masks already returns [B,N,N,1]
        "log_pN": np.zeros(b, dtype=np.float32),
        "context": np.broadcast_to(
            rng.standard_normal((b, 1, ctx_nf)).astype(np.float32), (b, n, ctx_nf)
        ) * node_mask,
    }


def test_context_dropout_nulls_the_context():
    """With context_dropout=1.0 the loss is invariant to the context values
    (every molecule sees the null condition); with 0.0 it is not."""
    cfg = tiny_cfg()
    rng = np.random.default_rng(0)
    batch = _train_batch(rng)
    batch2 = dict(batch)
    batch2["context"] = batch["context"] + 3.0 * (batch["node_mask"] > 0)

    losses = {}
    for p in (0.0, 1.0):
        state, tx = ts.create_train_state(
            jax.random.key(0), cfg, TrainConfig(context_dropout=p))
        step = jax.jit(ts.make_train_step(cfg, TrainConfig(context_dropout=p), tx))
        _, m1 = step(state, batch, jax.random.key(7))
        _, m2 = step(state, batch2, jax.random.key(7))
        losses[p] = (float(m1["loss"]), float(m2["loss"]))

    a, b = losses[1.0]
    assert a == b, "dropout=1.0 must make the loss context-invariant"
    a, b = losses[0.0]
    assert a != b, "dropout=0.0 must keep the context live"
    assert np.isfinite(list(losses[0.0]) + list(losses[1.0])).all()


def test_context_dropout_config_roundtrip():
    from geoldm_tpu import config as C

    tc = TrainConfig(context_dropout=0.25)
    assert C.loads(C.dumps(tc)).context_dropout == 0.25


def test_context_indicator_channel():
    """context_indicator=True sizes the context +1 (trailing is-conditioned
    channel), prepare_context/sampling append it, and the CFG null stays
    distinguishable from a mean-valued (all-zero) property."""
    from geoldm_tpu import config as C
    from geoldm_tpu.train.conditioning import prepare_context

    cfg = tiny_cfg(context_indicator=True)
    assert cfg.context_indicator
    assert cfg.dynamics.context_node_nf == 2  # property + indicator
    assert cfg.vae.context_node_nf == 2
    assert C.loads(C.dumps(cfg)) == cfg

    # prepare_context appends the masked ones channel.
    node_mask = np.ones((2, 5, 1), dtype=np.float32)
    node_mask[1, 3:] = 0
    batch = {"node_mask": node_mask,
             "alpha": np.array([1.0, 2.0], dtype=np.float32)}
    norms = {"alpha": {"mean": 0.0, "mad": 1.0}}
    ctx = prepare_context(["alpha"], batch, norms, indicator=True)
    assert ctx.shape == (2, 5, 2)
    np.testing.assert_array_equal(ctx[..., 1:], node_mask)

    # sampling.sample accepts property-only [B, P] context and appends the
    # indicator internally; a zero property must now differ from the null.
    params = factory.init_params(jax.random.key(0), cfg)
    zero_prop = _sample(cfg, params, np.zeros((2, 1), dtype=np.float32))
    null = _sample(cfg, params, np.zeros((2, 1), dtype=np.float32),
                   guidance_scale=0.0)
    assert np.any(np.abs(zero_prop[2] - null[2]) > 1e-4)

    # chain visualization builds context through the same indicator path
    # (regression: the periodic --visualize sampling crashed on
    # indicator models with a one-channel-short context).
    from geoldm_tpu.models.distributions import DistributionProperty

    rng0 = np.random.default_rng(0)
    pd = DistributionProperty(rng0.integers(5, 20, size=100),
                              {"alpha": rng0.standard_normal(100)})
    from geoldm_tpu.train.conditioning import compute_mean_mad_from_arrays

    pd.set_normalizer(compute_mean_mad_from_arrays(
        {"alpha": rng0.standard_normal(100)}, ["alpha"]))
    one_hot, charges, xc = S.sample_chain(
        cfg, factory.init_params(jax.random.key(0), cfg), jax.random.key(2),
        INFO, prop_dist=pd, keep_frames=4, rng=rng0)
    assert np.all(np.isfinite(xc))

    # guidance + dropout train path run end-to-end on the indicator model.
    rng = np.random.default_rng(0)
    batch = _train_batch(rng, ctx_nf=2)
    batch["context"][..., 1:] = batch["node_mask"]
    state, tx = ts.create_train_state(
        jax.random.key(0), cfg, TrainConfig(context_dropout=0.5))
    step = jax.jit(ts.make_train_step(cfg, TrainConfig(context_dropout=0.5), tx))
    _, m = step(state, batch, jax.random.key(3))
    assert np.isfinite(float(m["loss"]))

"""Fused Pallas EGNN block: exactness vs the XLA path (interpret mode on
CPU) and gradient correctness of the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoldm_tpu.config import EGNNConfig
from geoldm_tpu.nn.egnn import egnn_apply, egnn_init
from geoldm_tpu.ops.distance import build_edge_mask
from geoldm_tpu.ops.pallas_egnn import egnn_apply_pallas


def cfg_of(**kw):
    base = dict(
        in_node_nf=6, out_node_nf=6, hidden_nf=32, n_layers=2, inv_sublayers=1,
        attention=True, tanh=True, coords_range=15.0, norm_constant=1.0,
        sin_embedding=False, normalization_factor=100.0, aggregation_method="sum",
    )
    base.update(kw)
    return EGNNConfig(**base)


def make_inputs(key, b=2, n=8, in_nf=6, n_real=(5, 8)):
    kh, kx = jax.random.split(key)
    node_mask = np.zeros((b, n, 1), dtype=np.float32)
    for i, k in enumerate(n_real):
        node_mask[i, :k] = 1.0
    node_mask = jnp.asarray(node_mask)
    h = jax.random.normal(kh, (b, n, in_nf)) * node_mask
    x = jax.random.normal(kx, (b, n, 3)) * node_mask
    return h, x, node_mask


@pytest.mark.parametrize(
    "sin_emb,inv_sublayers",
    [
        (False, 1),
        pytest.param(True, 1, marks=pytest.mark.slow),
        pytest.param(False, 2, marks=pytest.mark.slow),
        (True, 2),
    ],
)
def test_pallas_matches_xla(sin_emb, inv_sublayers):
    cfg = cfg_of(sin_embedding=sin_emb, inv_sublayers=inv_sublayers)
    params = egnn_init(jax.random.key(0), cfg)
    h, x, node_mask = make_inputs(jax.random.key(1))
    edge_mask = build_edge_mask(node_mask)

    h_ref, x_ref = egnn_apply(params, cfg, h, x, node_mask, edge_mask)
    h_pal, x_pal = egnn_apply_pallas(params, cfg, h, x, node_mask, interpret=True)

    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref), atol=2e-5)


def test_pallas_no_attention_mean_agg():
    cfg = cfg_of(attention=False, aggregation_method="mean", tanh=False)
    params = egnn_init(jax.random.key(0), cfg)
    h, x, node_mask = make_inputs(jax.random.key(1))
    edge_mask = build_edge_mask(node_mask)
    h_ref, x_ref = egnn_apply(params, cfg, h, x, node_mask, edge_mask)
    h_pal, x_pal = egnn_apply_pallas(params, cfg, h, x, node_mask, interpret=True)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref), atol=2e-5)


@pytest.mark.parametrize("bwd_mode", ["xla", "pallas"])
def test_pallas_custom_vjp_matches_xla_grad(bwd_mode):
    cfg = cfg_of(n_layers=1)
    params = egnn_init(jax.random.key(0), cfg)
    h, x, node_mask = make_inputs(jax.random.key(1))
    edge_mask = build_edge_mask(node_mask)

    def loss_xla(p):
        h1, x1 = egnn_apply(p, cfg, h, x, node_mask, edge_mask)
        return jnp.sum(h1**2) + jnp.sum(x1**2)

    def loss_pal(p):
        h1, x1 = egnn_apply_pallas(
            p, cfg, h, x, node_mask, interpret=True, bwd_mode=bwd_mode
        )
        return jnp.sum(h1**2) + jnp.sum(x1**2)

    g_xla = jax.grad(loss_xla)(params)
    g_pal = jax.grad(loss_pal)(params)
    for a, b in zip(jax.tree.leaves(g_xla), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize(
    "sin_emb,inv_sublayers",
    [(False, 1), pytest.param(True, 2, marks=pytest.mark.slow)],
)
def test_pallas_fused_bwd_input_grads(sin_emb, inv_sublayers):
    """The fused Pallas backward computes grads w.r.t. the EGNN INPUTS
    (h and x) exactly — including the x0 -> initial-distance-features path
    that the 'xla' remat mode drops (zero). Compare against full XLA
    autodiff through egnn_apply."""
    cfg = cfg_of(n_layers=2, sin_embedding=sin_emb, inv_sublayers=inv_sublayers)
    params = egnn_init(jax.random.key(0), cfg)
    h, x, node_mask = make_inputs(jax.random.key(1))
    edge_mask = build_edge_mask(node_mask)

    def loss_xla(h_, x_):
        h1, x1 = egnn_apply(params, cfg, h_, x_, node_mask, edge_mask)
        return jnp.sum(h1**2) + 0.5 * jnp.sum(x1**2)

    def loss_pal(h_, x_):
        h1, x1 = egnn_apply_pallas(
            params, cfg, h_, x_, node_mask, interpret=True, bwd_mode="pallas"
        )
        return jnp.sum(h1**2) + 0.5 * jnp.sum(x1**2)

    gh_xla, gx_xla = jax.grad(loss_xla, argnums=(0, 1))(h, x)
    gh_pal, gx_pal = jax.grad(loss_pal, argnums=(0, 1))(h, x)
    np.testing.assert_allclose(np.asarray(gh_pal), np.asarray(gh_xla),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gx_pal), np.asarray(gx_xla),
                               atol=5e-4, rtol=1e-3)


def test_bwd_overflow_routes_to_tiled(monkeypatch):
    """Backward-budget dispatch at the boundary size. N=64 (4096 pair rows)
    fits the whole-molecule FORWARD budget exactly, but the fused backward's
    live set (~17KB/row * 4096 ~= 70MB) overflows the raised 64MB scoped-VMEM
    limit even at group=1 — such sizes must route to the row-tiled kernels.
    Regression: a GEOM bucketed train step at pad 64 died in Mosaic's stack
    allocator ("Scoped allocation with size 71.59M ... exceeded")."""
    from geoldm_tpu.ops import pallas_egnn_tiled

    cfg = cfg_of(n_layers=1)
    params = egnn_init(jax.random.key(0), cfg)
    h, x, node_mask = make_inputs(jax.random.key(1), b=1, n=64, n_real=(50,))

    calls = []
    real = pallas_egnn_tiled.egnn_apply_pallas_tiled

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(pallas_egnn_tiled, "egnn_apply_pallas_tiled", spy)

    h_pal, x_pal = egnn_apply_pallas(params, cfg, h, x, node_mask, interpret=True)
    assert calls, "pad-64 with a pallas backward must dispatch to the tiled path"

    edge_mask = build_edge_mask(node_mask)
    h_ref, x_ref = egnn_apply(params, cfg, h, x, node_mask, edge_mask)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref), atol=3e-5)

    # With bwd_mode='xla' only the forward budget applies: the whole-molecule
    # kernel keeps this size (no tiled dispatch).
    calls.clear()
    egnn_apply_pallas(params, cfg, h, x, node_mask, interpret=True, bwd_mode="xla")
    assert not calls, "xla-backward callers keep the whole-molecule kernel at N=64"

"""EGNN property tests: E(3) equivariance, permutation equivariance,
masking invariance, and shape/config coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoldm_tpu.config import EGNNConfig
from geoldm_tpu.nn.egnn import egnn_apply, egnn_init, gnn_apply, gnn_init
from geoldm_tpu.ops.distance import build_edge_mask


def small_cfg(**kw):
    base = dict(
        in_node_nf=6,
        out_node_nf=6,
        hidden_nf=32,
        n_layers=2,
        inv_sublayers=2,
        attention=True,
        tanh=True,
        coords_range=15.0,
        norm_constant=1.0,
        sin_embedding=False,
        normalization_factor=100.0,
        aggregation_method="sum",
    )
    base.update(kw)
    return EGNNConfig(**base)


def make_inputs(key, b=2, n=7, in_nf=6, n_real=(5, 7)):
    kh, kx = jax.random.split(key)
    node_mask = np.zeros((b, n, 1), dtype=np.float32)
    for i, k in enumerate(n_real):
        node_mask[i, :k] = 1.0
    node_mask = jnp.asarray(node_mask)
    h = jax.random.normal(kh, (b, n, in_nf)) * node_mask
    x = jax.random.normal(kx, (b, n, 3)) * node_mask
    edge_mask = build_edge_mask(node_mask)
    return h, x, node_mask, edge_mask


def random_rotation_matrix(key):
    a = jax.random.normal(key, (3, 3))
    q, r = jnp.linalg.qr(a)
    # Make it a proper rotation (det +1).
    q = q * jnp.sign(jnp.diag(r))
    det = jnp.linalg.det(q)
    return q.at[:, 0].multiply(det)


@pytest.mark.parametrize("sin_emb", [False, True])
@pytest.mark.parametrize("attention", [False, True])
def test_rotation_equivariance(sin_emb, attention):
    cfg = small_cfg(sin_embedding=sin_emb, attention=attention)
    params = egnn_init(jax.random.key(0), cfg)
    h, x, node_mask, edge_mask = make_inputs(jax.random.key(1))
    rot = random_rotation_matrix(jax.random.key(2))

    h1, x1 = egnn_apply(params, cfg, h, x, node_mask, edge_mask)
    h2, x2 = egnn_apply(params, cfg, h, x @ rot, node_mask, edge_mask)

    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x1 @ rot), np.asarray(x2), atol=2e-4)


def test_translation_equivariance():
    cfg = small_cfg()
    params = egnn_init(jax.random.key(0), cfg)
    h, x, node_mask, edge_mask = make_inputs(jax.random.key(1))
    t = jnp.array([1.5, -2.0, 0.3])
    x_t = (x + t) * node_mask

    h1, x1 = egnn_apply(params, cfg, h, x, node_mask, edge_mask)
    h2, x2 = egnn_apply(params, cfg, h, x_t, node_mask, edge_mask)

    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray((x1 + t) * node_mask), np.asarray(x2 * node_mask), atol=2e-4
    )


def test_permutation_equivariance():
    cfg = small_cfg()
    params = egnn_init(jax.random.key(0), cfg)
    h, x, node_mask, edge_mask = make_inputs(jax.random.key(1), b=1, n=6, n_real=(6,))
    perm = jnp.asarray(np.random.default_rng(0).permutation(6))

    h1, x1 = egnn_apply(params, cfg, h, x, node_mask, edge_mask)
    h2, x2 = egnn_apply(params, cfg, h[:, perm], x[:, perm], node_mask, edge_mask)

    np.testing.assert_allclose(np.asarray(h1[:, perm]), np.asarray(h2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x1[:, perm]), np.asarray(x2), atol=2e-4)


def test_masking_invariance():
    """Garbage in padded entries must not change outputs at real nodes."""
    cfg = small_cfg()
    params = egnn_init(jax.random.key(0), cfg)
    h, x, node_mask, edge_mask = make_inputs(jax.random.key(1))

    h1, x1 = egnn_apply(params, cfg, h, x, node_mask, edge_mask)
    trash = 1.0 - node_mask
    h2, x2 = egnn_apply(
        params, cfg, h + 7.0 * trash, x + 3.0 * trash, node_mask, edge_mask
    )
    np.testing.assert_allclose(
        np.asarray(h1 * node_mask), np.asarray(h2 * node_mask), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(x1 * node_mask), np.asarray(x2 * node_mask), atol=1e-5
    )


def test_mean_aggregation_and_no_tanh():
    cfg = small_cfg(aggregation_method="mean", tanh=False, normalization_factor=1.0)
    params = egnn_init(jax.random.key(0), cfg)
    h, x, node_mask, edge_mask = make_inputs(jax.random.key(1))
    h1, x1 = egnn_apply(params, cfg, h, x, node_mask, edge_mask)
    assert np.all(np.isfinite(np.asarray(h1)))
    assert np.all(np.isfinite(np.asarray(x1)))


def test_output_shapes():
    cfg = small_cfg(out_node_nf=4)
    params = egnn_init(jax.random.key(0), cfg)
    h, x, node_mask, edge_mask = make_inputs(jax.random.key(1))
    h1, x1 = egnn_apply(params, cfg, h, x, node_mask, edge_mask)
    assert h1.shape == (2, 7, 4)
    assert x1.shape == (2, 7, 3)
    # Output h is masked.
    np.testing.assert_allclose(np.asarray(h1 * (1 - node_mask)), 0.0, atol=0)


def test_gnn_ablation_runs():
    cfg = small_cfg(in_node_nf=9, out_node_nf=9, n_layers=3)
    params = gnn_init(jax.random.key(0), cfg, in_edge_nf=0)
    h, x, node_mask, edge_mask = make_inputs(jax.random.key(1), in_nf=6)
    hx = jnp.concatenate([x, h], axis=-1)
    out = gnn_apply(params, cfg, hx, None, node_mask, edge_mask)
    assert out.shape == (2, 7, 9)
    assert np.all(np.isfinite(np.asarray(out)))


def test_jit_and_grad():
    cfg = small_cfg(n_layers=1)
    params = egnn_init(jax.random.key(0), cfg)
    h, x, node_mask, edge_mask = make_inputs(jax.random.key(1))

    @jax.jit
    def loss_fn(p):
        h1, x1 = egnn_apply(p, cfg, h, x, node_mask, edge_mask)
        return jnp.sum(h1**2) + jnp.sum(x1**2)

    g = jax.grad(loss_fn)(params)
    flat, _ = jax.tree.flatten(g)
    assert all(np.all(np.isfinite(np.asarray(a))) for a in flat)
    # Gradients actually flow to the embedding.
    assert float(jnp.max(jnp.abs(g["embedding"]["w"]))) > 0

"""Property-classifier tests: shapes, masking, training descent, and torch
parity against the reference property-prediction EGNN."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from geoldm_tpu.models import classifier as clf
from geoldm_tpu.ops.distance import build_edge_mask
from geoldm_tpu.train import classifier_train as ct


def make_inputs(key, b=3, n=8, in_nf=5, n_real=(5, 8, 6)):
    kh, kx = jax.random.split(key)
    node_mask = np.zeros((b, n, 1), dtype=np.float32)
    for i, k in enumerate(n_real):
        node_mask[i, :k] = 1.0
    node_mask = jnp.asarray(node_mask)
    labels = jax.random.randint(kh, (b, n), 0, in_nf)
    h0 = jax.nn.one_hot(labels, in_nf) * node_mask
    x = jax.random.normal(kx, (b, n, 3)) * node_mask
    return h0, x, node_mask, build_edge_mask(node_mask)


@pytest.mark.parametrize("node_attr", [False, True])
def test_classifier_forward(node_attr):
    params = clf.classifier_init(
        jax.random.key(0), in_node_nf=5, hidden_nf=32, n_layers=3, node_attr=node_attr
    )
    h0, x, node_mask, edge_mask = make_inputs(jax.random.key(1))
    pred = clf.classifier_apply(params, h0, x, node_mask, edge_mask, node_attr)
    assert pred.shape == (3,)
    assert np.all(np.isfinite(np.asarray(pred)))


def test_classifier_rotation_invariance():
    params = clf.classifier_init(jax.random.key(0), hidden_nf=32, n_layers=2)
    h0, x, node_mask, edge_mask = make_inputs(jax.random.key(1))
    q, _ = jnp.linalg.qr(jax.random.normal(jax.random.key(2), (3, 3)))
    p1 = clf.classifier_apply(params, h0, x, node_mask, edge_mask)
    p2 = clf.classifier_apply(params, h0, x @ q, node_mask, edge_mask)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)


def test_classifier_training_descends():
    params = clf.classifier_init(jax.random.key(0), hidden_nf=32, n_layers=2)
    tx = optax.chain(optax.scale_by_adam(), optax.add_decayed_weights(1e-16))
    opt_state = tx.init(params)
    step = ct.make_train_step(tx)
    h0, x, node_mask, edge_mask = make_inputs(jax.random.key(1))
    # Learnable target: number of atoms.
    label = jnp.sum(node_mask[..., 0], axis=1)
    batch = {"h0": h0, "x": x, "node_mask": node_mask, "edge_mask": edge_mask, "label": label}
    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, batch, 0.0, 1.0, 1e-3)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_baselines():
    h0, x, node_mask, edge_mask = make_inputs(jax.random.key(1))
    p = clf.naive_apply(clf.naive_init(jax.random.key(0)), h0, x, node_mask, edge_mask)
    assert p.shape == (3,)
    p = clf.numnodes_apply(clf.numnodes_init(jax.random.key(0)), h0, x, node_mask, edge_mask)
    assert p.shape == (3,)


@pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="no reference")
@pytest.mark.parametrize("node_attr", [0, 1])
def test_classifier_torch_parity(node_attr):
    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from qm9.property_prediction.models_property import EGNN as TorchPropEGNN

    torch.manual_seed(0)
    b, n, in_nf, hidden, n_layers = 2, 7, 5, 32, 3
    model = TorchPropEGNN(
        in_node_nf=in_nf, in_edge_nf=0, hidden_nf=hidden, n_layers=n_layers,
        attention=True, node_attr=node_attr,
    )
    model.eval()

    # Transfer weights.
    def t2j(t):
        return jnp.asarray(t.detach().numpy())

    def lin(mod):
        p = {"w": t2j(mod.weight).T}
        if mod.bias is not None:
            p["b"] = t2j(mod.bias)
        return p

    gcls = []
    for i in range(n_layers):
        gcl = model._modules[f"gcl_{i}"]
        gcls.append(
            {
                "edge_mlp": (lin(gcl.edge_mlp[0]), lin(gcl.edge_mlp[2])),
                "node_mlp": (lin(gcl.node_mlp[0]), lin(gcl.node_mlp[2])),
                "att_mlp": lin(gcl.att_mlp[0]),
            }
        )
    params = {
        "embedding": lin(model.embedding),
        "gcls": jax.tree.map(lambda *xs: jnp.stack(xs), *gcls),
        "node_dec": (lin(model.node_dec[0]), lin(model.node_dec[2])),
        "graph_dec": (lin(model.graph_dec[0]), lin(model.graph_dec[2])),
    }

    rng = np.random.default_rng(0)
    node_mask_np = np.zeros((b, n, 1), dtype=np.float32)
    node_mask_np[0, :5] = 1.0
    node_mask_np[1, :7] = 1.0
    h0_np = (
        np.eye(in_nf, dtype=np.float32)[rng.integers(0, in_nf, (b, n))] * node_mask_np
    )
    x_np = (rng.standard_normal((b, n, 3)) * node_mask_np).astype(np.float32)
    edge_mask_np = node_mask_np[:, :, None, 0] * node_mask_np[:, None, :, 0]
    edge_mask_np *= 1 - np.eye(n, dtype=np.float32)[None]

    rows, cols = [], []
    for bi in range(b):
        for i in range(n):
            for j in range(n):
                rows.append(i + bi * n)
                cols.append(j + bi * n)
    edges = [torch.LongTensor(rows), torch.LongTensor(cols)]
    with torch.no_grad():
        pred_ref = model(
            h0=torch.from_numpy(h0_np.reshape(b * n, in_nf)),
            x=torch.from_numpy(x_np.reshape(b * n, 3)),
            edges=edges,
            edge_attr=None,
            node_mask=torch.from_numpy(node_mask_np.reshape(b * n, 1)),
            edge_mask=torch.from_numpy(edge_mask_np.reshape(b * n * n, 1)),
            n_nodes=n,
        ).numpy()

    pred = clf.classifier_apply(
        params, jnp.asarray(h0_np), jnp.asarray(x_np), jnp.asarray(node_mask_np),
        build_edge_mask(jnp.asarray(node_mask_np)), node_attr=bool(node_attr),
    )
    np.testing.assert_allclose(np.asarray(pred), pred_ref, atol=1e-4, rtol=1e-4)

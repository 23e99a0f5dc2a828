"""Legacy EGNN variant, priors, and MD17 parser tests."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoldm_tpu.config import EGNNConfig
from geoldm_tpu.data.md17 import parse_xyz_md17
from geoldm_tpu.diffusion import priors
from geoldm_tpu.nn.egnn_legacy import legacy_egnn_apply, legacy_egnn_init
from geoldm_tpu.ops.distance import build_edge_mask


def cfg_of(**kw):
    base = dict(
        in_node_nf=6, out_node_nf=6, hidden_nf=32, n_layers=3, inv_sublayers=1,
        attention=True, tanh=True, coords_range=15.0, norm_constant=0.0,
        sin_embedding=False, normalization_factor=1.0, aggregation_method="sum",
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
    return h, x, node_mask, build_edge_mask(node_mask)


def test_legacy_rotation_equivariance():
    cfg = cfg_of()
    params = legacy_egnn_init(jax.random.key(0), cfg)
    h, x, node_mask, edge_mask = make_inputs(jax.random.key(1))
    q, r = jnp.linalg.qr(jax.random.normal(jax.random.key(2), (3, 3)))
    q = q * jnp.sign(jnp.diag(r))
    h1, x1 = legacy_egnn_apply(params, cfg, h, x, node_mask, edge_mask)
    h2, x2 = legacy_egnn_apply(params, cfg, h, x @ q, node_mask, edge_mask)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x1 @ q), np.asarray(x2), atol=2e-4)


@pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="no reference")
def test_legacy_torch_parity():
    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from egnn.egnn import EGNN as TorchLegacyEGNN

    torch.manual_seed(0)
    b, n, in_nf, hidden, layers = 2, 7, 6, 32, 2
    cfg = cfg_of(n_layers=layers, norm_constant=0.0)
    model = TorchLegacyEGNN(
        in_node_nf=in_nf, in_edge_nf=1, hidden_nf=hidden, n_layers=layers,
        attention=True, tanh=True, coords_range=15.0, norm_constant=0.0,
    )
    model.eval()

    def t2j(t):
        return jnp.asarray(t.detach().numpy())

    def lin(mod):
        p = {"w": t2j(mod.weight).T}
        if mod.bias is not None:
            p["b"] = t2j(mod.bias)
        return p

    gcls = []
    for i in range(layers):
        gcl = model._modules[f"gcl_{i}"]
        gcls.append({
            "edge_mlp": (lin(gcl.edge_mlp[0]), lin(gcl.edge_mlp[2])),
            "node_mlp": (lin(gcl.node_mlp[0]), lin(gcl.node_mlp[2])),
            "coord_mlp": (lin(gcl.coord_mlp[0]), lin(gcl.coord_mlp[2])),
            "att_mlp": lin(gcl.att_mlp[0]),
        })
    params = {
        "embedding": lin(model.embedding),
        "embedding_out": lin(model.embedding_out),
        "gcls": jax.tree.map(lambda *xs: jnp.stack(xs), *gcls),
    }

    rng = np.random.default_rng(0)
    node_mask_np = np.zeros((b, n, 1), dtype=np.float32)
    node_mask_np[0, :5] = 1.0
    node_mask_np[1, :7] = 1.0
    h_np = (rng.standard_normal((b, n, in_nf)) * node_mask_np).astype(np.float32)
    x_np = (rng.standard_normal((b, n, 3)) * node_mask_np).astype(np.float32)
    edge_mask_np = node_mask_np[:, :, None, 0] * node_mask_np[:, None, :, 0]
    edge_mask_np *= 1 - np.eye(n, dtype=np.float32)[None]

    rows, cols = [], []
    for bi in range(b):
        for i in range(n):
            for j in range(n):
                rows.append(i + bi * n)
                cols.append(j + bi * n)
    with torch.no_grad():
        h_t, x_t = model(
            torch.from_numpy(h_np.reshape(b * n, in_nf)),
            torch.from_numpy(x_np.reshape(b * n, 3)),
            [torch.LongTensor(rows), torch.LongTensor(cols)],
            node_mask=torch.from_numpy(node_mask_np.reshape(b * n, 1)),
            edge_mask=torch.from_numpy(edge_mask_np.reshape(b * n * n, 1)),
        )
    h_j, x_j = legacy_egnn_apply(
        params, cfg, jnp.asarray(h_np), jnp.asarray(x_np),
        jnp.asarray(node_mask_np), build_edge_mask(jnp.asarray(node_mask_np)),
    )
    np.testing.assert_allclose(
        np.asarray(h_j), h_t.numpy().reshape(b, n, -1), atol=5e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(x_j), x_t.numpy().reshape(b, n, 3), atol=5e-5, rtol=1e-4
    )


def test_priors():
    node_mask = jnp.ones((3, 5, 1))
    z_x, z_h = priors.position_feature_prior_sample(jax.random.key(0), 3, 4, node_mask)
    assert z_x.shape == (3, 5, 3) and z_h.shape == (3, 5, 4)
    np.testing.assert_allclose(np.asarray(z_x.sum(axis=1)), 0.0, atol=1e-5)
    lp = priors.position_feature_prior_log_prob(z_x, z_h, node_mask)
    assert lp.shape == (3,) and np.all(np.isfinite(np.asarray(lp)))
    x = priors.position_prior_sample(jax.random.key(1), (2, 6, 3))
    lp2 = priors.position_prior_log_prob(x)
    assert np.all(np.isfinite(np.asarray(lp2)))


def test_md17_parser():
    rec = [
        "3\n",
        "-97208.40600498248;[[21.4,10.0,-1.2],[-4.8,2.0,3.3],[1.1,-0.5,0.2]]\n",
        "C 0.0 0.0 0.0\n",
        "H 0.0 0.0 1.09\n",
        "H 1.02 0.0 -0.36\n",
    ]
    mol = parse_xyz_md17(rec)
    assert int(mol["num_atoms"]) == 3
    np.testing.assert_array_equal(mol["charges"], [6, 1, 1])
    assert mol["positions"].shape == (3, 3)
    assert mol["forces"].shape == (3, 3)
    assert float(mol["energy"]) == pytest.approx(-97208.406, abs=1e-2)

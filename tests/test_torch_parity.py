"""Golden-value parity tests against the PyTorch reference implementation.

Loads the reference EGNN from /root/reference (read-only), copies its
randomly initialized weights into the geoldm-tpu param pytree, and checks
that the dense-masked JAX forward pass reproduces the sparse edge-list torch
forward pass to float32 tolerance. Skipped when the reference or torch is
unavailable.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(REFERENCE):
    pytest.skip("reference repo not available", allow_module_level=True)
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

from egnn.egnn_new import EGNN as TorchEGNN  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from geoldm_tpu.config import EGNNConfig  # noqa: E402
from geoldm_tpu.nn.egnn import egnn_apply  # noqa: E402
from geoldm_tpu.ops.distance import build_edge_mask  # noqa: E402


def _t2j(t):
    return jnp.asarray(t.detach().numpy())


def _linear_from_torch(mod):
    p = {"w": _t2j(mod.weight).T}
    if mod.bias is not None:
        p["b"] = _t2j(mod.bias)
    return p


def params_from_torch(model: TorchEGNN, cfg: EGNNConfig) -> dict:
    blocks = []
    for i in range(cfg.n_layers):
        blk = model._modules[f"e_block_{i}"]
        gcls = []
        for j in range(cfg.inv_sublayers):
            gcl = blk._modules[f"gcl_{j}"]
            p = {
                "edge_mlp": (
                    _linear_from_torch(gcl.edge_mlp[0]),
                    _linear_from_torch(gcl.edge_mlp[2]),
                ),
                "node_mlp": (
                    _linear_from_torch(gcl.node_mlp[0]),
                    _linear_from_torch(gcl.node_mlp[2]),
                ),
            }
            if cfg.attention:
                p["att_mlp"] = _linear_from_torch(gcl.att_mlp[0])
            gcls.append(p)
        equiv = blk._modules["gcl_equiv"]
        coord_mlp = (
            _linear_from_torch(equiv.coord_mlp[0]),
            _linear_from_torch(equiv.coord_mlp[2]),
            _linear_from_torch(equiv.coord_mlp[4]),
        )
        blocks.append(
            {"gcls": tuple(gcls), "coord_mlp": coord_mlp}
        )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "embedding": _linear_from_torch(model.embedding),
        "embedding_out": _linear_from_torch(model.embedding_out),
        "blocks": stacked,
    }


def fc_edges(n_nodes, batch_size):
    rows, cols = [], []
    for b in range(batch_size):
        for i in range(n_nodes):
            for j in range(n_nodes):
                rows.append(i + b * n_nodes)
                cols.append(j + b * n_nodes)
    return [torch.LongTensor(rows), torch.LongTensor(cols)]


@pytest.mark.parametrize("sin_emb", [False, True])
@pytest.mark.parametrize("attention,tanh", [(True, True), (False, False)])
@pytest.mark.parametrize("normalization_factor", [100.0, 1.0])
def test_egnn_forward_parity(sin_emb, attention, tanh, normalization_factor):
    torch.manual_seed(0)
    b, n, in_nf, out_nf, hidden = 2, 7, 6, 5, 32
    cfg = EGNNConfig(
        in_node_nf=in_nf,
        out_node_nf=out_nf,
        hidden_nf=hidden,
        n_layers=2,
        inv_sublayers=2,
        attention=attention,
        tanh=tanh,
        coords_range=15.0,
        norm_constant=1.0,
        sin_embedding=sin_emb,
        normalization_factor=normalization_factor,
        aggregation_method="sum",
    )
    model = TorchEGNN(
        in_node_nf=in_nf,
        in_edge_nf=1,
        hidden_nf=hidden,
        out_node_nf=out_nf,
        n_layers=cfg.n_layers,
        inv_sublayers=cfg.inv_sublayers,
        attention=attention,
        tanh=tanh,
        coords_range=cfg.coords_range,
        norm_constant=cfg.norm_constant,
        sin_embedding=sin_emb,
        normalization_factor=cfg.normalization_factor,
        aggregation_method="sum",
    )
    model.eval()

    rng = np.random.default_rng(42)
    node_mask_np = np.zeros((b, n, 1), dtype=np.float32)
    node_mask_np[0, :5] = 1.0
    node_mask_np[1, :7] = 1.0
    h_np = (rng.standard_normal((b, n, in_nf)) * node_mask_np).astype(np.float32)
    x_np = (rng.standard_normal((b, n, 3)) * node_mask_np).astype(np.float32)

    # Torch (sparse edge-list) forward.
    edges = fc_edges(n, b)
    edge_mask_np = node_mask_np[:, :, None, 0] * node_mask_np[:, None, :, 0]
    eye = np.eye(n, dtype=np.float32)[None]
    edge_mask_np = (edge_mask_np * (1 - eye)).astype(np.float32)
    with torch.no_grad():
        h_t, x_t = model(
            torch.from_numpy(h_np.reshape(b * n, in_nf)),
            torch.from_numpy(x_np.reshape(b * n, 3)),
            edges,
            node_mask=torch.from_numpy(node_mask_np.reshape(b * n, 1)),
            edge_mask=torch.from_numpy(edge_mask_np.reshape(b * n * n, 1)),
        )
    h_ref = h_t.numpy().reshape(b, n, out_nf)
    x_ref = x_t.numpy().reshape(b, n, 3)

    # JAX dense forward with the same weights.
    params = params_from_torch(model, cfg)
    node_mask = jnp.asarray(node_mask_np)
    edge_mask = build_edge_mask(node_mask)
    h_j, x_j = egnn_apply(
        params, cfg, jnp.asarray(h_np), jnp.asarray(x_np), node_mask, edge_mask
    )

    np.testing.assert_allclose(np.asarray(h_j), h_ref, atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(x_j * node_mask), x_ref * node_mask_np, atol=5e-5, rtol=1e-4
    )

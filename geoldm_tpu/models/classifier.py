"""EGNN property regressor (the classifier used for conditional evaluation).

Dense-masked functional re-design of the reference property-prediction EGNN
(qm9/property_prediction/models_property.py:6-129 E_GCL_mask + EGNN;
models/gcl.py:145-251 E_GCL). Differences from the generative EGNN backbone:

- coordinates are NOT updated (E_GCL_mask deletes the coordinate update),
- the raw squared distance is the only edge feature (no norm_constant, no
  per-block distance recomputation — coordinates are static),
- optional node_attr feeds the raw input features h0 into every node MLP,
- readout: node_dec MLP -> masked sum-pool -> graph_dec MLP -> scalar,
- plain segment sums (no normalization factor).

Baselines ``naive`` (constant) and ``numnodes`` (atom-count MLP) are
included (reference: models_property.py:133-160).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from geoldm_tpu.nn.core import linear, linear_init, silu
from geoldm_tpu.ops.distance import coord2diff

Array = jax.Array


def _gcl_init(key: Array, hidden_nf: int, node_attr_nf: int, attention: bool) -> dict:
    ks = jax.random.split(key, 5)
    p = {
        "edge_mlp": (
            linear_init(ks[0], 2 * hidden_nf + 1, hidden_nf),
            linear_init(ks[1], hidden_nf, hidden_nf),
        ),
        "node_mlp": (
            linear_init(ks[2], hidden_nf + hidden_nf + node_attr_nf, hidden_nf),
            linear_init(ks[3], hidden_nf, hidden_nf),
        ),
    }
    if attention:
        p["att_mlp"] = linear_init(ks[4], hidden_nf, 1)
    return p


def classifier_init(
    key: Array,
    in_node_nf: int = 5,
    hidden_nf: int = 128,
    n_layers: int = 7,
    attention: bool = True,
    node_attr: bool = False,
) -> dict:
    keys = jax.random.split(key, n_layers + 5)
    node_attr_nf = in_node_nf if node_attr else 0
    gcls = [
        _gcl_init(keys[i], hidden_nf, node_attr_nf, attention) for i in range(n_layers)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *gcls)
    return {
        "embedding": linear_init(keys[-5], in_node_nf, hidden_nf),
        "gcls": stacked,
        "node_dec": (
            linear_init(keys[-4], hidden_nf, hidden_nf),
            linear_init(keys[-3], hidden_nf, hidden_nf),
        ),
        "graph_dec": (
            linear_init(keys[-2], hidden_nf, hidden_nf),
            linear_init(keys[-1], hidden_nf, 1),
        ),
    }


def _gcl_apply(p, h, h0, radial, node_attr, edge_mask, compute_dtype=None):
    """One E_GCL_mask layer, dense form (reference: models_property.py:28-40)."""
    f = h.shape[-1]
    w = p["edge_mlp"][0]["w"]
    w_src, w_dst, w_e = w[:f], w[f : 2 * f], w[2 * f :]
    pre = (
        linear({"w": w_src}, h, compute_dtype)[:, :, None, :]
        + linear({"w": w_dst}, h, compute_dtype)[:, None, :, :]
        + linear({"w": w_e}, radial, compute_dtype)
        + p["edge_mlp"][0]["b"]
    )
    m = silu(linear(p["edge_mlp"][1], silu(pre), compute_dtype))
    if "att_mlp" in p:
        m = m * jax.nn.sigmoid(linear(p["att_mlp"], m, compute_dtype))
    m = m * edge_mask
    agg = jnp.sum(m, axis=2)  # plain segment sum
    if node_attr:
        node_in = jnp.concatenate([h, agg, h0], axis=-1)
    else:
        node_in = jnp.concatenate([h, agg], axis=-1)
    out = linear(
        p["node_mlp"][1], silu(linear(p["node_mlp"][0], node_in, compute_dtype)),
        compute_dtype,
    )
    return h + out  # recurrent residual


def classifier_apply(
    params: dict,
    h0: Array,
    x: Array,
    node_mask: Array,
    edge_mask: Array,
    node_attr: bool = False,
    compute_dtype=None,
) -> Array:
    """h0 [B,N,F0], x [B,N,3] -> property prediction [B].

    reference: models_property.py:89-129 (EGNN.forward)."""
    radial, _ = coord2diff(x)  # d^2; coord_diff unused (no coordinate update)
    h = linear(params["embedding"], h0, compute_dtype)

    def body(h, gcl_p):
        return _gcl_apply(gcl_p, h, h0, radial, node_attr, edge_mask, compute_dtype), None

    h, _ = jax.lax.scan(body, h, params["gcls"])

    h = linear(
        params["node_dec"][1], silu(linear(params["node_dec"][0], h, compute_dtype)),
        compute_dtype,
    )
    h = h * node_mask
    pooled = jnp.sum(h, axis=1)
    pred = linear(
        params["graph_dec"][1], silu(linear(params["graph_dec"][0], pooled, compute_dtype)),
        compute_dtype,
    )
    return pred[:, 0]


# ---------------------------------------------------------------------------
# Baselines (reference: models_property.py:133-160)
# ---------------------------------------------------------------------------


def naive_init(key: Array) -> dict:
    return {"linear": linear_init(key, 1, 1)}


def naive_apply(params: dict, h0, x, node_mask, edge_mask) -> Array:
    b = node_mask.shape[0]
    z = jnp.zeros((b, 1))
    return linear(params["linear"], z)[:, 0]


def numnodes_init(key: Array, nf: int = 128) -> dict:
    k1, k2 = jax.random.split(key)
    return {"l1": linear_init(k1, 1, nf), "l2": linear_init(k2, nf, 1)}


def numnodes_apply(params: dict, h0, x, node_mask, edge_mask) -> Array:
    n = jnp.sum(node_mask[..., 0], axis=1, keepdims=True) / 29.0
    return linear(params["l2"], silu(linear(params["l1"], n)))[:, 0]

"""Legacy EGNN variant: coordinate update inside every GCL.

Dense-masked functional equivalent of the reference legacy backbone
(egnn/egnn.py:7-152 — E_GCL with in-layer coordinate update + EGNN).
The generative path uses the modern backbone (nn/egnn.py); this variant is
kept for API-surface parity and ablations. Differences from the modern one:

- each layer does edge MLP -> coordinate update -> node MLP (the modern
  backbone groups inv_sublayers GCLs then one coordinate update),
- the raw squared distance is appended to the edge features inside each
  layer (edge_coords_nf = 1), with the *initial* distances as edge_attr,
- coords_range_layer = coords_range / n_layers (x19 for 'mean' agg),
- plain segment sums (no normalization factor).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from geoldm_tpu.config import EGNNConfig
from geoldm_tpu.nn.core import linear, linear_init, linear_init_xavier, silu
from geoldm_tpu.ops.distance import coord2diff

Array = jax.Array


def _gcl_init(key: Array, hidden_nf: int, edges_in_d: int, attention: bool) -> dict:
    ks = jax.random.split(key, 8)
    p = {
        "edge_mlp": (
            linear_init(ks[0], 2 * hidden_nf + 1 + edges_in_d, hidden_nf),
            linear_init(ks[1], hidden_nf, hidden_nf),
        ),
        "node_mlp": (
            linear_init(ks[2], hidden_nf + hidden_nf, hidden_nf),
            linear_init(ks[3], hidden_nf, hidden_nf),
        ),
        "coord_mlp": (
            linear_init(ks[4], hidden_nf, hidden_nf),
            linear_init_xavier(ks[5], hidden_nf, 1, gain=0.001, bias=False),
        ),
    }
    if attention:
        p["att_mlp"] = linear_init(ks[6], hidden_nf, 1)
    return p


def legacy_egnn_init(key: Array, cfg: EGNNConfig, in_edge_nf: int = 1) -> dict:
    k_emb, k_out, k_blocks = jax.random.split(key, 3)
    keys = jax.random.split(k_blocks, max(cfg.n_layers, 1))
    gcls = [
        _gcl_init(keys[i], cfg.hidden_nf, in_edge_nf, cfg.attention)
        for i in range(cfg.n_layers)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *gcls) if cfg.n_layers else None
    return {
        "embedding": linear_init(k_emb, cfg.in_node_nf, cfg.hidden_nf),
        "embedding_out": linear_init(k_out, cfg.hidden_nf, cfg.out_node_nf),
        "gcls": stacked,
    }


def _gcl_apply(p, cfg: EGNNConfig, h, x, edge_attr, node_mask, edge_mask, compute_dtype):
    f = h.shape[-1]
    radial, coord_diff = coord2diff(x, cfg.norm_constant)
    # Edge model over [h_i, h_j, d^2, edge_attr].
    w = p["edge_mlp"][0]["w"]
    w_src, w_dst, w_e = w[:f], w[f : 2 * f], w[2 * f :]
    extra = jnp.concatenate([radial, edge_attr], axis=-1)
    pre = (
        linear({"w": w_src}, h, compute_dtype)[:, :, None, :]
        + linear({"w": w_dst}, h, compute_dtype)[:, None, :, :]
        + linear({"w": w_e}, extra, compute_dtype)
        + p["edge_mlp"][0]["b"]
    )
    m = silu(linear(p["edge_mlp"][1], silu(pre), compute_dtype))
    if "att_mlp" in p:
        m = m * jax.nn.sigmoid(linear(p["att_mlp"], m, compute_dtype))
    if edge_mask is not None:
        m = m * edge_mask

    # In-layer coordinate update.
    coords_range = cfg.coords_range / max(cfg.n_layers, 1)
    if cfg.aggregation_method == "mean":
        coords_range = coords_range * 19
    s = linear(
        p["coord_mlp"][1], silu(linear(p["coord_mlp"][0], m, compute_dtype)),
        compute_dtype,
    )
    if cfg.tanh:
        s = jnp.tanh(s) * coords_range
    trans = coord_diff * s
    if edge_mask is not None:
        trans = trans * edge_mask
    x = x + jnp.sum(trans, axis=2)

    # Node model with residual (plain segment sum).
    agg = jnp.sum(m, axis=2)
    node_in = jnp.concatenate([h, agg], axis=-1)
    h = h + linear(
        p["node_mlp"][1], silu(linear(p["node_mlp"][0], node_in, compute_dtype)),
        compute_dtype,
    )
    if node_mask is not None:
        h = h * node_mask
        x = x * node_mask
    return h, x


def legacy_egnn_apply(
    params: dict,
    cfg: EGNNConfig,
    h: Array,
    x: Array,
    node_mask: Optional[Array],
    edge_mask: Optional[Array],
    compute_dtype=None,
):
    """reference: egnn/egnn.py:141-152 (forward)."""
    radial0, _ = coord2diff(x)
    h = linear(params["embedding"], h, compute_dtype)
    if cfg.n_layers > 0:

        def body(carry, gcl_p):
            h, x = carry
            h, x = _gcl_apply(
                gcl_p, cfg, h, x, radial0, node_mask, edge_mask, compute_dtype
            )
            return (h, x), None

        (h, x), _ = jax.lax.scan(body, (h, x), params["gcls"])
    h = linear(params["embedding_out"], h, compute_dtype)
    if node_mask is not None:
        h = h * node_mask
    return h, x

"""Dense-masked E(n)-equivariant GNN for fully-connected molecular graphs.

TPU-first redesign of the reference EGNN (egnn/egnn_new.py). The reference
materializes a B*N^2 edge list and scatter-adds messages
(egnn/egnn_new.py:59-65, :258-274); here node tensors stay ``[B, N, F]``,
pairwise quantities are dense ``[B, N, N, *]`` blocks, and "segment sum"
is a masked reduction over the neighbor axis — everything maps onto MXU
matmuls and VPU elementwise ops with no gather/scatter.

Key optimization: the first layer of each edge MLP consumes the concat
``[h_i, h_j, e_ij]``. Instead of materializing the ``[B, N, N, 2F]``
broadcast concat, the weight is split into source/target/edge slices so the
h-contributions are two ``[B, N, F] @ [F, H]`` matmuls broadcast-added into
the pair grid — O(B N F H) FLOPs instead of O(B N^2 F H) for those terms.

Blocks are stacked and iterated with ``lax.scan`` (single trace/compile of
the block body instead of ``n_layers`` unrolled copies).

Feature parity with reference EGNN/GCL/EquivariantUpdate/EquivariantBlock:
attention gate (egnn_new.py:25-28,:37-39), tanh-clamped coordinate update
with per-layer coords_range (:89-91,:160), norm_constant-normalized
difference vectors (:249-255), inv_sublayers (:123-127), sin_embedding
(:235-246), normalization_factor / aggregation_method (:258-274), and the
non-equivariant GNN ablation (:200-232).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from geoldm_tpu.config import EGNNConfig
from geoldm_tpu.nn.core import linear, linear_init, linear_init_xavier, silu
from geoldm_tpu.ops.distance import coord2diff, sin_embedding

Array = jax.Array


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _gcl_init(key: Array, cfg: EGNNConfig, edges_in_d: int) -> dict:
    """One graph-convolution layer (reference GCL, egnn_new.py:5-28)."""
    nf = cfg.hidden_nf
    ks = jax.random.split(key, 5)
    p = {
        "edge_mlp": (
            linear_init(ks[0], 2 * nf + edges_in_d, nf),
            linear_init(ks[1], nf, nf),
        ),
        "node_mlp": (
            linear_init(ks[2], nf + nf, nf),
            linear_init(ks[3], nf, nf),
        ),
    }
    if cfg.attention:
        p["att_mlp"] = linear_init(ks[4], nf, 1)
    return p


def _coord_mlp_init(key: Array, cfg: EGNNConfig, edges_in_d: int) -> tuple:
    """Equivariant coordinate-update MLP (reference EquivariantUpdate,
    egnn_new.py:68-84; last layer bias-free, xavier gain 0.001)."""
    nf = cfg.hidden_nf
    ks = jax.random.split(key, 3)
    return (
        linear_init(ks[0], 2 * nf + edges_in_d, nf),
        linear_init(ks[1], nf, nf),
        linear_init_xavier(ks[2], nf, 1, gain=0.001, bias=False),
    )


def _block_init(key: Array, cfg: EGNNConfig) -> dict:
    ks = jax.random.split(key, cfg.inv_sublayers + 1)
    return {
        "gcls": tuple(
            _gcl_init(ks[i], cfg, cfg.edge_feat_nf) for i in range(cfg.inv_sublayers)
        ),
        "coord_mlp": _coord_mlp_init(ks[-1], cfg, cfg.edge_feat_nf),
    }


def egnn_init(key: Array, cfg: EGNNConfig) -> dict:
    """Full EGNN parameter pytree. Blocks are stacked along a leading axis
    for the ``lax.scan`` over layers."""
    k_emb, k_out, k_blocks = jax.random.split(key, 3)
    block_keys = jax.random.split(k_blocks, max(cfg.n_layers, 1))
    blocks = [_block_init(block_keys[i], cfg) for i in range(cfg.n_layers)]
    if cfg.n_layers > 0:
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    else:
        stacked = None
    return {
        "embedding": linear_init(k_emb, cfg.in_node_nf, cfg.hidden_nf),
        "embedding_out": linear_init(k_out, cfg.hidden_nf, cfg.out_node_nf),
        "blocks": stacked,
    }


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _pair_mlp_first_layer(
    p: dict, h: Array, edge_attr: Optional[Array], compute_dtype
) -> Array:
    """First layer of an MLP over the pair concat [h_i, h_j, e_ij] without
    materializing the concat: split the weight into source/target/edge
    slices and broadcast-add."""
    f = h.shape[-1]
    w = p["w"]
    w_src, w_dst, w_e = w[:f], w[f : 2 * f], w[2 * f :]
    src = linear({"w": w_src}, h, compute_dtype)  # [B, N, H]
    dst = linear({"w": w_dst}, h, compute_dtype)  # [B, N, H]
    pre = src[:, :, None, :] + dst[:, None, :, :]
    if edge_attr is not None and w_e.shape[0] > 0:
        pre = pre + linear({"w": w_e}, edge_attr, compute_dtype)
    return pre + p["b"]


def _aggregate(
    m: Array, edge_mask: Array, cfg: EGNNConfig
) -> Array:
    """Masked neighbor-sum: the dense equivalent of unsorted_segment_sum
    over the fully-connected edge list (reference egnn_new.py:258-274).

    'sum' divides by normalization_factor; 'mean' divides by the padded node
    count N (the reference's count includes every edge in the dense list,
    masked or not, so each segment has exactly N contributions)."""
    agg = jnp.sum(m * edge_mask, axis=2)  # [B, N, H]
    if cfg.aggregation_method == "sum":
        return agg / cfg.normalization_factor
    if cfg.aggregation_method == "mean":
        return agg / m.shape[2]
    raise ValueError(cfg.aggregation_method)


def gcl_apply(
    p: dict,
    cfg: EGNNConfig,
    h: Array,
    edge_attr: Optional[Array],
    node_mask: Optional[Array],
    edge_mask: Optional[Array],
    compute_dtype=None,
) -> Array:
    """Dense GCL: edge MLP over all pairs -> masked aggregation -> node MLP
    with residual (reference egnn_new.py:30-65)."""
    pre = _pair_mlp_first_layer(p["edge_mlp"][0], h, edge_attr, compute_dtype)
    mij = silu(linear(p["edge_mlp"][1], silu(pre), compute_dtype))  # [B,N,N,H]
    if "att_mlp" in p:
        mij = mij * jax.nn.sigmoid(linear(p["att_mlp"], mij, compute_dtype))
    if edge_mask is None:
        edge_mask = jnp.ones(mij.shape[:3] + (1,), dtype=mij.dtype)
    agg = _aggregate(mij, edge_mask, cfg)
    node_in = jnp.concatenate([h, agg], axis=-1)
    out = h + linear(
        p["node_mlp"][1], silu(linear(p["node_mlp"][0], node_in, compute_dtype)), compute_dtype
    )
    if node_mask is not None:
        out = out * node_mask
    return out


def equivariant_update_apply(
    p: tuple,
    cfg: EGNNConfig,
    h: Array,
    x: Array,
    coord_diff: Array,
    edge_attr: Array,
    node_mask: Optional[Array],
    edge_mask: Optional[Array],
    compute_dtype=None,
) -> Array:
    """Equivariant coordinate update (reference egnn_new.py:86-105):
    x_i += agg_j coord_diff_ij * phi_x([h_i, h_j, e_ij])."""
    pre = _pair_mlp_first_layer(p[0], h, edge_attr, compute_dtype)
    mid = silu(linear(p[1], silu(pre), compute_dtype))
    s = linear(p[2], mid, compute_dtype)  # [B, N, N, 1]
    if cfg.tanh:
        s = jnp.tanh(s) * cfg.coords_range_layer
    trans = coord_diff * s
    if edge_mask is None:
        edge_mask = jnp.ones(trans.shape[:3] + (1,), dtype=trans.dtype)
    agg = _aggregate(trans, edge_mask, cfg)
    x = x + agg
    if node_mask is not None:
        x = x * node_mask
    return x


def block_apply(
    p: dict,
    cfg: EGNNConfig,
    h: Array,
    x: Array,
    edge_attr0: Array,
    node_mask: Optional[Array],
    edge_mask: Optional[Array],
    compute_dtype=None,
):
    """EquivariantBlock (reference egnn_new.py:108-147): recompute distance
    features from the current coordinates, concat with the initial distance
    features, run inv_sublayers GCLs then one coordinate update."""
    radial, coord_diff = coord2diff(x, cfg.norm_constant)
    dist = sin_embedding(radial) if cfg.sin_embedding else radial
    edge_attr = jnp.concatenate([dist, edge_attr0], axis=-1)
    for gcl in p["gcls"]:
        h = gcl_apply(gcl, cfg, h, edge_attr, node_mask, edge_mask, compute_dtype)
    x = equivariant_update_apply(
        p["coord_mlp"], cfg, h, x, coord_diff, edge_attr, node_mask, edge_mask, compute_dtype
    )
    if node_mask is not None:
        h = h * node_mask
    return h, x


def egnn_apply(
    params: dict,
    cfg: EGNNConfig,
    h: Array,
    x: Array,
    node_mask: Optional[Array],
    edge_mask: Optional[Array],
    compute_dtype=None,
):
    """Full EGNN (reference egnn_new.py:150-197).

    h [B, N, in_node_nf], x [B, N, 3], node_mask [B, N, 1],
    edge_mask [B, N, N, 1] -> (h_out [B, N, out_node_nf], x_out [B, N, 3]).

    The initial distance features (from the input coordinates) are fed to
    every block alongside that block's own recomputed distances.
    """
    radial0, _ = coord2diff(x)  # top level always uses norm_constant=1 (ref :186)
    edge_attr0 = sin_embedding(radial0) if cfg.sin_embedding else radial0

    h = linear(params["embedding"], h, compute_dtype)

    if cfg.n_layers > 0:

        def body(carry, block_p):
            h, x = carry
            h, x = block_apply(
                block_p, cfg, h, x, edge_attr0, node_mask, edge_mask, compute_dtype
            )
            return (h, x), None

        if cfg.remat:
            body = jax.checkpoint(body)
        (h, x), _ = jax.lax.scan(body, (h, x), params["blocks"])

    h = linear(params["embedding_out"], h, compute_dtype)
    if node_mask is not None:
        h = h * node_mask
    return h, x


# ---------------------------------------------------------------------------
# Non-equivariant GNN ablation (reference egnn_new.py:200-232).
# ---------------------------------------------------------------------------


def gnn_init(key: Array, cfg: EGNNConfig, in_edge_nf: int = 0) -> dict:
    k_emb, k_out, k_blocks = jax.random.split(key, 3)
    block_keys = jax.random.split(k_blocks, max(cfg.n_layers, 1))
    gcls = [_gcl_init(block_keys[i], cfg, in_edge_nf) for i in range(cfg.n_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *gcls) if cfg.n_layers else None
    return {
        "embedding": linear_init(k_emb, cfg.in_node_nf, cfg.hidden_nf),
        "embedding_out": linear_init(k_out, cfg.hidden_nf, cfg.out_node_nf),
        "gcls": stacked,
    }


def gnn_apply(
    params: dict,
    cfg: EGNNConfig,
    h: Array,
    edge_attr: Optional[Array],
    node_mask: Optional[Array],
    edge_mask: Optional[Array],
    compute_dtype=None,
) -> Array:
    h = linear(params["embedding"], h, compute_dtype)
    if cfg.n_layers > 0:

        def body(h, gcl_p):
            h = gcl_apply(gcl_p, cfg, h, edge_attr, node_mask, edge_mask, compute_dtype)
            return h, None

        h, _ = jax.lax.scan(body, h, params["gcls"])
    h = linear(params["embedding_out"], h, compute_dtype)
    if node_mask is not None:
        h = h * node_mask
    return h

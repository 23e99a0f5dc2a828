"""Row-tiled Pallas EGNN kernels for large molecules (GEOM-Drugs, N<=181).

The whole-molecule kernel (ops/pallas_egnn.py) holds all G*N*N pair rows of
an EquivariantBlock in VMEM — impossible at GEOM's pad-184 (184^2 = 33,856
pair rows x H=256 x f32 = ~35MB per live buffer). This module tiles the
*row* dimension instead, flash-attention-style: grid = (molecule, row-tile),
and each grid step computes one [T, N] slab of the pair grid against the
full column set, which stays VMEM-resident (constant index_map). The edge
activations for a slab are [T*N, H] — a few MB — and never touch HBM.

Because a GCL's node update only needs its own row's aggregation, one
pallas_call per GCL suffices; the equivariant coordinate update needs the
post-GCL h of *all* nodes, so it runs as a second tiled call. Per
EquivariantBlock that is inv_sublayers + 1 tiny-launch kernels (GEOM: 2).

The backward defaults to fused tiled kernels too: each stage recomputes its
row slab in VMEM and differentiates it with an in-kernel ``jax.vjp``
(grads w.r.t. the full-column views accumulate across row tiles; row-view
grads land in tile-indexed outputs summed outside; weight grads accumulate
across the whole grid). GEOLDM_TILED_BWD=xla falls back to rematerializing
and differentiating the XLA block.

Semantics match nn.egnn.block_apply exactly (parity-tested against the
reference egnn/egnn_new.py:108-147 via the XLA path).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geoldm_tpu.config import EGNNConfig
from geoldm_tpu.ops.pallas_egnn import (
    _matmul,
    _reference_block,
    _sigmoid,
    _silu,
    _sin_features,
)

Array = jax.Array


def _pair_features(cfg: EGNNConfig, xi, x, x0i, x0):
    """Distance features + normalized differences for a [T, N] row slab."""
    diff = xi[:, None, :] - x[None, :, :]  # [T, N, 3]
    radial = jnp.sum(diff * diff, axis=-1, keepdims=True)
    norm = jnp.sqrt(radial + 1e-8)
    coord_diff = diff / (norm + cfg.norm_constant)
    dist_feat = _sin_features(radial) if cfg.sin_embedding else radial
    diff0 = x0i[:, None, :] - x0[None, :, :]
    radial0 = jnp.sum(diff0 * diff0, axis=-1, keepdims=True)
    e0 = _sin_features(radial0) if cfg.sin_embedding else radial0
    eattr = jnp.concatenate([dist_feat, e0], axis=-1)  # [T, N, E]
    return eattr, coord_diff


def _row_edge_mask(mask_i, mask, r0, tile, n):
    """[T, N, 1] edge mask for rows r0..r0+T: outer minus the diagonal."""
    pmask = mask_i * mask[:, 0][None, :]  # [T, N]
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, n), 0) + r0
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, n), 1)
    off_diag = (row != col).astype(pmask.dtype)
    return (pmask * off_diag)[..., None]


def _edge_pre_rows(cfg, compute_dtype, hi, h, eattr2, w1, b1, tile, n):
    """First edge-MLP layer on a row slab without materializing concat."""
    hidden = cfg.hidden_nf
    w_src = w1[:hidden]
    w_dst = w1[hidden : 2 * hidden]
    w_e = w1[2 * hidden :]
    src = _matmul(hi, w_src, compute_dtype)  # [T, H]
    dst = _matmul(h, w_dst, compute_dtype)  # [N, H]
    pre = src[:, None, :] + dst[None, :, :]  # [T, N, H]
    pre = pre.reshape(tile * n, hidden) + _matmul(eattr2, w_e, compute_dtype)
    return pre + b1


def _gcl_rows_math(cfg: EGNNConfig, n: int, tile: int, r0, compute_dtype,
                   gw: dict, full, rows, mean_div: int = 0):
    """One GCL for rows [r0, r0+tile) against all N columns.

    ``full`` = (h [N,H], x [N,3], x0 [N,3], node_mask [N,1]); ``rows`` =
    the same tensors pre-sliced to the tile (Mosaic has no dynamic_slice —
    the tile views come from a second BlockSpec on the same arrays).
    Returns the updated h rows [T, H]."""
    hidden = cfg.hidden_nf
    h, x, x0, node_mask = full
    hi, xi, x0i, mi = rows

    eattr, _ = _pair_features(cfg, xi, x, x0i, x0)
    eattr2 = eattr.reshape(tile * n, -1)
    emask = _row_edge_mask(mi, node_mask, r0, tile, n)

    pre = _edge_pre_rows(cfg, compute_dtype, hi, h, eattr2, gw["w1"], gw["b1"],
                         tile, n)
    m = _silu(_matmul(_silu(pre), gw["w2"], compute_dtype) + gw["b2"])
    if cfg.attention:
        m = m * _sigmoid(_matmul(m, gw["wa"], compute_dtype) + gw["ba"])
    m = m.reshape(tile, n, hidden) * emask
    agg = jnp.sum(m, axis=1)  # [T, H]
    if cfg.aggregation_method == "sum":
        agg = agg / cfg.normalization_factor
    else:
        # 'mean' divides by the CALLER's padded width, not the internal
        # tile-multiple pad (the dense path divides by its input N).
        agg = agg / (mean_div or n)
    node_in = jnp.concatenate([hi, agg], axis=-1)
    upd = _matmul(
        _silu(_matmul(node_in, gw["wn1"], compute_dtype) + gw["bn1"]),
        gw["wn2"], compute_dtype,
    ) + gw["bn2"]
    return (hi + upd) * mi


def _coord_rows_math(cfg: EGNNConfig, n: int, tile: int, r0, compute_dtype,
                     cw: dict, full, rows, mean_div: int = 0):
    """Equivariant coordinate update for rows [r0, r0+tile): [T, 3]."""
    h, x, x0, node_mask = full
    hi, xi, x0i, mi = rows

    eattr, coord_diff = _pair_features(cfg, xi, x, x0i, x0)
    eattr2 = eattr.reshape(tile * n, -1)
    emask = _row_edge_mask(mi, node_mask, r0, tile, n)

    pre = _edge_pre_rows(cfg, compute_dtype, hi, h, eattr2, cw["w1"], cw["b1"],
                         tile, n)
    mid = _silu(_matmul(_silu(pre), cw["w2"], compute_dtype) + cw["b2"])
    s = _matmul(mid, cw["w3"], compute_dtype).astype(jnp.float32)  # [T*N, 1]
    if cfg.tanh:
        s = jnp.tanh(s) * cfg.coords_range_layer
    trans = coord_diff * s.reshape(tile, n, 1) * emask
    aggx = jnp.sum(trans, axis=1)
    if cfg.aggregation_method == "sum":
        aggx = aggx / cfg.normalization_factor
    else:
        aggx = aggx / (mean_div or n)
    return (xi + aggx) * mi


_GCL_KEYS = ("w1", "b1", "w2", "b2", "wa", "ba", "wn1", "bn1", "wn2", "bn2")
_COORD_KEYS = ("w1", "b1", "w2", "b2", "w3")


def _make_gcl_rows_kernel(cfg: EGNNConfig, n: int, tile: int, compute_dtype,
                          keys, mean_div: int = 0):
    def kernel(*refs):
        full = tuple(r[0] for r in refs[:4])
        rows = tuple(r[0] for r in refs[4:8])
        ws = {k: r[:] for k, r in zip(keys, refs[8:-1])}
        out_ref = refs[-1]
        r0 = pl.program_id(1) * tile
        out_ref[0] = _gcl_rows_math(cfg, n, tile, r0, compute_dtype, ws,
                                    full, rows, mean_div)

    return kernel


def _make_coord_rows_kernel(cfg: EGNNConfig, n: int, tile: int, compute_dtype,
                            mean_div: int = 0):
    def kernel(*refs):
        full = tuple(r[0] for r in refs[:4])
        rows = tuple(r[0] for r in refs[4:8])
        ws = {k: r[:] for k, r in zip(_COORD_KEYS, refs[8:-1])}
        out_ref = refs[-1]
        r0 = pl.program_id(1) * tile
        out_ref[0] = _coord_rows_math(cfg, n, tile, r0, compute_dtype, ws,
                                      full, rows, mean_div)

    return kernel


def _accum_rows(ref, val, i):
    """Initialize-then-accumulate a [1, ...] output block across grid steps."""
    @pl.when(i == 0)
    def _():
        ref[0] = val

    @pl.when(i > 0)
    def _():
        ref[0] = ref[0] + val


def _accum_flat(ref, val, i):
    @pl.when(i == 0)
    def _():
        ref[:] = val

    @pl.when(i > 0)
    def _():
        ref[:] = ref[:] + val


def _make_rows_bwd_kernel(cfg: EGNNConfig, n: int, tile: int, compute_dtype,
                          keys, math_fn, mean_div: int = 0):
    """Backward kernel for one row-tiled stage (GCL or coord update).

    Recomputes the stage's forward for its row slab and differentiates it
    with an in-kernel ``jax.vjp``. Grads w.r.t. the full-array views
    accumulate across row tiles (constant index_map); grads w.r.t. the row
    views land in tile-indexed outputs (summed outside); weight grads
    accumulate across the whole grid."""
    nw = len(keys)

    def kernel(*refs):
        full = tuple(r[0] for r in refs[:4])
        rows = tuple(r[0] for r in refs[4:8])
        g_ref = refs[8]
        ws = [r[:] for r in refs[9 : 9 + nw]]
        outs = refs[9 + nw :]
        dh_f_ref, dx_f_ref, dx0_f_ref = outs[:3]
        dh_r_ref, dx_r_ref, dx0_r_ref = outs[3:6]
        dw_refs = outs[6:]

        h, x, x0, mask = full
        hi, xi, x0i, mi = rows
        it = pl.program_id(1)
        r0 = it * tile

        def f(ws_, h_, x_, x0_, hi_, xi_, x0i_):
            wd = dict(zip(keys, ws_))
            return math_fn(cfg, n, tile, r0, compute_dtype, wd,
                           (h_, x_, x0_, mask), (hi_, xi_, x0i_, mi),
                           mean_div)

        _, vjp_fn = jax.vjp(f, tuple(ws), h, x, x0, hi, xi, x0i)
        dws, dh, dx, dx0, dhi, dxi, dx0i = vjp_fn(g_ref[0])
        _accum_rows(dh_f_ref, dh, it)
        _accum_rows(dx_f_ref, dx, it)
        _accum_rows(dx0_f_ref, dx0, it)
        dh_r_ref[0] = dhi
        dx_r_ref[0] = dxi
        dx0_r_ref[0] = dx0i
        flat = pl.program_id(0) * pl.num_programs(1) + it
        for dw_ref, dw in zip(dw_refs, dws):
            _accum_flat(dw_ref, dw.astype(dw_ref.dtype), flat)

    return kernel


def _row_specs(n: int, tile: int):
    """The three BlockSpec builders every row-tiled call uses: full-array
    view (constant over the row-tile grid axis), tile view, and
    grid-resident weight."""
    def full_spec(feat):
        return pl.BlockSpec((1, n, feat), lambda mb, it: (mb, 0, 0),
                            memory_space=pltpu.VMEM)

    def tile_spec(feat):
        return pl.BlockSpec((1, tile, feat), lambda mb, it: (mb, it, 0),
                            memory_space=pltpu.VMEM)

    def weight_spec(w):
        return pl.BlockSpec(w.shape, lambda mb, it: (0,) * w.ndim,
                            memory_space=pltpu.VMEM)

    return full_spec, tile_spec, weight_spec


def _call_rows_bwd(cfg, n, tile, compute_dtype, keys, math_fn, cot_feat,
                   interpret, args, g_rows, weights, mean_div: int = 0):
    """Run a stage's backward kernel; returns (d_weights, dh, dx, dx0)."""
    h, x, x0, node_mask = args
    b, _, hidden = h.shape
    full_spec, tile_spec, weight_spec = _row_specs(n, tile)
    feats = (hidden, 3, 3, 1)
    kernel = _make_rows_bwd_kernel(cfg, n, tile, compute_dtype, keys, math_fn,
                                   mean_div)
    outs = pl.pallas_call(
        kernel,
        grid=(b, n // tile),
        in_specs=[
            *[full_spec(f) for f in feats],
            *[tile_spec(f) for f in feats],
            tile_spec(cot_feat),
            *[weight_spec(w) for w in weights],
        ],
        out_specs=[
            full_spec(hidden), full_spec(3), full_spec(3),
            tile_spec(hidden), tile_spec(3), tile_spec(3),
            *[weight_spec(w) for w in weights],
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, hidden), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, n, hidden), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
            *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights],
        ],
        interpret=interpret,
    )(h, x, x0, node_mask, h, x, x0, node_mask, g_rows, *weights)
    dh = outs[0] + outs[3]
    dx = outs[1] + outs[4]
    dx0 = outs[2] + outs[5]
    return list(outs[6:]), dh, dx, dx0


def _auto_tile_bwd(n: int, hidden: int) -> int:
    """Backward row tile: must divide the (already padded) N exactly, and
    the in-kernel vjp keeps residual AND cotangent slabs live (~4x the
    forward), so the slab budget is a quarter of the forward's. Budgets
    for the raised 64MB scoped limit — the enclosing jit MUST pass
    tpuflags.grad_compiler_options() (see tpuflags module docs)."""
    from geoldm_tpu.utils.tpuflags import RAISED_SCOPED_VMEM_KIB

    max_rows = RAISED_SCOPED_VMEM_KIB * 1024 // (hidden * 4 * 16)
    for t in range(min(256, n), 0, -8):
        if n % t == 0 and t * n <= max_rows:
            return t
    return 8


def _auto_tile(n: int, hidden: int) -> int:
    """Row tile minimizing padded compute within the VMEM slab budget.

    ~4 live f32 [T, pad_n, H] slab buffers budgeted against libtpu's
    DEFAULT 16MB scoped limit (~4k slab rows at H=256): forward kernels
    run inside sampler/eval jits that deliberately do NOT raise the limit
    (a raised limit slows XLA's own fusions — see tpuflags module docs).
    Cost model: total pair-grid compute is pad_n^2 whatever the tile;
    small tiles add per-grid-step overhead."""
    from geoldm_tpu.utils.tpuflags import LIBTPU_DEFAULT_SCOPED_VMEM_KIB

    padded8 = -(-n // 8) * 8
    max_rows = LIBTPU_DEFAULT_SCOPED_VMEM_KIB * 1024 // (hidden * 4 * 4)
    best_cost, best_t = None, 8
    for t in range(8, min(256, padded8) + 1, 8):
        pad_n = -(-padded8 // t) * t
        if t * pad_n > max_rows:
            continue
        # Total pair-grid compute is pad_n^2 whatever the tile; small tiles
        # add per-grid-step overhead (prologue + the [N, H] dst matmul
        # recomputed per tile), modeled as the 8/t factor.
        cost = pad_n * pad_n * (1.0 + 8.0 / t)
        if best_cost is None or cost < best_cost:
            best_cost, best_t = cost, t
    return best_t


def _call_rows(kernel, b: int, n: int, tile: int, out_feat: int,
               out_dtype, interpret, args, weights):
    """Shared pallas_call plumbing for the row-tiled kernels."""
    full_spec, tile_spec, weight_spec = _row_specs(n, tile)
    h, x, x0, node_mask = args
    hidden = h.shape[-1]
    feats = (hidden, 3, 3, 1)
    return pl.pallas_call(
        kernel,
        grid=(b, n // tile),
        in_specs=[
            *[full_spec(f) for f in feats],
            *[tile_spec(f) for f in feats],
            *[weight_spec(w) for w in weights],
        ],
        out_specs=pl.BlockSpec(
            (1, tile, out_feat), lambda mb, it: (mb, it, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, out_feat), out_dtype),
        interpret=interpret,
    )(h, x, x0, node_mask, h, x, x0, node_mask, *weights)


def _tiled_block_fwd_impl(cfg, block_params, h, x, x0, node_mask,
                          compute_dtype, interpret, tile=None, mean_div=0):
    """One EquivariantBlock via row-tiled kernels (inv_sublayers + 1 calls)."""
    b, n, hidden = h.shape
    t = tile or _auto_tile(n, hidden)
    t = min(t, n)
    assert n % t == 0, f"padded N {n} not divisible by tile {t}"

    for gcl in block_params["gcls"]:
        gw, keys = _gcl_weight_dict(cfg, gcl)
        weights = [gw[k] for k in keys]
        kernel = _make_gcl_rows_kernel(cfg, n, t, compute_dtype, keys,
                                       mean_div)
        h = _call_rows(kernel, b, n, t, hidden, h.dtype,
                       interpret, (h, x, x0, node_mask), weights)

    cw = _coord_weight_dict(block_params)
    weights = [cw[k] for k in _COORD_KEYS]
    kernel = _make_coord_rows_kernel(cfg, n, t, compute_dtype, mean_div)
    x = _call_rows(kernel, b, n, t, 3, x.dtype,
                   interpret, (h, x, x0, node_mask), weights)
    return h, x


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 6, 7, 8, 9, 10))
def tiled_block_apply(
    cfg: EGNNConfig,
    block_params: dict,
    h: Array,
    x: Array,
    x0: Array,
    node_mask: Array,
    compute_dtype=None,
    interpret: bool = False,
    tile: Optional[int] = None,
    bwd_mode: Optional[str] = None,
    mean_div: int = 0,
):
    """One EquivariantBlock, row-tiled. The default backward is the fused
    tiled in-kernel vjp (_tiled_block_bwd_impl); ``bwd_mode``/
    GEOLDM_TILED_BWD=xla selects the rematerialized-XLA fallback instead
    (see module docstring)."""
    return _tiled_block_fwd_impl(cfg, block_params, h, x, x0, node_mask,
                                 compute_dtype, interpret, tile, mean_div)


def _tfwd(cfg, block_params, h, x, x0, node_mask, compute_dtype, interpret,
          tile, bwd_mode, mean_div):
    out = _tiled_block_fwd_impl(cfg, block_params, h, x, x0, node_mask,
                                compute_dtype, interpret, tile, mean_div)
    return out, (block_params, h, x, x0, node_mask)


def _coord_weight_dict(block_params):
    return {
        "w1": block_params["coord_mlp"][0]["w"],
        "b1": block_params["coord_mlp"][0]["b"],
        "w2": block_params["coord_mlp"][1]["w"],
        "b2": block_params["coord_mlp"][1]["b"],
        "w3": block_params["coord_mlp"][2]["w"],
    }


def _gcl_weight_dict(cfg, gcl):
    gw = {
        "w1": gcl["edge_mlp"][0]["w"], "b1": gcl["edge_mlp"][0]["b"],
        "w2": gcl["edge_mlp"][1]["w"], "b2": gcl["edge_mlp"][1]["b"],
        "wn1": gcl["node_mlp"][0]["w"], "bn1": gcl["node_mlp"][0]["b"],
        "wn2": gcl["node_mlp"][1]["w"], "bn2": gcl["node_mlp"][1]["b"],
    }
    keys = list(_GCL_KEYS)
    if cfg.attention:
        gw["wa"] = gcl["att_mlp"]["w"]
        gw["ba"] = gcl["att_mlp"]["b"]
    else:
        keys = [k for k in keys if k not in ("wa", "ba")]
    return gw, keys


def _unflatten_gcl_grads(cfg, dws, keys):
    d = dict(zip(keys, dws))
    g = {
        "edge_mlp": ({"w": d["w1"], "b": d["b1"]},
                     {"w": d["w2"], "b": d["b2"]}),
        "node_mlp": ({"w": d["wn1"], "b": d["bn1"]},
                     {"w": d["wn2"], "b": d["bn2"]}),
    }
    if cfg.attention:
        g["att_mlp"] = {"w": d["wa"], "b": d["ba"]}
    return g


def _tiled_block_bwd_impl(cfg, block_params, h, x, x0, node_mask, g_h, g_x,
                          compute_dtype, interpret, tile=None, mean_div=0):
    """Fused backward: recompute the GCL chain with the tiled forward
    kernels (coordinates are only updated at the end of a block, so every
    GCL sees the same x), then run each stage's in-kernel vjp in reverse.

    ``tile`` is the FORWARD tile the caller ran with (N was padded to a
    multiple of it); the backward picks its own smaller tile but both must
    divide N exactly — a non-dividing tile would truncate the row grid and
    silently corrupt gradients."""
    b, n, hidden = h.shape
    t_f = min(tile or _auto_tile(n, hidden), n)
    t_b = _auto_tile_bwd(n, hidden)
    assert n % t_f == 0, f"padded N {n} not divisible by fwd tile {t_f}"
    assert n % t_b == 0, f"padded N {n} not divisible by bwd tile {t_b}"

    gcls = block_params["gcls"]
    hs = [h]
    for gcl in gcls:
        gw, keys = _gcl_weight_dict(cfg, gcl)
        weights = [gw[k] for k in keys]
        kernel = _make_gcl_rows_kernel(cfg, n, t_f, compute_dtype, keys,
                                       mean_div)
        hs.append(_call_rows(kernel, b, n, t_f, hidden, h.dtype, interpret,
                             (hs[-1], x, x0, node_mask), weights))

    cw = _coord_weight_dict(block_params)
    cweights = [cw[k] for k in _COORD_KEYS]
    dcws, dh_c, dx, dx0 = _call_rows_bwd(
        cfg, n, t_b, compute_dtype, _COORD_KEYS, _coord_rows_math, 3,
        interpret, (hs[-1], x, x0, node_mask), g_x, cweights, mean_div,
    )
    d_coord = ({"w": dcws[0], "b": dcws[1]}, {"w": dcws[2], "b": dcws[3]},
               {"w": dcws[4]})

    g = g_h + dh_c
    d_gcls = [None] * len(gcls)
    for k in range(len(gcls) - 1, -1, -1):
        gw, keys = _gcl_weight_dict(cfg, gcls[k])
        weights = [gw[kk] for kk in keys]
        dws, g, dx_k, dx0_k = _call_rows_bwd(
            cfg, n, t_b, compute_dtype, keys, _gcl_rows_math, hidden,
            interpret, (hs[k], x, x0, node_mask), g, weights, mean_div,
        )
        dx = dx + dx_k
        dx0 = dx0 + dx0_k
        d_gcls[k] = _unflatten_gcl_grads(cfg, dws, keys)

    d_params = {"gcls": tuple(d_gcls), "coord_mlp": d_coord}
    return d_params, g, dx, dx0


def _tbwd(cfg, compute_dtype, interpret, tile, bwd_mode, mean_div, residuals,
          cotangents):
    block_params, h, x, x0, node_mask = residuals
    if bwd_mode is None:
        bwd_mode = os.environ.get("GEOLDM_TILED_BWD", "pallas")
    if bwd_mode == "pallas":
        d_params, dh, dx, dx0 = _tiled_block_bwd_impl(
            cfg, block_params, h, x, x0, node_mask,
            cotangents[0], cotangents[1], compute_dtype, interpret, tile,
            mean_div,
        )
        return (d_params, dh, dx, dx0, jnp.zeros_like(node_mask))
    # 'xla': rematerialize + differentiate the XLA block. Drops the (exact)
    # x0 gradient like the whole-molecule 'xla' mode — safe for the GeoLDM
    # models because no trainable parameters sit upstream of any EGNN's
    # coordinate input (data for encoder/classifier, stop_gradient-detached
    # latents for denoiser/decoder; latent.py matches the reference's
    # z.detach() at en_diffusion.py:1155).
    _, vjp_fn = jax.vjp(
        lambda p, h_, x_: _reference_block(cfg, p, h_, x_, x0, node_mask),
        block_params, h, x,
    )
    d_params, dh, dx = vjp_fn(tuple(cotangents))
    return (d_params, dh, dx, jnp.zeros_like(x0), jnp.zeros_like(node_mask))


tiled_block_apply.defvjp(_tfwd, _tbwd)


def egnn_apply_pallas_tiled(
    params: dict,
    cfg: EGNNConfig,
    h: Array,
    x: Array,
    node_mask: Array,
    compute_dtype=None,
    interpret: bool = False,
    tile: Optional[int] = None,
    bwd_mode: Optional[str] = None,
):
    """Full EGNN forward with row-tiled blocks (same contract as
    nn.egnn.egnn_apply). Pads N up to a tile multiple internally.
    ``bwd_mode`` 'pallas'|'xla' selects the gradient path (default:
    GEOLDM_TILED_BWD, itself defaulting to the fused tiled backward)."""
    from geoldm_tpu.nn.core import linear

    b, n, _ = h.shape
    t = tile or _auto_tile(-(-n // 8) * 8, cfg.hidden_nf)
    pad_n = -(-n // t) * t
    pad = pad_n - n
    x0 = x
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        x0 = x
        node_mask = jnp.pad(node_mask, ((0, 0), (0, pad), (0, 0)))

    h = linear(params["embedding"], h, compute_dtype)
    if cfg.n_layers > 0:

        def body(carry, block_p):
            h, x = carry
            h, x = tiled_block_apply(
                cfg, block_p, h, x, x0, node_mask, compute_dtype, interpret,
                t, bwd_mode, n,
            )
            return (h, x), None

        (h, x), _ = jax.lax.scan(body, (h, x), params["blocks"])
    h = linear(params["embedding_out"], h, compute_dtype)
    h = h * node_mask
    if pad:
        h = h[:, :n]
        x = x[:, :n]
    return h, x

"""Fused Pallas TPU kernel for one EGNN EquivariantBlock.

The XLA path materializes the [B, N, N, H] edge activations in HBM between
fusions (three such tensors per GCL: pre-activation, messages, gated
messages). This kernel runs one *entire* EquivariantBlock per grid step —
distance features, inv_sublayers GCLs (edge MLP + attention gate + masked
aggregation + node MLP) and the equivariant coordinate update — entirely in
VMEM, so the only HBM traffic per block is the [B, N, H] node features,
[B, N, 3] coordinates and the weights.

Inputs are deliberately tiny: the edge mask is reconstructed in-kernel from
the node mask, and the initial distance features are recomputed from the
input coordinates x0 (instead of streaming a [B, N, N, E] tensor).

Matmuls hit the MXU as [N*N, H] x [H, H] contractions with float32
accumulation; an optional bfloat16 compute mode casts matmul operands only.

The public entry point ``fused_block_apply`` has a custom VJP with two
backward modes (``bwd_mode``): 'pallas' (default) runs a fused backward
kernel that recomputes the forward's edge pipeline in VMEM and produces
input + weight gradients without ever materializing edge-sized tensors in
HBM (1.26x faster value+grad than the XLA path on v5e at flagship shapes);
'xla' rematerializes + differentiates the reference XLA block. The fused
backward's VMEM live set exceeds libtpu's default 16MB scoped allocation at
N=32/H=256 — train-step jits pass utils.tpuflags.grad_compiler_options().

Semantics match geoldm_tpu.nn.egnn.block_apply exactly (which itself is
forward-parity-tested against the reference egnn/egnn_new.py:108-147).
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
from geoldm_tpu.ops.distance import _FREQUENCIES
from geoldm_tpu.utils.tpuflags import RAISED_SCOPED_VMEM_KIB

Array = jax.Array


def _edge_lowp_enabled() -> bool:
    """Run the edge-pipeline activation chain in the compute dtype (bf16).

    Opt-in via GEOLDM_PALLAS_EDGE_LOWP=1: measured ~15% SLOWER than f32 on
    v5e (the VPU transcendentals stay f32 and the cast chain dominates);
    no effect when the compute dtype is None (f32)."""
    return os.environ.get("GEOLDM_PALLAS_EDGE_LOWP", "0") == "1"


def _edge_itemsize(compute_dtype) -> int:
    """Bytes per edge-activation element. bf16 compute only halves the
    VMEM live set when the edge activations themselves run in bf16
    (GEOLDM_PALLAS_EDGE_LOWP); with plain operand casting they stay f32,
    so group/dispatch budgets must assume 4 bytes."""
    if compute_dtype == jnp.bfloat16 and _edge_lowp_enabled():
        return 2
    return 4


def _sigmoid(x):
    """Sigmoid with the transcendental in f32: Mosaic's verifier rejects
    bf16-vector logistic ('vector.broadcast' element-type mismatch), and the
    VPU transcendental unit is f32 anyway. Result returns to x's dtype."""
    if x.dtype == jnp.bfloat16:
        return jax.nn.sigmoid(x.astype(jnp.float32)).astype(jnp.bfloat16)
    return jax.nn.sigmoid(x)


def _silu(x):
    return x * _sigmoid(x)


def _matmul(a, w, compute_dtype, out_dtype=None):
    if compute_dtype is not None:
        a = a.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out = jax.lax.dot_general(
        a, w, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,  # MXU accumulates f32
    )
    # Mosaic requires f32 matmul results; cast afterwards when the edge
    # pipeline runs in bf16.
    if out_dtype is not None and out.dtype != out_dtype:
        out = out.astype(out_dtype)
    return out


def _sin_features(radial):
    """Sinusoidal distance features from d^2, built with static Python-float
    frequencies (Pallas kernels cannot capture array constants).

    Gradients are stopped, matching the reference's .detach()
    (egnn/egnn_new.py:246) and ops/distance.sin_embedding."""
    d = jnp.sqrt(radial + 1e-8)
    sins = [jnp.sin(d * float(f)) for f in _FREQUENCIES]
    coss = [jnp.cos(d * float(f)) for f in _FREQUENCIES]
    return jax.lax.stop_gradient(jnp.concatenate(sins + coss, axis=-1))


def _dist_features(x, sin_embedding: bool):
    """Squared distances [N,N,1] (or sinusoidal features [N,N,D])."""
    diff = x[:, None, :] - x[None, :, :]
    radial = jnp.sum(diff * diff, axis=-1, keepdims=True)
    if not sin_embedding:
        return radial
    return _sin_features(radial)


def _block_math(cfg: EGNNConfig, n: int, group: int, compute_dtype,
                ws: list, h, x, x0, node_mask):
    """Pure math of one EquivariantBlock on a group of molecules.

    Shared by the forward kernel body and the fused backward kernel (which
    differentiates this very function with ``jax.vjp`` inside the kernel —
    residuals live in VMEM, never HBM). ``ws`` is the flat weight list in
    ``_block_weight_list`` order. h [G,N,H], x/x0 [G,N,3], mask [G,N,1]."""
    n_gcl = cfg.inv_sublayers
    attention = cfg.attention
    hidden = cfg.hidden_nf
    e_feat = cfg.edge_feat_nf
    g_ = group

    it = iter(ws)
    gcl_ws = [
        {
            "w1": next(it), "b1": next(it), "w2": next(it), "b2": next(it),
            **({"wa": next(it), "ba": next(it)} if attention else {}),
            "wn1": next(it), "bn1": next(it), "wn2": next(it), "bn2": next(it),
        }
        for _ in range(n_gcl)
    ]
    cw = {"w1": next(it), "b1": next(it), "w2": next(it), "b2": next(it),
          "w3": next(it)}

    # Masks: edge = outer(node) minus diagonal, per molecule.
    pair_mask = node_mask * node_mask[:, :, 0][:, None, :]  # [G, N, N]
    eye = jnp.eye(n, dtype=pair_mask.dtype)[None]
    edge_mask = (pair_mask * (1.0 - eye))[..., None]  # [G, N, N, 1]

    # Distance features: current-x (block) + initial-x (global).
    diff = x[:, :, None, :] - x[:, None, :, :]  # [G, N, N, 3]
    radial = jnp.sum(diff * diff, axis=-1, keepdims=True)
    norm = jnp.sqrt(radial + 1e-8)
    coord_diff = diff / (norm + cfg.norm_constant)
    if cfg.sin_embedding:
        dist_feat = _sin_features(radial)
    else:
        dist_feat = radial
    diff0 = x0[:, :, None, :] - x0[:, None, :, :]
    radial0 = jnp.sum(diff0 * diff0, axis=-1, keepdims=True)
    e0 = _sin_features(radial0) if cfg.sin_embedding else radial0
    eattr = jnp.concatenate([dist_feat, e0], axis=-1)  # [G, N, N, E]
    eattr2 = eattr.reshape(g_ * n * n, e_feat)

    # Edge pipeline activation dtype. The kernel is VPU-bound, not
    # MXU-bound (STATUS findings): silu/sigmoid over [G*N*N, H] dominate,
    # and bf16 activations process 2-per-lane. Direct bf16 broadcasts and
    # bf16 matmul results trip Mosaic verification in this toolchain, so
    # the bf16 mode keeps every matmul OUTPUT and the [h_i + h_j]
    # broadcast-add in f32 and casts only the activation chain
    # (silu -> matmul operand -> sigmoid gate) down to bf16.
    edge_dtype = compute_dtype if _edge_lowp_enabled() else None

    def edge_pre(h_, w1, b1):
        """First edge-MLP layer without materializing [h_i, h_j] concat."""
        w_src = w1[:hidden]
        w_dst = w1[hidden : 2 * hidden]
        w_e = w1[2 * hidden :]
        h2 = h_.reshape(g_ * n, hidden)
        src = _matmul(h2, w_src, compute_dtype).reshape(g_, n, hidden)
        dst = _matmul(h2, w_dst, compute_dtype).reshape(g_, n, hidden)
        pre = src[:, :, None, :] + dst[:, None, :, :]  # [G, N, N, H] f32
        pre = pre.reshape(g_ * n * n, hidden) + _matmul(
            eattr2, w_e, compute_dtype
        )
        pre = pre + b1
        return pre.astype(edge_dtype) if edge_dtype is not None else pre

    def cast_b(b_, like):
        return b_.astype(like.dtype) if edge_dtype is not None else b_

    for g in gcl_ws:
        pre = edge_pre(h, g["w1"], g["b1"])
        mm = _matmul(_silu(pre), g["w2"], compute_dtype, edge_dtype)
        m = _silu(mm + cast_b(g["b2"], mm))
        if attention:
            am = _matmul(m, g["wa"], compute_dtype, edge_dtype)
            m = m * _sigmoid(am + cast_b(g["ba"], am))
        m = m.astype(jnp.float32).reshape(g_, n, n, hidden) * edge_mask
        agg = jnp.sum(m, axis=2)  # [G, N, H]
        if cfg.aggregation_method == "sum":
            agg = agg / cfg.normalization_factor
        else:
            agg = agg / n
        node_in = jnp.concatenate([h, agg], axis=-1).reshape(g_ * n, 2 * hidden)
        upd = _matmul(
            _silu(_matmul(node_in, g["wn1"], compute_dtype) + g["bn1"]),
            g["wn2"], compute_dtype,
        ) + g["bn2"]
        h = (h + upd.reshape(g_, n, hidden)) * node_mask

    # Equivariant coordinate update.
    pre = edge_pre(h, cw["w1"], cw["b1"])
    mm = _matmul(_silu(pre), cw["w2"], compute_dtype, edge_dtype)
    mid = _silu(mm + cast_b(cw["b2"], mm))
    s = _matmul(mid, cw["w3"], compute_dtype).astype(jnp.float32)  # [G*N*N, 1]
    if cfg.tanh:
        s = jnp.tanh(s) * cfg.coords_range_layer
    trans = coord_diff * s.reshape(g_, n, n, 1) * edge_mask
    aggx = jnp.sum(trans, axis=2)
    if cfg.aggregation_method == "sum":
        aggx = aggx / cfg.normalization_factor
    else:
        aggx = aggx / n
    x = (x + aggx) * node_mask

    return h * node_mask, x


def _n_weights(cfg: EGNNConfig) -> int:
    return cfg.inv_sublayers * (10 if cfg.attention else 8) + 5


def _make_kernel(cfg: EGNNConfig, n: int, compute_dtype, group: int):
    """Forward kernel closure for a given (static) config and node count.

    ``group`` molecules are processed per grid step: node matmuls become
    [G*N, H] and edge matmuls [G*N*N, H] contractions, amortizing grid-step
    overhead and filling the MXU."""
    nw = _n_weights(cfg)

    def kernel(*refs):
        # Layout: [h, x, x0, node_mask] + flat weights, then [h_out, x_out].
        h_ref, x_ref, x0_ref, mask_ref = refs[:4]
        ws = [r[:] for r in refs[4 : 4 + nw]]
        h_out_ref, x_out_ref = refs[4 + nw :]
        h_out, x_out = _block_math(
            cfg, n, group, compute_dtype, ws,
            h_ref[:], x_ref[:], x0_ref[:], mask_ref[:],
        )
        h_out_ref[:] = h_out
        x_out_ref[:] = x_out

    return kernel


def _make_bwd_kernel(cfg: EGNNConfig, n: int, compute_dtype, group: int):
    """Fused backward kernel: recompute the block forward in VMEM and
    differentiate it with an in-kernel ``jax.vjp`` — the [G*N*N, H] residuals
    never touch HBM (the XLA-remat backward writes several of them per
    block). Weight grads accumulate across grid steps in a VMEM-resident
    output block (constant index_map)."""
    nw = _n_weights(cfg)

    def kernel(*refs):
        # Inputs: [h, x, x0, node_mask, dh_out, dx_out] + flat weights.
        # Outputs: [dh, dx, dx0] + flat weight grads (accumulated).
        h_ref, x_ref, x0_ref, mask_ref, g_h_ref, g_x_ref = refs[:6]
        ws = [r[:] for r in refs[6 : 6 + nw]]
        out_refs = refs[6 + nw :]
        dh_ref, dx_ref, dx0_ref = out_refs[:3]
        dw_refs = out_refs[3:]

        node_mask = mask_ref[:]

        def f(ws_, h_, x_, x0_):
            return _block_math(cfg, n, group, compute_dtype, list(ws_),
                               h_, x_, x0_, node_mask)

        _, vjp_fn = jax.vjp(f, tuple(ws), h_ref[:], x_ref[:], x0_ref[:])
        dws, dh, dx, dx0 = vjp_fn((g_h_ref[:], g_x_ref[:]))
        dh_ref[:] = dh
        dx_ref[:] = dx
        dx0_ref[:] = dx0

        i = pl.program_id(0)
        for dw_ref, dw in zip(dw_refs, dws):
            _accumulate(dw_ref, dw.astype(dw_ref.dtype), i)

    return kernel


def _accumulate(ref, val, i):
    @pl.when(i == 0)
    def _():
        ref[:] = val

    @pl.when(i > 0)
    def _():
        ref[:] = ref[:] + val


def _block_weight_list(block_params: dict, attention: bool):
    ws = []
    for g in block_params["gcls"]:
        ws += [g["edge_mlp"][0]["w"], g["edge_mlp"][0]["b"],
               g["edge_mlp"][1]["w"], g["edge_mlp"][1]["b"]]
        if attention:
            ws += [g["att_mlp"]["w"], g["att_mlp"]["b"]]
        ws += [g["node_mlp"][0]["w"], g["node_mlp"][0]["b"],
               g["node_mlp"][1]["w"], g["node_mlp"][1]["b"]]
    ws += [block_params["coord_mlp"][0]["w"], block_params["coord_mlp"][0]["b"],
           block_params["coord_mlp"][1]["w"], block_params["coord_mlp"][1]["b"],
           block_params["coord_mlp"][2]["w"]]
    return ws


def _unflatten_block_grads(dws, n_gcl: int, attention: bool) -> dict:
    """Inverse of _block_weight_list: flat grads -> block_params pytree."""
    it = iter(dws)
    gcls = []
    for _ in range(n_gcl):
        g = {
            "edge_mlp": ({"w": next(it), "b": next(it)},
                         {"w": next(it), "b": next(it)}),
        }
        if attention:
            g["att_mlp"] = {"w": next(it), "b": next(it)}
        g["node_mlp"] = ({"w": next(it), "b": next(it)},
                         {"w": next(it), "b": next(it)})
        gcls.append(g)
    coord = ({"w": next(it), "b": next(it)}, {"w": next(it), "b": next(it)},
             {"w": next(it)})
    return {"gcls": tuple(gcls), "coord_mlp": coord}


def _auto_group(b: int, n: int, hidden: int, itemsize: int = 4) -> int:
    """Largest group size <= 8 dividing b whose live [G*N*N, H] pair buffers
    stay within the ~16MB VMEM budget.

    Calibrated on v5e: ~3 such buffers live simultaneously for aligned N;
    unaligned N (not a multiple of 8) forces relayout copies around the
    [G*N*N, H] reshapes, roughly doubling the live set."""
    # Calibrated on v5e at hidden=256: g*N^2 = 4096 pair rows fit the 16MB
    # scoped VMEM (g=4, N=32 compiles; g=8, N=24 -> 4608 rows OOMs at
    # 17.75M). Unaligned N additionally forces relayout copies — halve.
    # NOT scaled with a raised scoped-VMEM limit: larger forward groups
    # measured slower (g=8 at N=32: 2.30 ms/iter vs 1.96 at g=2 under a
    # 64MB limit) — the 4096-row budget is the performance optimum, not
    # just the fit boundary.
    if "GEOLDM_PALLAS_GROUP" in os.environ:
        return int(os.environ["GEOLDM_PALLAS_GROUP"])
    padded_n = -(-n // 8) * 8
    max_rows = 4096 * 4 // itemsize
    if hidden > 256:
        max_rows = max_rows * 256 // hidden
    if n % 8 != 0:
        max_rows //= 2
    for g in (8, 4, 2, 1):
        if b % g == 0 and g * padded_n * padded_n <= max_rows:
            return g
    return 1


def _bwd_rows_budget(n: int, hidden: int) -> int:
    """Max pair rows the fused whole-molecule BACKWARD fits in the raised
    scoped-VMEM limit (measured ~17KB/row live on v5e; see _auto_group_bwd)."""
    max_rows = max(256, int(RAISED_SCOPED_VMEM_KIB * 0.95) * 1024 // (17 * 1024))
    if hidden > 256:
        max_rows = max_rows * 256 // hidden
    if n % 8 != 0:
        max_rows //= 2
    return max_rows


def _auto_group_bwd(b: int, n: int, hidden: int) -> int:
    """Group size for the fused backward kernel. The in-kernel vjp keeps
    forward residuals AND edge-sized cotangents live in VMEM (~4x the
    forward's live set), so the pair-row budget is a quarter of the
    forward's. Measured on v5e: 1024 rows -> 17.26MB live (~17KB/row), so
    the budget is limit/17KB with ~5% headroom. Budgets for the raised
    64MB limit: the enclosing jit MUST pass
    tpuflags.grad_compiler_options() (a train step compiled without it
    fails with a scoped-VMEM OOM naming this kernel)."""
    padded_n = -(-n // 8) * 8
    max_rows = _bwd_rows_budget(n, hidden)
    for g in (8, 4, 2, 1):
        if b % g == 0 and g * padded_n * padded_n <= max_rows:
            return g
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 6, 7, 8, 9))
def fused_block_apply(
    cfg: EGNNConfig,
    block_params: dict,
    h: Array,
    x: Array,
    x0: Array,
    node_mask: Array,
    compute_dtype=None,
    interpret: bool = False,
    group: Optional[int] = None,
    bwd_mode: str = "pallas",
):
    """One EquivariantBlock, fused. h [B,N,H], x/x0 [B,N,3], node_mask [B,N,1].

    Equivalent to nn.egnn.block_apply with edge_attr0 = distance features of
    x0 and edge_mask = outer(node_mask) minus diagonal.

    ``bwd_mode``: 'pallas' (fused backward kernel — residuals stay in VMEM)
    or 'xla' (rematerialize + differentiate the XLA block). The XLA mode
    drops the gradient w.r.t. x0 (zero); the pallas mode computes it
    exactly. Dropping it is safe for the GeoLDM models because no trainable
    parameters sit upstream of any EGNN's coordinate input: the encoder and
    classifier see raw data, and the denoiser/decoder see latents that are
    stop_gradient-detached (diffusion/latent.py, matching the reference's
    z.detach() at en_diffusion.py:1155) — but a model that feeds one
    trainable EGNN's coordinate output into another must use 'pallas'."""
    return _fused_block_fwd_impl(cfg, block_params, h, x, x0, node_mask,
                                 compute_dtype, interpret, group)


def _fused_block_fwd_impl(cfg, block_params, h, x, x0, node_mask,
                          compute_dtype, interpret, group=None):
    b, n, hidden = h.shape
    weights = _block_weight_list(block_params, cfg.attention)
    g = group or _auto_group(b, n, hidden, _edge_itemsize(compute_dtype))
    assert b % g == 0, f"batch {b} not divisible by group {g}"

    def batch_spec(shape):
        return pl.BlockSpec(
            (g,) + shape, lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def weight_spec(w):
        return pl.BlockSpec(
            w.shape, lambda i: (0,) * w.ndim, memory_space=pltpu.VMEM
        )

    kernel = _make_kernel(cfg, n, compute_dtype, g)
    flops_per_item = (
        # Two node-side first-layer matmuls + edge matmuls per GCL + coord MLP.
        2 * (2 * n * hidden * hidden)
        + cfg.inv_sublayers * (2 * n * n * hidden * hidden * 2)
        + 2 * n * n * hidden * hidden
    )
    h_out, x_out = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[
            batch_spec((n, hidden)),
            batch_spec((n, 3)),
            batch_spec((n, 3)),
            batch_spec((n, 1)),
            *[weight_spec(w) for w in weights],
        ],
        out_specs=[
            batch_spec((n, hidden)),
            batch_spec((n, 3)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, hidden), h.dtype),
            jax.ShapeDtypeStruct((b, n, 3), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * flops_per_item,
            bytes_accessed=4 * b * (2 * n * hidden + 4 * n * 3 + n),
            transcendentals=b * n * n * hidden * 2,
        ),
        interpret=interpret,
    )(h, x, x0, node_mask, *weights)
    return h_out, x_out


def _reference_block(cfg, block_params, h, x, x0, node_mask):
    from geoldm_tpu.nn.egnn import block_apply
    from geoldm_tpu.ops.distance import build_edge_mask, coord2diff, sin_embedding

    radial0, _ = coord2diff(x0)
    e0 = sin_embedding(radial0) if cfg.sin_embedding else radial0
    edge_mask = build_edge_mask(node_mask)
    return block_apply(block_params, cfg, h, x, e0, node_mask, edge_mask)


def _fused_block_bwd_impl(cfg, block_params, h, x, x0, node_mask, g_h, g_x,
                          compute_dtype, interpret, group=None):
    """Invoke the fused backward kernel; returns (d_block_params, dh, dx, dx0)."""
    b, n, hidden = h.shape
    weights = _block_weight_list(block_params, cfg.attention)
    g = group or _auto_group_bwd(b, n, hidden)
    assert b % g == 0, f"batch {b} not divisible by bwd group {g}"

    def batch_spec(shape):
        return pl.BlockSpec(
            (g,) + shape, lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def weight_spec(w):
        # Constant index_map: the block stays VMEM-resident across the
        # (sequential) grid steps — weight grads accumulate into it.
        return pl.BlockSpec(
            w.shape, lambda i: (0,) * w.ndim, memory_space=pltpu.VMEM
        )

    kernel = _make_bwd_kernel(cfg, n, compute_dtype, g)
    outs = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[
            batch_spec((n, hidden)),
            batch_spec((n, 3)),
            batch_spec((n, 3)),
            batch_spec((n, 1)),
            batch_spec((n, hidden)),
            batch_spec((n, 3)),
            *[weight_spec(w) for w in weights],
        ],
        out_specs=[
            batch_spec((n, hidden)),
            batch_spec((n, 3)),
            batch_spec((n, 3)),
            *[weight_spec(w) for w in weights],
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, hidden), h.dtype),
            jax.ShapeDtypeStruct((b, n, 3), x.dtype),
            jax.ShapeDtypeStruct((b, n, 3), x0.dtype),
            *[jax.ShapeDtypeStruct(w.shape, w.dtype) for w in weights],
        ],
        interpret=interpret,
    )(h, x, x0, node_mask, g_h, g_x, *weights)
    dh, dx, dx0 = outs[:3]
    d_params = _unflatten_block_grads(outs[3:], cfg.inv_sublayers, cfg.attention)
    return d_params, dh, dx, dx0


def _fwd(cfg, block_params, h, x, x0, node_mask, compute_dtype, interpret,
         group, bwd_mode):
    out = _fused_block_fwd_impl(
        cfg, block_params, h, x, x0, node_mask, compute_dtype, interpret, group
    )
    return out, (block_params, h, x, x0, node_mask)


def _bwd(cfg, compute_dtype, interpret, group, bwd_mode, residuals, cotangents):
    block_params, h, x, x0, node_mask = residuals
    if bwd_mode == "pallas":
        # An explicit group override applies to the backward kernel too
        # (callers forcing it accept the ~4x larger VMEM live set).
        d_params, dh, dx, dx0 = _fused_block_bwd_impl(
            cfg, block_params, h, x, x0, node_mask,
            cotangents[0], cotangents[1], compute_dtype, interpret, group,
        )
        return (d_params, dh, dx, dx0, jnp.zeros_like(node_mask))
    # 'xla': differentiate the XLA reference block (rematerialized in HBM).
    _, vjp_fn = jax.vjp(
        lambda p, h_, x_: _reference_block(cfg, p, h_, x_, x0, node_mask),
        block_params, h, x,
    )
    d_params, dh, dx = vjp_fn(tuple(cotangents))
    return (d_params, dh, dx, jnp.zeros_like(x0), jnp.zeros_like(node_mask))


fused_block_apply.defvjp(_fwd, _bwd)


def dispatch_to_tiled(n: int, hidden_nf: int, compute_dtype=None,
                      bwd_mode: str = "pallas") -> bool:
    """True when egnn_apply_pallas must route to the row-tiled kernels.

    Two independent budgets, both in pair rows (padded_n^2 per molecule at
    group=1):
    - FORWARD: the whole-molecule kernel holds all pair rows live in VMEM;
      4096 f32 rows is the calibrated 16MB-scoped fit/performance optimum.
    - BACKWARD: the fused in-kernel vjp's live set is ~17KB/row, budgeted
      against the raised 64MB scoped limit (~3.6k rows at hidden 256) —
      SMALLER than the forward budget at the boundary. e.g. padded N=64:
      4096 rows fit the forward exactly, but 4096 * ~17KB = ~70MB overflows
      the raised scoped limit even at group=1, and the training compile
      dies in Mosaic's stack allocator (the round-3 GEOM pad-64 bucket
      scope-OOM). Whether the caller will differentiate is unknowable at
      trace time, so boundary sizes route to tiled for forward-only callers
      too (costs only the non-default pallas sampling path at those
      buckets; pass bwd_mode='xla' to keep the whole-molecule forward
      there — the XLA-remat backward has no in-kernel live set)."""
    padded_n = -(-n // 8) * 8
    fwd_rows = 4096 * 4 // _edge_itemsize(compute_dtype)
    if n % 8 != 0:
        # Same relayout-copy penalty _auto_group applies: unaligned N
        # roughly doubles the live set around the [G*N*N, H] reshapes.
        fwd_rows //= 2
    fwd_overflow = padded_n * padded_n > fwd_rows
    bwd_overflow = (
        bwd_mode == "pallas"
        and padded_n * padded_n > _bwd_rows_budget(n, hidden_nf)
    )
    return fwd_overflow or bwd_overflow


def egnn_apply_pallas(
    params: dict,
    cfg: EGNNConfig,
    h: Array,
    x: Array,
    node_mask: Array,
    compute_dtype=None,
    interpret: bool = False,
    group: Optional[int] = None,
    bwd_mode: Optional[str] = None,
):
    """Full EGNN forward with the fused Pallas block.

    Same contract as nn.egnn.egnn_apply (edge_mask is derived in-kernel).
    ``bwd_mode`` 'pallas'|'xla' selects the gradient path (default 'pallas',
    overridable with GEOLDM_PALLAS_BWD). Molecules whose full N*N pair grid
    exceeds the whole-molecule kernel's VMEM budget (GEOM-scale N) dispatch
    to the row-tiled kernels (ops/pallas_egnn_tiled.py) automatically."""
    from geoldm_tpu.nn.core import linear

    if bwd_mode is None:
        bwd_mode = os.environ.get("GEOLDM_PALLAS_BWD", "pallas")

    n = h.shape[1]
    if group is None and dispatch_to_tiled(n, cfg.hidden_nf, compute_dtype,
                                           bwd_mode):
        from geoldm_tpu.ops.pallas_egnn_tiled import egnn_apply_pallas_tiled

        return egnn_apply_pallas_tiled(
            params, cfg, h, x, node_mask, compute_dtype, interpret,
            bwd_mode=bwd_mode,
        )

    x0 = x
    h = linear(params["embedding"], h, compute_dtype)
    if cfg.n_layers > 0:

        def body(carry, block_p):
            h, x = carry
            h, x = fused_block_apply(
                cfg, block_p, h, x, x0, node_mask, compute_dtype, interpret,
                group, bwd_mode,
            )
            return (h, x), None

        (h, x), _ = jax.lax.scan(body, (h, x), params["blocks"])
    h = linear(params["embedding_out"], h, compute_dtype)
    h = h * node_mask
    return h, x

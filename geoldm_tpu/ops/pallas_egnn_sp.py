"""Sequence-parallel Pallas stages: row-tiled EGNN kernels inside an SP slab.

parallel/sp.py shards the EGNN's atom (row) dimension over a mesh ``seq``
axis; each device owns a [B, S] slab of rows (S = pad_n / sp). Without
these kernels the slab math runs as plain XLA, which materializes the
slab's [B, S, N, H] edge activations in HBM between fusions — exactly the
traffic the row-tiled kernels (ops/pallas_egnn_tiled.py) eliminate on one
chip. This module composes the two: the SAME stage math (_gcl_rows_math /
_coord_rows_math) executes as a Pallas kernel over the LOCAL slab, tiled
to fit VMEM, while shard_map's all-gathers move only the [B, N, H] node
tensors between chips.

Differences from the single-chip row-tiled kernels:

- each device's rows live at a device-dependent GLOBAL row offset
  (``axis_index('seq') * S``), which the diagonal edge mask needs; Pallas
  kernels cannot capture traced values, so the offset rides in as a
  scalar SMEM operand added to ``program_id * tile`` in-kernel;
- the full-column views and the row views are DIFFERENT arrays (the
  gathered [B, N, *] vs the local [B, S, *] slab), so the backward
  returns their gradients separately: full-view grads flow back through
  shard_map's all_gather (which transposes to psum_scatter), row-view
  grads stay local. The single-chip kernels sum the two because there
  both views alias one array.

Each stage (one GCL or one coordinate update) is an independent
``jax.custom_vjp`` whose backward recomputes the stage in VMEM and
differentiates it with an in-kernel ``jax.vjp`` — the same recipe as
``_make_rows_bwd_kernel``. The enclosing train-step jit must pass
``utils.tpuflags.grad_compiler_options()`` (the standard fused-backward
contract).

The reference has no analogue (single-GPU edge lists, SURVEY §5.7); the
composed semantics match nn/egnn.egnn_apply exactly — forward, gradients,
and the full train step (tests/test_sp_pallas.py, interpret mode on the
virtual CPU mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geoldm_tpu.config import EGNNConfig
from geoldm_tpu.ops.pallas_egnn_tiled import (
    _COORD_KEYS,
    _GCL_KEYS,
    _accum_flat,
    _accum_rows,
    _coord_rows_math,
    _gcl_rows_math,
)
from geoldm_tpu.utils.tpuflags import (
    LIBTPU_DEFAULT_SCOPED_VMEM_KIB,
    RAISED_SCOPED_VMEM_KIB,
)

Array = jax.Array


def _stage_props(cfg: EGNNConfig, kind: str):
    """(weight keys, slab math fn, output feature width) for a stage."""
    if kind == "gcl":
        keys = tuple(
            k for k in _GCL_KEYS if cfg.attention or k not in ("wa", "ba")
        )
        return keys, _gcl_rows_math, cfg.hidden_nf
    assert kind == "coord", kind
    return tuple(_COORD_KEYS), _coord_rows_math, 3


def sp_stage_tiles(s: int, n: int, hidden: int) -> tuple:
    """(forward, backward) row-tile sizes for an S-row slab against N
    columns: the largest multiple-of-8 divisor of S whose [T, N] pair slab
    fits the stage's VMEM budget. Forward budgets ~4 live f32 slab buffers
    against libtpu's default scoped limit; the backward's in-kernel vjp
    holds ~4x that and runs under the RAISED limit (same budgets as
    _auto_tile/_auto_tile_bwd, constrained to divisors of S).

    S must be a multiple of 8 (egnn_apply_sp pads N to 8*sp before
    splitting, so production slabs always are): the stage grid covers
    S // tile tiles, and a non-divisor tile would leave the last
    ``S % tile`` rows of every slab UNCOMPUTED — silent garbage on
    hardware. Found on a real chip via NaN-fill in interpret mode when a
    direct caller passed an unpadded s=92 slab (92 has no multiple-of-8
    divisor, so the old fallback tile of 8 dropped rows 88-91)."""
    if s % 8 != 0:
        raise ValueError(
            f"sp_stage_tiles: slab rows S={s} must be a multiple of 8 — "
            "pad the row slab first (egnn_apply_sp pads N to 8*sp); a "
            f"non-divisor tile would silently skip the last {s % 8} rows")

    def pick(budget_rows: int) -> int:
        best = None
        for t in range(8, min(256, s) + 1, 8):
            if s % t == 0 and t * n <= budget_rows:
                best = t
        if best is None:
            # No LARGE multiple-of-8 divisor tile fits the scoped-VMEM
            # budget; 8 always divides an 8-aligned S, so the floor tile
            # is exact. Fail loudly at trace time if even that exceeds
            # the budget (the round-3 pad-64 Mosaic scope-OOM class).
            fallback = 8
            if fallback * n > budget_rows:
                raise ValueError(
                    f"sp_stage_tiles: smallest tile ({fallback}x{n} pair "
                    f"rows) exceeds the scoped-VMEM row budget "
                    f"({budget_rows}); shrink the SP slab (raise sp), pad "
                    f"N lower, or reduce hidden_nf={hidden}")
            best = fallback
        return best

    fwd = pick(LIBTPU_DEFAULT_SCOPED_VMEM_KIB * 1024 // (hidden * 4 * 4))
    bwd = pick(RAISED_SCOPED_VMEM_KIB * 1024 // (hidden * 4 * 16))
    return fwd, bwd


def _sp_specs(n: int, tile: int):
    """BlockSpec builders: gathered full-column view (constant over the
    row-tile grid axis), local row-slab tile view, VMEM-resident weight,
    and the SMEM scalar row offset."""

    def full_spec(feat):
        return pl.BlockSpec((1, n, feat), lambda mb, it: (mb, 0, 0),
                            memory_space=pltpu.VMEM)

    def tile_spec(feat):
        return pl.BlockSpec((1, tile, feat), lambda mb, it: (mb, it, 0),
                            memory_space=pltpu.VMEM)

    def weight_spec(w):
        return pl.BlockSpec(w.shape, lambda mb, it: (0,) * w.ndim,
                            memory_space=pltpu.VMEM)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return full_spec, tile_spec, weight_spec, smem


def _make_sp_fwd_kernel(cfg, n, tile, compute_dtype, keys, math_fn, mean_div):
    def kernel(*refs):
        r0_ref = refs[0]
        full = tuple(r[0] for r in refs[1:5])
        rows = tuple(r[0] for r in refs[5:9])
        ws = {k: r[:] for k, r in zip(keys, refs[9:-1])}
        out_ref = refs[-1]
        r0 = r0_ref[0] + pl.program_id(1) * tile  # GLOBAL row offset
        out_ref[0] = math_fn(cfg, n, tile, r0, compute_dtype, ws,
                             full, rows, mean_div)

    return kernel


def _make_sp_bwd_kernel(cfg, n, tile, compute_dtype, keys, math_fn, mean_div):
    nw = len(keys)

    def kernel(*refs):
        r0_ref = refs[0]
        full = tuple(r[0] for r in refs[1:5])
        rows = tuple(r[0] for r in refs[5:9])
        g_ref = refs[9]
        ws = [r[:] for r in refs[10:10 + nw]]
        outs = refs[10 + nw:]
        dh_f_ref, dx_f_ref, dx0_f_ref = outs[:3]
        dh_r_ref, dx_r_ref, dx0_r_ref = outs[3:6]
        dw_refs = outs[6:]

        h, x, x0, mask = full
        hi, xi, x0i, mi = rows
        it = pl.program_id(1)
        r0 = r0_ref[0] + it * tile

        def f(ws_, h_, x_, x0_, hi_, xi_, x0i_):
            wd = dict(zip(keys, ws_))
            return math_fn(cfg, n, tile, r0, compute_dtype, wd,
                           (h_, x_, x0_, mask), (hi_, xi_, x0i_, mi),
                           mean_div)

        _, vjp_fn = jax.vjp(f, tuple(ws), h, x, x0, hi, xi, x0i)
        dws, dh, dx, dx0, dhi, dxi, dx0i = vjp_fn(g_ref[0])
        # Full-view grads accumulate over this molecule's row tiles (the
        # constant-index output block stays resident); row-view grads are
        # tile-local.
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


def _sp_stage_fwd_impl(cfg, kind, n, tiles, compute_dtype, interpret,
                       mean_div, weights, full, rows, r0_base):
    t = tiles[0]
    b, s, _ = rows[0].shape
    if s % t != 0:
        raise ValueError(
            f"sp_stage_apply: forward tile {t} does not divide the slab "
            f"rows S={s}; the grid would skip the last {s % t} rows "
            "(silent garbage on hardware). Use sp_stage_tiles on an "
            "8-aligned slab.")
    hidden = full[0].shape[-1]
    keys, math_fn, out_feat = _stage_props(cfg, kind)
    wlist = [weights[k] for k in keys]
    full_spec, tile_spec, weight_spec, smem = _sp_specs(n, t)
    feats = (hidden, 3, 3, 1)
    kernel = _make_sp_fwd_kernel(cfg, n, t, compute_dtype, keys, math_fn,
                                 mean_div)
    out_dtype = rows[0].dtype if kind == "gcl" else rows[1].dtype
    return pl.pallas_call(
        kernel,
        grid=(b, s // t),
        in_specs=[
            smem,
            *[full_spec(f) for f in feats],
            *[tile_spec(f) for f in feats],
            *[weight_spec(w) for w in wlist],
        ],
        out_specs=pl.BlockSpec((1, t, out_feat), lambda mb, it: (mb, it, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, out_feat), out_dtype),
        interpret=interpret,
    )(r0_base, *full, *rows, *wlist)


def _sp_stage_bwd_impl(cfg, kind, n, tiles, compute_dtype, interpret,
                       mean_div, weights, full, rows, r0_base, g):
    t = tiles[1]
    b, s, _ = rows[0].shape
    if s % t != 0:
        raise ValueError(
            f"sp_stage_apply: backward tile {t} does not divide the slab "
            f"rows S={s}; the grid would skip the last {s % t} rows "
            "(silent garbage on hardware). Use sp_stage_tiles on an "
            "8-aligned slab.")
    hidden = full[0].shape[-1]
    keys, math_fn, out_feat = _stage_props(cfg, kind)
    wlist = [weights[k] for k in keys]
    full_spec, tile_spec, weight_spec, smem = _sp_specs(n, t)
    feats = (hidden, 3, 3, 1)
    kernel = _make_sp_bwd_kernel(cfg, n, t, compute_dtype, keys, math_fn,
                                 mean_div)
    outs = pl.pallas_call(
        kernel,
        grid=(b, s // t),
        in_specs=[
            smem,
            *[full_spec(f) for f in feats],
            *[tile_spec(f) for f in feats],
            tile_spec(out_feat),
            *[weight_spec(w) for w in wlist],
        ],
        out_specs=[
            full_spec(hidden), full_spec(3), full_spec(3),
            tile_spec(hidden), tile_spec(3), tile_spec(3),
            *[weight_spec(w) for w in wlist],
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, hidden), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, s, hidden), jnp.float32),
            jax.ShapeDtypeStruct((b, s, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, s, 3), jnp.float32),
            *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wlist],
        ],
        interpret=interpret,
    )(r0_base, *full, *rows, g, *wlist)
    d_full = (outs[0], outs[1], outs[2])
    d_rows = (outs[3], outs[4], outs[5])
    dws = dict(zip(keys, outs[6:]))
    return dws, d_full, d_rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def sp_stage_apply(cfg: EGNNConfig, kind: str, n: int, tiles: tuple,
                   compute_dtype, interpret: bool, mean_div: int,
                   weights: dict, full: tuple, rows: tuple, r0_base: Array):
    """One SP stage (``kind`` 'gcl' or 'coord') on a local row slab.

    ``full`` / ``rows`` are (h, x, x0, node_mask) tuples — the gathered
    [B, N, *] columns and this device's [B, S, *] rows. ``r0_base`` is the
    slab's global row offset as a shape-(1,) int32 array. Returns the
    stage's updated rows ([B, S, H] or [B, S, 3]). Differentiable: the
    backward is the fused in-kernel vjp (see module docstring)."""
    return _sp_stage_fwd_impl(cfg, kind, n, tiles, compute_dtype, interpret,
                              mean_div, weights, full, rows, r0_base)


def _fwd(cfg, kind, n, tiles, compute_dtype, interpret, mean_div,
         weights, full, rows, r0_base):
    out = _sp_stage_fwd_impl(cfg, kind, n, tiles, compute_dtype, interpret,
                             mean_div, weights, full, rows, r0_base)
    return out, (weights, full, rows, r0_base)


def _bwd(cfg, kind, n, tiles, compute_dtype, interpret, mean_div,
         residuals, g):
    weights, full, rows, r0_base = residuals
    dws, d_full, d_rows = _sp_stage_bwd_impl(
        cfg, kind, n, tiles, compute_dtype, interpret, mean_div,
        weights, full, rows, r0_base, g,
    )
    d_full = (*d_full, jnp.zeros_like(full[3]))
    d_rows = (*d_rows, jnp.zeros_like(rows[3]))
    # Integer input: the cotangent type for int32 is float0.
    d_r0 = np.zeros(r0_base.shape, dtype=jax.dtypes.float0)
    return dws, d_full, d_rows, d_r0


sp_stage_apply.defvjp(_fwd, _bwd)

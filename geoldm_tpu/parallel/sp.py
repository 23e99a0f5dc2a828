"""Sequence parallelism: shard the EGNN's O(N^2) edge grid over a mesh axis.

The reference has no analogue (its largest "sequence" is 181 atoms —
SURVEY §5.7 designates this the TPU-native extension for molecules whose
pair grid outgrows one chip). Each device owns a contiguous slab of ROWS of
the atom dimension; per stage it all-gathers the (small) [B, N, H] node
features and [B, N, 3] coordinates over the ``seq`` axis and computes only
its own rows' edges — the [B, N, N, H] edge activations are never
materialized on any single device, and the per-block communication is two
tiled all-gathers (O(B*N*H)) against O(B*N^2*H^2/seq) compute.

The per-row-slab math is shared with the row-tiled Pallas kernels
(ops/pallas_egnn_tiled._gcl_rows_math / _coord_rows_math): the same
decomposition that tiles VMEM on one chip shards the grid across chips —
here executed as plain XLA inside ``shard_map``, with the slab offset
taken from ``jax.lax.axis_index``.

Semantics match nn.egnn.egnn_apply exactly (tested against the
single-device path on the virtual CPU mesh), INCLUDING gradients: the
``shard_map`` body is differentiable end-to-end (the tiled ``all_gather``
transposes to ``psum_scatter``), so the same sharded forward backs SP
training (tests/test_sp.py grad + train-step parity).

The ``shard_map`` is *partial-manual*: only the ``seq`` axis is manual
(``axis_names={SEQ_AXIS}``); any other mesh axes (``data``) stay in GSPMD
auto mode, so SP composes with the batch-sharded data-parallel train step
on a (data, seq) mesh without replicating the batch.

``use_pallas=True`` additionally runs each slab's stage math as the
row-tiled Pallas kernels (ops/pallas_egnn_sp.py) instead of plain XLA —
the single-chip fused-kernel training win applied inside each SP shard.
That path uses a FULLY-manual shard_map over (data, seq): a pallas_call
is an opaque custom call GSPMD cannot partition, so the batch axis must
already be local when the kernel launches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from geoldm_tpu.config import EGNNConfig
from geoldm_tpu.ops.pallas_egnn_tiled import (
    _coord_rows_math,
    _coord_weight_dict,
    _gcl_rows_math,
    _gcl_weight_dict,
)

SEQ_AXIS = "seq"


def make_sp_mesh(dp: int = 1, sp: int = 0, devices=None) -> Mesh:
    """A (data, seq) mesh for batch x atom-dimension sharding."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if sp <= 0:
        assert n % dp == 0, f"{n} devices not divisible by dp={dp}"
        sp = n // dp
    assert dp * sp <= n, f"mesh {dp}x{sp} needs more than {n} devices"
    from geoldm_tpu.parallel.sharding import DATA_AXIS

    mesh_devices = np.asarray(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(mesh_devices, (DATA_AXIS, SEQ_AXIS))


def _block_rows(cfg, block_params, h_rows, x_rows, x0_rows, mask_rows,
                x0_full, mask_full, compute_dtype, n, tile, axis, mean_div):
    """One EquivariantBlock on this device's row slab (inside shard_map).

    ``x0_full``/``mask_full`` are block-invariant and gathered ONCE by the
    caller (XLA does not CSE collectives across scan iterations)."""
    r0 = jax.lax.axis_index(axis) * tile

    def gather(a):
        return jax.lax.all_gather(a, axis, axis=1, tiled=True)

    x_full = gather(x_rows)

    def over_batch(fn, h_full, h_r):
        # The slab math is unbatched ([N, ...] x [T, ...]); vmap over B.
        return jax.vmap(fn)(h_full, x_full, x0_full, mask_full,
                            h_r, x_rows, x0_rows, mask_rows)

    for gcl in block_params["gcls"]:
        gw, keys = _gcl_weight_dict(cfg, gcl)
        h_full = gather(h_rows)

        def gcl_fn(hf, xf, x0f, mf, hr, xr, x0r, mr, gw=gw):
            return _gcl_rows_math(cfg, n, tile, r0, compute_dtype, gw,
                                  (hf, xf, x0f, mf), (hr, xr, x0r, mr),
                                  mean_div)

        h_rows = over_batch(gcl_fn, h_full, h_rows)

    cw = _coord_weight_dict(block_params)
    h_full = gather(h_rows)

    def coord_fn(hf, xf, x0f, mf, hr, xr, x0r, mr):
        return _coord_rows_math(cfg, n, tile, r0, compute_dtype, cw,
                                (hf, xf, x0f, mf), (hr, xr, x0r, mr),
                                mean_div)

    x_rows = over_batch(coord_fn, h_full, h_rows)
    return h_rows, x_rows


def _block_rows_pallas(cfg, block_params, h_rows, x_rows, x0_rows, mask_rows,
                       x0_full, mask_full, compute_dtype, n, r0_base, tiles,
                       mean_div, interpret):
    """One EquivariantBlock on this device's row slab via the row-tiled
    Pallas stage kernels (ops/pallas_egnn_sp.py). Mirrors _block_rows —
    the gathers are identical; only the slab math execution differs."""
    from geoldm_tpu.ops.pallas_egnn_sp import sp_stage_apply

    def gather(a):
        return jax.lax.all_gather(a, SEQ_AXIS, axis=1, tiled=True)

    x_full = gather(x_rows)
    for gcl in block_params["gcls"]:
        gw, _ = _gcl_weight_dict(cfg, gcl)
        h_full = gather(h_rows)
        h_rows = sp_stage_apply(
            cfg, "gcl", n, tiles, compute_dtype, interpret, mean_div,
            gw, (h_full, x_full, x0_full, mask_full),
            (h_rows, x_rows, x0_rows, mask_rows), r0_base,
        )

    cw = _coord_weight_dict(block_params)
    h_full = gather(h_rows)
    x_rows = sp_stage_apply(
        cfg, "coord", n, tiles, compute_dtype, interpret, mean_div,
        cw, (h_full, x_full, x0_full, mask_full),
        (h_rows, x_rows, x0_rows, mask_rows), r0_base,
    )
    return h_rows, x_rows


def egnn_apply_sp(
    params: dict,
    cfg: EGNNConfig,
    h,
    x,
    node_mask,
    mesh: Mesh,
    compute_dtype=None,
    use_pallas: bool = False,
    interpret: bool = False,
):
    """Full EGNN forward with the atom (row) dimension sharded over the
    mesh's ``seq`` axis. Same contract as nn.egnn.egnn_apply (the edge
    mask is derived from the node mask). N is padded to a multiple of the
    seq-axis size internally. ``use_pallas`` executes each slab's math as
    the row-tiled fused kernels (``interpret`` for CPU meshes)."""
    from functools import partial

    from geoldm_tpu.nn.core import linear

    shard_map = jax.shard_map

    sp = mesh.shape[SEQ_AXIS]
    b, n, _ = h.shape
    # Pallas slabs tile rows in multiples of 8; plain XLA slabs only need
    # equal split.
    unit = 8 * sp if use_pallas else sp
    pad_n = -(-n // unit) * unit
    pad = pad_n - n
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        node_mask = jnp.pad(node_mask, ((0, 0), (0, pad), (0, 0)))
    tile = pad_n // sp

    h = linear(params["embedding"], h, compute_dtype)
    x0 = x

    if use_pallas:
        from geoldm_tpu.ops.pallas_egnn_sp import sp_stage_tiles
        from geoldm_tpu.parallel.sharding import DATA_AXIS

        dp = mesh.shape[DATA_AXIS]
        assert b % dp == 0, (
            f"SP+pallas needs batch {b} divisible by the data axis {dp} "
            "(the pallas_call is opaque to GSPMD, so the batch must be "
            "manually sharded)"
        )
        tiles = sp_stage_tiles(tile, pad_n, cfg.hidden_nf)
        rows_spec = P(DATA_AXIS, SEQ_AXIS, None)

        @partial(
            shard_map, mesh=mesh,
            in_specs=(P(), rows_spec, rows_spec, rows_spec, rows_spec),
            out_specs=(rows_spec, rows_spec),
            # pallas_call's out_shape carries no varying-manual-axes
            # annotation, which check_vma would demand of every value in
            # the body; the shard_map is fully manual over both axes, so
            # the check adds nothing here.
            check_vma=False,
        )
        def run_blocks_pallas(blocks, h_rows, x_rows, x0_rows, mask_rows):
            r0_base = (jax.lax.axis_index(SEQ_AXIS) * tile).astype(
                jnp.int32)[None]
            x0_full = jax.lax.all_gather(x0_rows, SEQ_AXIS, axis=1, tiled=True)
            mask_full = jax.lax.all_gather(mask_rows, SEQ_AXIS, axis=1,
                                           tiled=True)

            def body(carry, block_p):
                h_r, x_r = carry
                h_r, x_r = _block_rows_pallas(
                    cfg, block_p, h_r, x_r, x0_rows, mask_rows,
                    x0_full, mask_full, compute_dtype, pad_n, r0_base,
                    tiles, n, interpret,
                )
                return (h_r, x_r), None

            (h_r, x_r), _ = jax.lax.scan(body, (h_rows, x_rows), blocks)
            return h_r, x_r

        run_blocks = run_blocks_pallas
    else:
        spec = P(None, SEQ_AXIS, None)

        @partial(
            shard_map, mesh=mesh,
            in_specs=(P(), spec, spec, spec, spec),
            out_specs=(spec, spec),
            axis_names=frozenset({SEQ_AXIS}),
            check_vma=True,
        )
        def run_blocks(blocks, h_rows, x_rows, x0_rows, mask_rows):
            x0_full = jax.lax.all_gather(x0_rows, SEQ_AXIS, axis=1, tiled=True)
            mask_full = jax.lax.all_gather(mask_rows, SEQ_AXIS, axis=1,
                                           tiled=True)

            def body(carry, block_p):
                h_r, x_r = carry
                h_r, x_r = _block_rows(
                    cfg, block_p, h_r, x_r, x0_rows, mask_rows,
                    x0_full, mask_full, compute_dtype, pad_n, tile, SEQ_AXIS,
                    n,
                )
                return (h_r, x_r), None

            (h_r, x_r), _ = jax.lax.scan(body, (h_rows, x_rows), blocks)
            return h_r, x_r

    if cfg.n_layers > 0:
        h, x = run_blocks(params["blocks"], h, x, x0, node_mask)
    h = linear(params["embedding_out"], h, compute_dtype)
    h = h * node_mask
    if pad:
        h = h[:, :n]
        x = x[:, :n]
    return h, x

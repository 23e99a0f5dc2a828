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


def egnn_apply_sp(
    params: dict,
    cfg: EGNNConfig,
    h,
    x,
    node_mask,
    mesh: Mesh,
    compute_dtype=None,
):
    """Full EGNN forward with the atom (row) dimension sharded over the
    mesh's ``seq`` axis. Same contract as nn.egnn.egnn_apply (the edge
    mask is derived from the node mask). N is padded to a multiple of the
    seq-axis size internally."""
    from functools import partial

    from geoldm_tpu.nn.core import linear

    shard_map = jax.shard_map

    sp = mesh.shape[SEQ_AXIS]
    b, n, _ = h.shape
    pad_n = -(-n // sp) * sp
    pad = pad_n - n
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        node_mask = jnp.pad(node_mask, ((0, 0), (0, pad), (0, 0)))
    tile = pad_n // sp

    h = linear(params["embedding"], h, compute_dtype)
    x0 = x

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
        mask_full = jax.lax.all_gather(mask_rows, SEQ_AXIS, axis=1, tiled=True)

        def body(carry, block_p):
            h_r, x_r = carry
            h_r, x_r = _block_rows(
                cfg, block_p, h_r, x_r, x0_rows, mask_rows,
                x0_full, mask_full, compute_dtype, pad_n, tile, SEQ_AXIS, n,
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

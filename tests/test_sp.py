"""Sequence parallelism (atom-dimension sharding): the shard_map EGNN
matches the single-device dense path on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoldm_tpu.config import EGNNConfig
from geoldm_tpu.nn.egnn import egnn_apply, egnn_init
from geoldm_tpu.ops.distance import build_edge_mask
from geoldm_tpu.parallel.sp import egnn_apply_sp, make_sp_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def cfg_of(**kw):
    base = dict(
        in_node_nf=6, out_node_nf=6, hidden_nf=32, n_layers=2, inv_sublayers=1,
        attention=True, tanh=True, coords_range=15.0, norm_constant=1.0,
        sin_embedding=False, normalization_factor=100.0, aggregation_method="sum",
    )
    base.update(kw)
    return EGNNConfig(**base)


def make_inputs(key, b=2, n=16, in_nf=6, n_real=(11, 16)):
    kh, kx = jax.random.split(key)
    node_mask = np.zeros((b, n, 1), dtype=np.float32)
    for i, k in enumerate(n_real):
        node_mask[i, :k] = 1.0
    node_mask = jnp.asarray(node_mask)
    h = jax.random.normal(kh, (b, n, in_nf)) * node_mask
    x = jax.random.normal(kx, (b, n, 3)) * node_mask
    return h, x, node_mask


@pytest.mark.parametrize(
    "sp,n,agg",
    [(8, 16, "sum"), (4, 16, "sum"), (8, 20, "sum"), (8, 20, "mean")],
)
def test_sp_matches_single_device(sp, n, agg):
    # n=20 with sp=8 exercises the internal pad-to-24 path; the 'mean' case
    # guards the aggregation divisor (caller's N, not the internal pad).
    cfg = cfg_of(
        aggregation_method=agg,
        normalization_factor=1.0 if agg == "mean" else 100.0,
    )
    params = egnn_init(jax.random.key(0), cfg)
    h, x, node_mask = make_inputs(jax.random.key(1), n=n, n_real=(n - 5, n))
    edge_mask = build_edge_mask(node_mask)
    mesh = make_sp_mesh(dp=1, sp=sp)

    h_ref, x_ref = egnn_apply(params, cfg, h, x, node_mask, edge_mask)
    h_sp, x_sp = egnn_apply_sp(params, cfg, h, x, node_mask, mesh)
    np.testing.assert_allclose(np.asarray(h_sp), np.asarray(h_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(x_sp), np.asarray(x_ref), atol=2e-5)


def test_sp_sin_embedding_multi_sublayer():
    cfg = cfg_of(sin_embedding=True, inv_sublayers=2, n_layers=1)
    params = egnn_init(jax.random.key(2), cfg)
    h, x, node_mask = make_inputs(jax.random.key(3))
    edge_mask = build_edge_mask(node_mask)
    mesh = make_sp_mesh(dp=1, sp=8)

    h_ref, x_ref = egnn_apply(params, cfg, h, x, node_mask, edge_mask)
    h_sp, x_sp = egnn_apply_sp(params, cfg, h, x, node_mask, mesh)
    np.testing.assert_allclose(np.asarray(h_sp), np.asarray(h_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(x_sp), np.asarray(x_ref), atol=2e-5)

"""Sequence parallelism (atom-dimension sharding): the shard_map EGNN
matches the single-device dense path on the virtual CPU mesh — forward,
GRADIENTS, and the full latent-diffusion train step on a DPxSP mesh."""

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


@pytest.mark.slow
def test_sp_grad_matches_single_device():
    """Backward through shard_map/all_gather: param grads of a quadratic
    loss match the dense single-device path (the tiled all_gather
    transposes to psum_scatter — nothing custom, but this is the
    capability SP training rests on)."""
    cfg = cfg_of()
    params = egnn_init(jax.random.key(0), cfg)
    h, x, node_mask = make_inputs(jax.random.key(1))
    edge_mask = build_edge_mask(node_mask)
    mesh = make_sp_mesh(dp=1, sp=8)

    def loss_sp(p):
        hh, xx = egnn_apply_sp(p, cfg, h, x, node_mask, mesh)
        return jnp.sum(hh**2) + jnp.sum(xx**2)

    def loss_ref(p):
        hh, xx = egnn_apply(p, cfg, h, x, node_mask, edge_mask)
        return jnp.sum(hh**2) + jnp.sum(xx**2)

    g_sp = jax.grad(loss_sp)(params)
    g_ref = jax.grad(loss_ref)(params)
    rel = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-8)),
        g_sp, g_ref,
    )
    assert max(jax.tree.leaves(rel)) < 1e-4


def test_sp_grad_composes_with_dp():
    """On a (data=4, seq=2) mesh with the batch sharded over ``data``,
    forward and grads still match single-device, and the output keeps the
    batch sharding (the shard_map is partial-manual: seq only)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = cfg_of()
    params = egnn_init(jax.random.key(0), cfg)
    h, x, node_mask = make_inputs(jax.random.key(1), b=8, n_real=(11,) * 4 + (16,) * 4)
    edge_mask = build_edge_mask(node_mask)
    mesh = make_sp_mesh(dp=4, sp=2)
    bsh = NamedSharding(mesh, P("data"))
    hd, xd, md = (jax.device_put(a, bsh) for a in (h, x, node_mask))

    @jax.jit
    def fwd_and_grad(p, h, x, m):
        def loss(p):
            hh, xx = egnn_apply_sp(p, cfg, h, x, m, mesh)
            return jnp.sum(hh**2) + jnp.sum(xx**2), (hh, xx)

        (l, (hh, xx)), g = jax.value_and_grad(loss, has_aux=True)(p)
        return hh, xx, g

    hh, xx, g = fwd_and_grad(params, hd, xd, md)
    h_ref, x_ref = egnn_apply(params, cfg, h, x, node_mask, edge_mask)
    np.testing.assert_allclose(np.asarray(hh), np.asarray(h_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(xx), np.asarray(x_ref), atol=2e-5)
    assert hh.sharding.spec[0] == "data", hh.sharding

    def loss_ref(p):
        a, b = egnn_apply(p, cfg, h, x, node_mask, edge_mask)
        return jnp.sum(a**2) + jnp.sum(b**2)

    g_ref = jax.grad(loss_ref)(params)
    rel = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-8)),
        g, g_ref,
    )
    assert max(jax.tree.leaves(rel)) < 1e-4


@pytest.mark.slow
def test_sp_train_step_matches_single_device():
    """Full latent-diffusion train step (trainable_ae) on a DPxSP mesh via
    the ``sp`` compute spec == the single-device step: same loss, same
    updated params to f32 tolerance. This is SP *training*, not a forward
    demo."""
    from geoldm_tpu.config import TrainConfig
    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.data.synthetic import synthetic_batch
    from geoldm_tpu.models import factory
    from geoldm_tpu.models.distributions import DistributionNodes
    from geoldm_tpu.nn.core import sp_spec
    from geoldm_tpu.parallel import sharding as shd
    from geoldm_tpu.train.train_step import create_train_state, make_train_step

    info = get_dataset_info("qm9")
    cfg = factory.make_latent_diffusion_config(
        info, nf=32, n_layers=2, latent_nf=1, diffusion_steps=24,
        trainable_ae=True,
    )
    tc = TrainConfig(lr=1e-3, ema_decay=0.999)
    state, tx = create_train_state(jax.random.key(0), cfg, tc)

    batch_np = synthetic_batch(info, 8, pad_nodes=12, rng=np.random.default_rng(0))
    nd = DistributionNodes(info.n_nodes)
    batch_np["log_pN"] = nd.log_prob(batch_np.pop("n_atoms")).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    step_ref = jax.jit(make_train_step(cfg, tc, tx))
    s_ref, m_ref = step_ref(state, batch, jax.random.key(1))

    mesh = make_sp_mesh(dp=4, sp=2)
    batch_sh = shd.shard_batch(batch, mesh)
    p_sh = shd.param_shardings(state.params, mesh)
    state_sh = state._replace(
        params=jax.device_put(state.params, p_sh),
        ema_params=jax.device_put(state.ema_params, p_sh),
    )
    step_sp = jax.jit(make_train_step(cfg, tc, tx, compute_dtype=sp_spec(mesh)))
    s_sp, m_sp = step_sp(state_sh, batch_sh, jax.random.key(1))

    np.testing.assert_allclose(
        float(m_sp["loss"]), float(m_ref["loss"]), rtol=1e-5
    )
    err = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), s_sp.params, s_ref.params
    )
    assert max(jax.tree.leaves(err)) < 1e-5

    # Two more SP steps keep the loss finite (optimizer + EMA carry through).
    s2, m2 = step_sp(s_sp, batch_sh, jax.random.key(2))
    assert np.isfinite(float(m2["loss"]))


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

"""SP x Pallas composition: the row-tiled fused kernels executing inside
each sequence-parallel slab (ops/pallas_egnn_sp.py via
parallel/sp.egnn_apply_sp(use_pallas=True)) match the single-device dense
path on the virtual CPU mesh — forward, GRADIENTS (through the fused
in-kernel vjp AND shard_map's all_gather transpose), DPxSP composition,
and the full latent-diffusion train step."""

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


def sp_pallas(params, cfg, h, x, m, mesh):
    return egnn_apply_sp(params, cfg, h, x, m, mesh,
                         use_pallas=True, interpret=True)


@pytest.mark.parametrize(
    "sp,n,agg",
    [(2, 16, "sum"), (4, 16, "sum"), (2, 20, "sum"), (2, 20, "mean")],
)
def test_sp_pallas_matches_single_device(sp, n, agg):
    # n=20 exercises the internal pad-to-8*sp path (pad 32 at sp=2: the
    # masked tail rows must stay inert); 'mean' guards the aggregation
    # divisor (caller's N, not the internal pad).
    cfg = cfg_of(
        aggregation_method=agg,
        normalization_factor=1.0 if agg == "mean" else 100.0,
    )
    params = egnn_init(jax.random.key(0), cfg)
    h, x, node_mask = make_inputs(jax.random.key(1), n=n, n_real=(n - 5, n))
    edge_mask = build_edge_mask(node_mask)
    mesh = make_sp_mesh(dp=1, sp=sp)

    h_ref, x_ref = egnn_apply(params, cfg, h, x, node_mask, edge_mask)
    h_sp, x_sp = sp_pallas(params, cfg, h, x, node_mask, mesh)
    np.testing.assert_allclose(np.asarray(h_sp), np.asarray(h_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(x_sp), np.asarray(x_ref), atol=2e-5)


def test_sp_pallas_row_offset_is_global():
    """Device > 0's slab must mask ITS diagonal, not row 0's: with sp=4
    each device owns a 8-row slab at a different global offset, and a
    wrong offset leaves self-edges live (h changes by the self-message).
    Exercised implicitly by the parity tests; this pins the seam where a
    constant-zero offset would silently pass on sp=1."""
    cfg = cfg_of(n_layers=1)
    params = egnn_init(jax.random.key(0), cfg)
    h, x, node_mask = make_inputs(jax.random.key(1), n=32, n_real=(30, 32))
    edge_mask = build_edge_mask(node_mask)
    h_ref, x_ref = egnn_apply(params, cfg, h, x, node_mask, edge_mask)
    h_sp, x_sp = sp_pallas(params, cfg, h, x, node_mask,
                           make_sp_mesh(dp=1, sp=4))
    np.testing.assert_allclose(np.asarray(h_sp), np.asarray(h_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(x_sp), np.asarray(x_ref), atol=2e-5)


@pytest.mark.slow
def test_sp_pallas_grad_matches_single_device():
    """Backward through the fused in-kernel vjp + all_gather transpose:
    param grads of a quadratic loss match the dense single-device path."""
    cfg = cfg_of()
    params = egnn_init(jax.random.key(0), cfg)
    h, x, node_mask = make_inputs(jax.random.key(1))
    edge_mask = build_edge_mask(node_mask)
    mesh = make_sp_mesh(dp=1, sp=2)

    def loss_sp(p):
        hh, xx = sp_pallas(p, cfg, h, x, node_mask, mesh)
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


def test_sp_pallas_grad_composes_with_dp():
    """On a (data=4, seq=2) mesh the fully-manual shard_map shards the
    batch too (pallas_call is opaque to GSPMD): forward and grads still
    match single-device and the output keeps the batch sharding."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = cfg_of()
    params = egnn_init(jax.random.key(0), cfg)
    h, x, node_mask = make_inputs(jax.random.key(1), b=8,
                                  n_real=(11,) * 4 + (16,) * 4)
    edge_mask = build_edge_mask(node_mask)
    mesh = make_sp_mesh(dp=4, sp=2)
    bsh = NamedSharding(mesh, P("data"))
    hd, xd, md = (jax.device_put(a, bsh) for a in (h, x, node_mask))

    @jax.jit
    def fwd_and_grad(p, h, x, m):
        def loss(p):
            hh, xx = sp_pallas(p, cfg, h, x, m, mesh)
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


def test_sp_pallas_multi_sublayer_sin_embedding():
    cfg = cfg_of(sin_embedding=True, inv_sublayers=2, n_layers=1)
    params = egnn_init(jax.random.key(2), cfg)
    h, x, node_mask = make_inputs(jax.random.key(3))
    edge_mask = build_edge_mask(node_mask)
    mesh = make_sp_mesh(dp=1, sp=2)

    h_ref, x_ref = egnn_apply(params, cfg, h, x, node_mask, edge_mask)
    h_sp, x_sp = sp_pallas(params, cfg, h, x, node_mask, mesh)
    np.testing.assert_allclose(np.asarray(h_sp), np.asarray(h_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(x_sp), np.asarray(x_ref), atol=2e-5)


@pytest.mark.slow
def test_sp_pallas_train_step_matches_single_device():
    """Full latent-diffusion train step (trainable_ae) on a DPxSP mesh with
    the slab math in the fused Pallas kernels == the single-device step:
    same loss, same updated params to f32 tolerance."""
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
    spec = sp_spec(mesh, pallas=True, interpret=True)
    step_sp = jax.jit(make_train_step(cfg, tc, tx, compute_dtype=spec))
    s_sp, m_sp = step_sp(state_sh, batch_sh, jax.random.key(1))

    np.testing.assert_allclose(
        float(m_sp["loss"]), float(m_ref["loss"]), rtol=1e-5
    )
    err = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), s_sp.params, s_ref.params
    )
    assert max(jax.tree.leaves(err)) < 1e-5


def test_sp_stage_tiles_rejects_unaligned_slab():
    """Regression for the silent-row-skip bug found on hardware: a slab
    whose row count has no multiple-of-8 divisor (92 = 4*23) used to get
    a non-divisor fallback tile of 8, and the (b, s // t) grid then never
    computed the last s % t rows — garbage on a real chip, NaN-fill in
    interpret mode. Non-8-aligned slabs must be rejected at trace time
    (egnn_apply_sp always pads to 8*sp, so production never hits this)."""
    from geoldm_tpu.ops.pallas_egnn_sp import sp_stage_tiles

    with pytest.raises(ValueError, match="multiple of 8"):
        sp_stage_tiles(92, 184, 128)
    # 8-aligned slabs always tile exactly (8 divides them), including ones
    # with no larger multiple-of-8 divisor (88 = 8 * 11).
    for s in (96, 88, 8):
        fwd, bwd = sp_stage_tiles(s, 192, 128)
        assert s % fwd == 0 and s % bwd == 0


def test_sp_stage_apply_rejects_non_divisor_tile():
    from geoldm_tpu.ops.pallas_egnn_sp import sp_stage_apply
    from geoldm_tpu.ops.pallas_egnn_tiled import _gcl_weight_dict

    cfg = EGNNConfig(
        in_node_nf=4, out_node_nf=4, hidden_nf=16, n_layers=1,
        inv_sublayers=1, attention=False, tanh=True, coords_range=15.0,
        norm_constant=1.0, sin_embedding=False, normalization_factor=100.0,
        aggregation_method="sum",
    )
    params = egnn_init(jax.random.key(0), cfg)
    block = jax.tree.map(lambda a: a[0], params["blocks"])
    weights, _ = _gcl_weight_dict(cfg, block["gcls"][0])
    b, n, s, r0 = 1, 24, 12, 0
    mask = jnp.ones((b, n, 1), jnp.float32)
    h = jnp.zeros((b, n, 16))
    x = jnp.zeros((b, n, 3))
    full = (h, x, x, mask)
    rows = tuple(a[:, r0:r0 + s] for a in full)
    with pytest.raises(ValueError, match="does not divide"):
        sp_stage_apply(cfg, "gcl", n, (8, 8), None, True, 0,
                       weights, full, rows, jnp.asarray([r0], jnp.int32))

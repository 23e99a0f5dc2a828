"""Batch-sharded sampling on the virtual device mesh: the sampler compiles
and executes under SPMD with outputs identical to single-device execution
(same RNG keys => same samples)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from geoldm_tpu.data.datasets_config import get_dataset_info
from geoldm_tpu.models import factory
from geoldm_tpu.ops.distance import build_edge_mask
from geoldm_tpu.parallel import sharding as shd

INFO = get_dataset_info("qm9")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_sampling_matches_single_device():
    cfg = factory.make_latent_diffusion_config(
        INFO, nf=16, n_layers=1, latent_nf=1, diffusion_steps=6
    )
    params = factory.init_params(jax.random.key(0), cfg)
    sample_fn = factory.model_sample_fn(cfg)

    b, n = 8, 6
    node_mask = jnp.ones((b, n, 1))
    edge_mask = build_edge_mask(node_mask)
    key = jax.random.key(7)

    x_ref, hc_ref, hi_ref = jax.jit(sample_fn)(params, key, node_mask, edge_mask)

    mesh = shd.make_mesh(dp=8, tp=1)
    params_sh = shd.shard_params(params, mesh)
    node_mask_sh = jax.device_put(node_mask, shd.batch_sharding(mesh))
    edge_mask_sh = jax.device_put(edge_mask, shd.batch_sharding(mesh))
    x_sh, hc_sh, hi_sh = jax.jit(sample_fn)(params_sh, key, node_mask_sh, edge_mask_sh)

    np.testing.assert_allclose(np.asarray(x_ref), np.asarray(x_sh), atol=1e-4)
    np.testing.assert_allclose(np.asarray(hc_ref), np.asarray(hc_sh), atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_bucketed_sampling_with_mesh():
    """sample_bucketed fans out over the data mesh and matches shapes."""
    import numpy as np

    from geoldm_tpu.train import sampling as S

    cfg = factory.make_latent_diffusion_config(
        INFO, nf=16, n_layers=1, latent_nf=1, diffusion_steps=6
    )
    params = factory.init_params(jax.random.key(0), cfg)
    mesh = shd.make_mesh(dp=8, tp=1)
    nodesxsample = np.array([5, 9, 7, 12, 4, 8, 10, 6] * 2)
    one_hot, charges, x, node_mask = S.sample_bucketed(
        cfg, params, jax.random.key(1), INFO, nodesxsample, batch_size=8,
        buckets=(16, 32), mesh=mesh,
    )
    assert x.shape[0] == 16
    np.testing.assert_array_equal(node_mask[..., 0].sum(1), nodesxsample)


def test_bucketed_fewstep_sampling_with_mesh():
    """The strided few-step samplers (ddim + dpm2m) compile and run under
    GSPMD batch sharding on the virtual mesh."""
    import numpy as np

    from geoldm_tpu.train import sampling as S

    cfg = factory.make_latent_diffusion_config(
        INFO, nf=16, n_layers=1, latent_nf=1, diffusion_steps=6
    )
    params = factory.init_params(jax.random.key(0), cfg)
    mesh = shd.make_mesh(dp=8, tp=1)
    nodesxsample = np.array([5, 9, 7, 12, 4, 8, 10, 6])
    for method in ("ddim", "dpm2m"):
        one_hot, charges, x, node_mask = S.sample_bucketed(
            cfg, params, jax.random.key(1), INFO, nodesxsample, batch_size=8,
            buckets=(16, 32), mesh=mesh, n_steps=3,
            eta=0.0 if method == "dpm2m" else 1.0, method=method,
        )
        assert np.all(np.isfinite(x))
        np.testing.assert_array_equal(node_mask[..., 0].sum(1), nodesxsample)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_uneven_batch_pads_to_mesh_multiple():
    """B=12 on an 8-device mesh stays sharded (padded to 16, trimmed back)
    instead of silently dropping to single-device; results match the
    first 12 rows of the padded sharded run."""
    from geoldm_tpu.train import sampling as S

    cfg = factory.make_latent_diffusion_config(
        INFO, nf=16, n_layers=1, latent_nf=1, diffusion_steps=6
    )
    params = factory.init_params(jax.random.key(0), cfg)
    mesh = shd.make_mesh(dp=8, tp=1)
    sizes12 = np.array([5, 9, 7, 12, 4, 8, 10, 6, 11, 3, 9, 7])
    one_hot, charges, x, node_mask = S.sample(
        cfg, params, jax.random.key(3), INFO, sizes12, pad_nodes=16, mesh=mesh
    )
    assert x.shape[0] == 12
    np.testing.assert_array_equal(node_mask[..., 0].sum(1), sizes12)

    # Same key, explicitly padded to 16 with the last size repeated — the
    # first 12 rows must be bit-identical (proves the sharded path ran and
    # the trim is exactly the pad inverse).
    sizes16 = np.concatenate([sizes12, np.repeat(sizes12[-1:], 4)])
    _, _, x16, _ = S.sample(
        cfg, params, jax.random.key(3), INFO, sizes16, pad_nodes=16, mesh=mesh
    )
    np.testing.assert_allclose(x, x16[:12], atol=1e-5)

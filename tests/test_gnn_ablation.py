"""GNN-dynamics ablation mode end-to-end (reference --model gnn_dynamics)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

pytestmark = pytest.mark.slow

from geoldm_tpu.data.datasets_config import get_dataset_info
from geoldm_tpu.diffusion import vdm
from geoldm_tpu.models import factory
from geoldm_tpu.ops.distance import build_edge_mask

INFO = get_dataset_info("qm9")


def test_gnn_dynamics_loss_and_sample():
    cfg = factory.make_diffusion_model_config(
        INFO, nf=16, n_layers=2, diffusion_steps=6, model="gnn_dynamics"
    )
    params = factory.init_params(jax.random.key(0), cfg)
    b, n = 2, 7
    node_mask = jnp.ones((b, n, 1))
    edge_mask = build_edge_mask(node_mask)
    x = jax.random.normal(jax.random.key(1), (b, n, 3))
    x = x - x.mean(axis=1, keepdims=True)
    h_cat = jax.nn.one_hot(jax.random.randint(jax.random.key(2), (b, n), 0, 5), 5)
    h_int = jnp.ones((b, n, 1))

    nll = vdm.vdm_nll(
        params, cfg.diffusion, cfg.dynamics, jax.random.key(3), x, h_cat, h_int,
        node_mask, edge_mask, training=True,
    )
    assert np.all(np.isfinite(np.asarray(nll)))

    xs, hc, hi = vdm.vdm_sample(
        params, cfg.diffusion, cfg.dynamics, jax.random.key(4), node_mask, edge_mask
    )
    assert np.all(np.isfinite(np.asarray(xs)))
    np.testing.assert_allclose(np.asarray(xs).sum(axis=1), 0.0, atol=1e-4)

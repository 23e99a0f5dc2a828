"""Regression tests pinning the whole-molecule vs row-tiled kernel dispatch.

The round-3 GEOM bucketed-train scope-OOM was a dispatch bug found by
measurement: padded N=64 (4096 pair rows) fits the whole-molecule FORWARD
budget exactly, but the fused backward's ~17KB/row live set overflows the
raised 64MB scoped-VMEM limit there, killing the training compile inside
Mosaic's stack allocator. These tests pin, for every loader/sampler bucket
size, which kernel ``egnn_apply_pallas`` routes to under the default
budgets — so a refactor of the budget math can't silently reintroduce a
scope-OOM at exactly one bucket size — and exercise the boundary size
through the dispatcher (forward + grad, interpret mode) end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoldm_tpu.data.geom import DEFAULT_BUCKETS as GEOM_TRAIN_BUCKETS
from geoldm_tpu.nn.egnn import EGNNConfig, egnn_init
from geoldm_tpu.ops import pallas_egnn, pallas_egnn_tiled
from geoldm_tpu.ops.pallas_egnn import dispatch_to_tiled
from geoldm_tpu.train.sampling import GEOM_SAMPLE_BUCKETS

# Every static shape the GEOM loader or sampler can hand the kernels, plus
# the QM9 sampling/training pads. Expected routing at hidden=256 (flagship
# nf), f32, default fused-pallas backward:
#   forward budget: 4096 pair rows;  backward budget: ~3662 rows
#   (RAISED_SCOPED_VMEM_KIB * 0.95 / 17KB) — the SMALLER of the two.
EXPECTED_PALLAS_BWD = {
    16: False, 24: False, 32: False, 48: False,   # whole-molecule kernel
    64: True,                                     # the round-3 OOM bucket
    80: True, 96: True, 104: True, 128: True, 136: True, 184: True,
}


def test_bucket_tables_are_covered():
    covered = set(EXPECTED_PALLAS_BWD)
    assert set(GEOM_TRAIN_BUCKETS) <= covered
    assert set(GEOM_SAMPLE_BUCKETS) <= covered
    assert {16, 24, 32} <= covered  # QM9 sampling buckets / train pad


@pytest.mark.parametrize("pad", sorted(EXPECTED_PALLAS_BWD))
def test_dispatch_decision_per_bucket(pad):
    want_tiled = EXPECTED_PALLAS_BWD[pad]
    assert dispatch_to_tiled(pad, 256, None, "pallas") is want_tiled
    # bf16 edge buffers halve the forward row cost but the BACKWARD budget
    # (f32 residuals) still governs — routing must not loosen.
    assert dispatch_to_tiled(pad, 256, jnp.bfloat16, "pallas") is want_tiled


def test_boundary_n64_is_backward_driven():
    """Padded 64 = 4096 rows: fits the forward budget exactly, overflows
    the fused-backward budget — the exact round-3 failure. With the
    XLA-remat backward (no in-kernel live set) the whole-molecule forward
    is allowed again."""
    assert dispatch_to_tiled(64, 256, None, "pallas") is True
    assert dispatch_to_tiled(64, 256, None, "xla") is False
    # Unaligned N just below: relayout copies halve both budgets.
    assert dispatch_to_tiled(60, 256, None, "xla") is True


def test_budget_scales_down_with_hidden():
    # hidden > 256 scales the calibrated budgets down; 48^2=2304 rows fit
    # at 256 but not at 1024 (budget/4 ~ 915).
    assert dispatch_to_tiled(48, 256, None, "pallas") is False
    assert dispatch_to_tiled(48, 1024, None, "pallas") is True


def _count_tiled_calls(monkeypatch):
    calls = {"n": 0}
    real = pallas_egnn_tiled.egnn_apply_pallas_tiled

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(pallas_egnn_tiled, "egnn_apply_pallas_tiled", spy)
    return calls


@pytest.mark.parametrize("pad,want_tiled", [(32, False), (64, True)])
def test_dispatcher_routes_and_differentiates(pad, want_tiled, monkeypatch):
    """End-to-end through egnn_apply_pallas at the boundary: the routed
    path executes (interpret mode) and its gradient is finite. hidden<=256
    keeps the calibrated budgets, so routing matches the flagship table."""
    calls = _count_tiled_calls(monkeypatch)
    cfg = EGNNConfig(in_node_nf=4, hidden_nf=32, out_node_nf=4, n_layers=1)
    params = egnn_init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(1, pad, 4)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, pad, 3)), jnp.float32)
    mask = jnp.ones((1, pad, 1), jnp.float32)

    assert dispatch_to_tiled(pad, cfg.hidden_nf, None, "pallas") is want_tiled

    def loss(p):
        h_out, x_out = pallas_egnn.egnn_apply_pallas(
            p, cfg, h, x, mask, interpret=True
        )
        return jnp.sum(h_out**2) + jnp.sum(x_out**2)

    val, grads = jax.value_and_grad(loss)(params)
    assert calls["n"] == (1 if want_tiled else 0)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)

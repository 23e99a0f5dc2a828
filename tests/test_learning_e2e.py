"""End-to-end learning tests.

Trains a small diffusion model on exact molecular geometries and checks that
generated-sample stability climbs well above chance. A ~30s fast version
runs in the default tier; the 1200-step version (plus the bf16 check) is in
the slow tier. The full-strength version lives in scripts/learning_demo.py
(TPU: 83.5% atom stability after 3000 steps, 99.3% after 10000).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geoldm_tpu.config import TrainConfig
from geoldm_tpu.data.collate import collate_molecules
from geoldm_tpu.data.datasets_config import get_dataset_info
from geoldm_tpu.evalsuite.analyze import analyze_stability_for_molecules
from geoldm_tpu.models import factory
from geoldm_tpu.train import sampling as S
from geoldm_tpu.train.train_step import create_train_state, make_train_step

INFO = get_dataset_info("qm9")


def _methane():
    t = 1.087 / np.sqrt(3.0)
    pos = np.array(
        [[0, 0, 0], [t, t, t], [t, -t, -t], [-t, t, -t], [-t, -t, t]], np.float32
    )
    return pos, [1, 0, 0, 0, 0], [6, 1, 1, 1, 1]


@pytest.mark.slow
def test_learns_methane_geometry():
    rng = np.random.default_rng(0)
    pos0, types, charges = _methane()

    def make_batch(bs):
        positions, ohs, chs = [], [], []
        for _ in range(bs):
            q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
            p = pos0 @ q.astype(np.float32)
            p = p + rng.standard_normal(p.shape).astype(np.float32) * 0.01
            positions.append(p)
            ohs.append(np.eye(5, dtype=np.float32)[types])
            chs.append(np.array(charges, np.float32))
        return collate_molecules(positions, ohs, chs, pad_nodes=8)

    cfg = factory.make_diffusion_model_config(
        INFO, nf=48, n_layers=3, diffusion_steps=50, loss_type="l2"
    )
    tc = TrainConfig(lr=5e-4, ema_decay=0.995)
    state, tx = create_train_state(jax.random.key(0), cfg, tc)
    step = jax.jit(make_train_step(cfg, tc, tx))

    for i in range(1200):
        b = make_batch(96)
        batch = {k: jnp.asarray(v) for k, v in b.items() if k != "n_atoms"}
        batch["log_pN"] = jnp.zeros((96,), jnp.float32)
        state, m = step(state, batch, jax.random.key(1000 + i))

    sizes = np.full(100, 5)
    oh, ch, x, nm = S.sample(
        cfg, state.ema_params, jax.random.key(7), INFO, sizes, pad_nodes=8
    )
    v, _ = analyze_stability_for_molecules(
        {"x": x, "one_hot": oh, "node_mask": nm[..., 0]}, INFO, use_rdkit=False
    )
    print("learned stability:", v)
    assert v["atm_stable"] > 0.4  # far above the ~0 random baseline


def test_learns_methane_geometry_fast():
    """Default-tier learning check (~30s on a 1-CPU host): 300 steps on
    rotated methane must lift sampled atom stability an order of magnitude
    above the untrained baseline (~0.01)."""
    rng = np.random.default_rng(0)
    pos0, types, charges = _methane()

    def make_batch(bs):
        positions, ohs, chs = [], [], []
        for _ in range(bs):
            q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
            p = pos0 @ q.astype(np.float32)
            p = p + rng.standard_normal(p.shape).astype(np.float32) * 0.01
            positions.append(p)
            ohs.append(np.eye(5, dtype=np.float32)[types])
            chs.append(np.array(charges, np.float32))
        return collate_molecules(positions, ohs, chs, pad_nodes=8)

    cfg = factory.make_diffusion_model_config(
        INFO, nf=32, n_layers=2, diffusion_steps=50, loss_type="l2"
    )
    tc = TrainConfig(lr=1e-3, ema_decay=0.99)
    state, tx = create_train_state(jax.random.key(0), cfg, tc)
    step = jax.jit(make_train_step(cfg, tc, tx))

    for i in range(300):
        b = make_batch(32)
        batch = {k: jnp.asarray(v) for k, v in b.items() if k != "n_atoms"}
        batch["log_pN"] = jnp.zeros((32,), jnp.float32)
        state, m = step(state, batch, jax.random.key(1000 + i))
    assert float(m["loss"]) < 0.15

    oh, ch, x, nm = S.sample(
        cfg, state.ema_params, jax.random.key(7), INFO, np.full(80, 5), pad_nodes=8
    )
    v, _ = analyze_stability_for_molecules(
        {"x": x, "one_hot": oh, "node_mask": nm[..., 0]}, INFO, use_rdkit=False
    )
    assert v["atm_stable"] > 0.15, v

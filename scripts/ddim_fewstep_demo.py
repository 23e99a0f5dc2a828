"""Few-step sampling quality demonstration for the strided DDIM sampler.

Trains the learning-demo diffusion model (methane/water/ammonia templates,
T=100) and then samples 300 molecules at a sweep of reverse-step counts
n_steps in {T, T/2, T/5, T/10, T/20} x eta in {1.0, 0.0}, reporting atom/
molecule stability and per-sweep wall time. The dense n_steps=T row is the
reference protocol; everything below it is the beyond-reference capability
this demo quantifies: how much quality K-step sampling retains while doing
K/T of the denoiser work.

Run: python scripts/ddim_fewstep_demo.py
Env: GEOLDM_DEMO_STEPS (default 3000) training steps;
     GEOLDM_DEMO_T (default 100) diffusion steps;
     GEOLDM_DEMO_NF / GEOLDM_DEMO_LAYERS (default 64 / 4) denoiser width;
     GEOLDM_DEMO_BS (default 128) batch size.
The one-notch-up configuration (round-3 verdict: PARITY_TRAIN-class
denoiser) is GEOLDM_DEMO_T=500 GEOLDM_DEMO_LAYERS=9 GEOLDM_DEMO_BS=64
GEOLDM_DEMO_STEPS=1200.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geoldm_tpu.utils.jaxcache import setup_compilation_cache

setup_compilation_cache()

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
rng = np.random.default_rng(0)


def methane():
    t = 1.087 / np.sqrt(3.0)
    pos = np.array([[0, 0, 0], [t, t, t], [t, -t, -t], [-t, t, -t], [-t, -t, t]],
                   np.float32)
    return pos, [1, 0, 0, 0, 0], [6, 1, 1, 1, 1]


def water():
    a = np.deg2rad(104.5)
    d = 0.958
    pos = np.array([[0, 0, 0], [d, 0, 0], [d * np.cos(a), d * np.sin(a), 0]],
                   np.float32)
    return pos, [3, 0, 0], [8, 1, 1]


def ammonia():
    d = 1.012
    z = d * np.cos(np.deg2rad(68))
    r = d * np.sin(np.deg2rad(68))
    pos = [[0, 0, 0]]
    for k in range(3):
        th = 2 * np.pi * k / 3
        pos.append([r * np.cos(th), r * np.sin(th), z])
    return np.array(pos, np.float32), [2, 0, 0, 0], [7, 1, 1, 1]


TEMPLATES = [methane(), water(), ammonia()]


def make_batch(bs):
    positions, ohs, chs = [], [], []
    for _ in range(bs):
        pos, types, charges = TEMPLATES[rng.integers(len(TEMPLATES))]
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        p = (pos @ q.astype(np.float32))
        p = p + rng.standard_normal(pos.shape).astype(np.float32) * 0.01
        positions.append(p)
        ohs.append(np.eye(5, dtype=np.float32)[types])
        chs.append(np.array(charges, np.float32))
    return collate_molecules(positions, ohs, chs, pad_nodes=8)


T = int(os.environ.get("GEOLDM_DEMO_T", "100"))
NF = int(os.environ.get("GEOLDM_DEMO_NF", "64"))
LAYERS = int(os.environ.get("GEOLDM_DEMO_LAYERS", "4"))
BS = int(os.environ.get("GEOLDM_DEMO_BS", "128"))
cfg = factory.make_diffusion_model_config(
    INFO, nf=NF, n_layers=LAYERS, diffusion_steps=T, noise_precision=1e-5,
    loss_type="l2",
)
tc = TrainConfig(lr=5e-4, ema_decay=0.999, clip_grad=True)
state, tx = create_train_state(jax.random.key(0), cfg, tc)
step = jax.jit(make_train_step(cfg, tc, tx))


def prep(b):
    d = {k: jnp.asarray(v) for k, v in b.items() if k != "n_atoms"}
    d["log_pN"] = jnp.zeros((b["x"].shape[0],), jnp.float32)
    return d


t0 = time.time()
STEPS = int(os.environ.get("GEOLDM_DEMO_STEPS", "3000"))
for i in range(STEPS):
    state, m = step(state, prep(make_batch(BS)), jax.random.key(10000 + i))
    if i % 500 == 0 or i == STEPS - 1:
        print(f"step {i}: loss {float(m['loss']):.4f} ({time.time() - t0:.0f}s)",
              flush=True)

sizes = np.array([5, 3, 4] * 100)  # 300 molecules of template sizes
print(f"\n{'n_steps':>8} {'method':>8} {'eta':>4} {'atom_stab':>10} "
      f"{'mol_stab':>9} {'time_s':>7}")
sweep = [T, T // 2, T // 5, T // 10, T // 20]
if T >= 200:
    sweep.append(T // 50)  # reach the K~10 regime on long schedules too
for n_steps in sweep:
    if n_steps == T:
        cases = [("ddim", 1.0)]
    else:
        cases = [("ddim", 1.0), ("ddim", 0.0), ("dpm2m", 0.0)]
    for method, eta in cases:
        t0 = time.time()
        oh, ch, x, nm = S.sample(
            cfg, state.ema_params, jax.random.key(7), INFO, sizes, pad_nodes=8,
            n_steps=None if n_steps == T else n_steps, eta=eta, method=method,
        )
        dt = time.time() - t0
        v, _ = analyze_stability_for_molecules(
            {"x": x, "one_hot": oh, "node_mask": nm[..., 0]}, INFO,
            use_rdkit=False,
        )
        print(f"{n_steps:>8} {method:>8} {eta:>4.1f} {v['atm_stable']:>10.3f} "
              f"{v['mol_stable']:>9.3f} {dt:>7.1f}", flush=True)

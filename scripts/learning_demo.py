"""End-to-end learning validation: train a small diffusion model on exact
small-molecule geometries (methane/water/ammonia with random rotations and
tiny jitter); stability of generated samples should climb from ~0%, and all
compute modes should match f32 quality on the trained weights.

Measured on a TPU v5e:
  3000 steps (~90s):    sampled stability atom 83.5% / molecule 51.7%
  10000 steps (~5min):  sampled stability atom 99.3% / molecule 99.3% —
                        IDENTICAL across f32 XLA, bfloat16_mixed,
                        bfloat16_full and the fused pallas backend.

Run: python scripts/learning_demo.py
Env:  GEOLDM_DEMO_STEPS (default 10000)
      GEOLDM_DEMO_TRAIN_DTYPE float32|pallas|bfloat16 (default float32) —
      "pallas" trains with the fused forward+backward kernels (validated
      on v5e: same stability trajectory as f32)
"""
import os, time, numpy as np, jax, jax.numpy as jnp
from geoldm_tpu.config import TrainConfig
from geoldm_tpu.data.datasets_config import get_dataset_info
from geoldm_tpu.data.collate import collate_molecules
from geoldm_tpu.models import factory
from geoldm_tpu.models.distributions import DistributionNodes
from geoldm_tpu.train.train_step import create_train_state, make_train_step
from geoldm_tpu.train import sampling as S
from geoldm_tpu.evalsuite.analyze import analyze_stability_for_molecules

INFO = get_dataset_info("qm9")
rng = np.random.default_rng(0)

def methane():
    t = 1.087 / np.sqrt(3.0)
    pos = np.array([[0,0,0],[t,t,t],[t,-t,-t],[-t,t,-t],[-t,-t,t]], np.float32)
    return pos, [1,0,0,0,0], [6,1,1,1,1]   # C H H H H
def water():
    a = np.deg2rad(104.5); d = 0.958
    pos = np.array([[0,0,0],[d,0,0],[d*np.cos(a), d*np.sin(a),0]], np.float32)
    return pos, [3,0,0], [8,1,1]
def ammonia():
    d=1.012; a=np.deg2rad(106.7)
    # trigonal pyramid
    z = d*np.cos(np.deg2rad(68)); r = d*np.sin(np.deg2rad(68))
    pos=[[0,0,0]]
    for k in range(3):
        th = 2*np.pi*k/3
        pos.append([r*np.cos(th), r*np.sin(th), z])
    return np.array(pos, np.float32), [2,0,0,0], [7,1,1,1]

TEMPLATES = [methane(), water(), ammonia()]
# sanity: all stable under the bond tables
mols = {"x": [], "one_hot": [], "node_mask": []}
for pos, types, charges in TEMPLATES:
    n=len(types); oh=np.eye(5,dtype=np.float32)[types]
    p=np.zeros((1,8,3),np.float32); p[0,:n]=pos - pos.mean(0)
    o=np.zeros((1,8,5),np.float32); o[0,:n]=oh
    m=np.zeros((1,8),np.float32); m[0,:n]=1
    mols["x"].append(p); mols["one_hot"].append(o); mols["node_mask"].append(m)
mols={k:np.concatenate(v) for k,v in mols.items()}
v,_ = analyze_stability_for_molecules(mols, INFO, use_rdkit=False)
print("template stability:", v)

def make_batch(bs):
    positions, ohs, chs = [], [], []
    for _ in range(bs):
        pos, types, charges = TEMPLATES[rng.integers(len(TEMPLATES))]
        # random rotation + small jitter
        q,_ = np.linalg.qr(rng.standard_normal((3,3)))
        p = (pos @ q.astype(np.float32)) + rng.standard_normal(pos.shape).astype(np.float32)*0.01
        positions.append(p); ohs.append(np.eye(5,dtype=np.float32)[types]); chs.append(np.array(charges,np.float32))
    b = collate_molecules(positions, ohs, chs, pad_nodes=8)
    return b

cfg = factory.make_diffusion_model_config(INFO, nf=64, n_layers=4, diffusion_steps=100,
    noise_precision=1e-5, loss_type="l2")
train_dtype = os.environ.get("GEOLDM_DEMO_TRAIN_DTYPE", "float32")
tc = TrainConfig(lr=5e-4, ema_decay=0.999, clip_grad=True, compute_dtype=train_dtype)
state, tx = create_train_state(jax.random.key(0), cfg, tc)
from geoldm_tpu.nn.core import resolve_compute
from geoldm_tpu.utils.tpuflags import train_step_compiler_options
spec = resolve_compute(None if train_dtype == "float32" else train_dtype)
step = jax.jit(make_train_step(cfg, tc, tx, spec),
               compiler_options=train_step_compiler_options(train_dtype))
print(f"training dtype: {train_dtype}")

# log p(N): uniform over our sizes; use zeros (constant offset, irrelevant to training)
def prep(b):
    d = {k: jnp.asarray(v) for k, v in b.items() if k != "n_atoms"}
    d["log_pN"] = jnp.zeros((b["x"].shape[0],), jnp.float32)
    return d

t0=time.time()
STEPS=int(os.environ.get("GEOLDM_DEMO_STEPS", "10000"))
for i in range(STEPS):
    b = prep(make_batch(128))
    state, m = step(state, b, jax.random.key(10000+i))
    if i % 500 == 0 or i == STEPS-1:
        print(f"step {i}: loss {float(m['loss']):.4f} ({time.time()-t0:.0f}s)")

# Sample + stability with EMA params, both precisions.
sizes = np.array([5,3,4]*100)  # 300 molecules of template sizes
for dt in [None, "bfloat16_mixed", "bfloat16_full", "pallas"]:
    oh, ch, x, nm = S.sample(cfg, state.ema_params, jax.random.key(7), INFO,
                             sizes, pad_nodes=8, compute_dtype=dt)
    v,_ = analyze_stability_for_molecules(
        {"x":x, "one_hot":oh, "node_mask":nm[...,0]}, INFO, use_rdkit=False)
    print(f"sampling dtype={dt}: {v}")

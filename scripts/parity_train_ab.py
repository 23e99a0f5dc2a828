"""Matched A/B training: geoldm-tpu (JAX) vs the PyTorch reference.

Both frameworks train the SAME model (EnVariationalDiffusion, nf=32,
2 layers, T=100, polynomial_2, l2) from the SAME initial weights
(torch init transferred to JAX), on the SAME pre-generated batch sequence
(exact methane/water/ammonia geometries with random rotations), with the
SAME optimizer (AdamW amsgrad, wd=1e-12 — reference qm9/models.py:169-175).
Only the per-step diffusion randomness (t draw, eps draw) differs, each
side using its own RNG — so the loss trajectories are two samples of the
same stochastic process and must overlap statistically, and the sampled
stability curves must climb together.

Writes PARITY_TRAIN.md with both curves.

Run: python scripts/parity_train_ab.py [--steps 600] [--out PARITY_TRAIN.md]
(CPU-only by design: the reference is CPU torch; pin JAX_PLATFORMS=cpu for
an apples-to-apples host run.)
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)
if REFERENCE not in sys.path:
    sys.path.append(REFERENCE)

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
import torch  # noqa: E402

from egnn.models import EGNN_dynamics_QM9  # noqa: E402
from equivariant_diffusion.en_diffusion import EnVariationalDiffusion  # noqa: E402

from geoldm_tpu.data.collate import collate_molecules  # noqa: E402
from geoldm_tpu.data.datasets_config import get_dataset_info  # noqa: E402
from geoldm_tpu.diffusion import vdm  # noqa: E402
from geoldm_tpu.evalsuite.analyze import analyze_stability_for_molecules  # noqa: E402
from geoldm_tpu.models import factory  # noqa: E402
from geoldm_tpu.train import optim as optim_mod  # noqa: E402
from geoldm_tpu.ops.distance import build_edge_mask  # noqa: E402

sys.path.insert(0, os.path.join(REPO, "tests"))
from parity_utils import dynamics_params_from_torch  # noqa: E402

INFO = get_dataset_info("qm9")
NF, LAYERS, T_DIFF = 32, 2, 100
BS, PAD = 32, 8
LR = 5e-4


# --- exact template molecules (same as scripts/learning_demo.py) -----------

def methane():
    t = 1.087 / np.sqrt(3.0)
    pos = np.array([[0, 0, 0], [t, t, t], [t, -t, -t], [-t, t, -t], [-t, -t, t]], np.float32)
    return pos, [1, 0, 0, 0, 0], [6, 1, 1, 1, 1]


def water():
    a = np.deg2rad(104.5)
    d = 0.958
    pos = np.array([[0, 0, 0], [d, 0, 0], [d * np.cos(a), d * np.sin(a), 0]], np.float32)
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


def make_batch(rng, bs=BS):
    positions, ohs, chs = [], [], []
    for _ in range(bs):
        pos, types, charges = TEMPLATES[rng.integers(len(TEMPLATES))]
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        p = (pos @ q.astype(np.float32)) + rng.standard_normal(pos.shape).astype(np.float32) * 0.01
        p = p - p.mean(0)
        positions.append(p)
        ohs.append(np.eye(5, dtype=np.float32)[types])
        chs.append(np.array(charges, np.float32))
    return collate_molecules(positions, ohs, chs, pad_nodes=PAD)


def _stability(one_hot, x, node_mask):
    mols = {"one_hot": one_hot, "x": x, "node_mask": node_mask}
    v, _ = analyze_stability_for_molecules(mols, INFO, use_rdkit=False)
    return v


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--eval_every", type=int, default=150)
    ap.add_argument("--n_eval", type=int, default=30, help="molecules per size")
    ap.add_argument("--out", type=str, default=os.path.join(REPO, "PARITY_TRAIN.md"))
    args = ap.parse_args(argv)

    torch.manual_seed(0)
    # --- build the torch reference model; transfer its init to JAX ---------
    in_node_nf = 6
    dyn_t = EGNN_dynamics_QM9(
        in_node_nf=in_node_nf + 1, context_node_nf=0, n_dims=3, hidden_nf=NF,
        n_layers=LAYERS, attention=True, tanh=True, norm_constant=1.0,
        inv_sublayers=1, sin_embedding=False, normalization_factor=1.0,
        aggregation_method="sum", condition_time=True,
    )
    ref = EnVariationalDiffusion(
        dynamics=dyn_t, in_node_nf=in_node_nf, n_dims=3, timesteps=T_DIFF,
        noise_schedule="polynomial_2", noise_precision=1e-5, loss_type="l2",
        norm_values=(1.0, 4.0, 10.0), include_charges=True,
    )
    cfg = factory.make_diffusion_model_config(
        INFO, nf=NF, n_layers=LAYERS, diffusion_steps=T_DIFF,
        normalization_factor=1.0,
    )
    params = {"dynamics": dynamics_params_from_torch(dyn_t, LAYERS, 1, True)}

    opt_t = torch.optim.AdamW(ref.parameters(), lr=LR, amsgrad=True, weight_decay=1e-12)
    tx = optax.chain(
        # torch-semantics AMSGrad (the trainer's transform): optax's
        # variant maxes bias-corrected nu and under-steps early training
        # (see train/optim.scale_by_amsgrad_torch docstring).
        optim_mod.scale_by_amsgrad_torch(),
        optax.add_decayed_weights(1e-12),
        optax.scale(-LR),
    )
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, key, x, h_cat, h_int, node_mask, edge_mask):
        def loss_fn(p):
            return vdm.vdm_nll(
                p, cfg.diffusion, cfg.dynamics, key, x, h_cat, h_int,
                node_mask, edge_mask, training=True,
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sample_j = jax.jit(
        lambda p, key, nm, em: vdm.vdm_sample(
            p, cfg.diffusion, cfg.dynamics, key, nm, em, None
        )
    )

    # --- pre-generate the shared batch sequence ----------------------------
    rng = np.random.default_rng(7)
    batches = [make_batch(rng) for _ in range(args.steps)]

    loss_t_hist, loss_j_hist = [], []
    stab_rows = []
    sizes = np.array([5, 3, 4])

    def eval_stability(step):
        # torch sampling: one same-size batch per template size.
        oh_all, x_all, nm_all = [], [], []
        ref.eval()
        with torch.no_grad():
            for n in sizes:
                nm = torch.ones(args.n_eval, int(n), 1)
                em = (torch.ones(int(n), int(n)) - torch.eye(int(n))).repeat(
                    args.n_eval, 1, 1
                ).view(-1, 1)
                x_s, h_s = ref.sample(args.n_eval, int(n), nm, em, None)
                pad_x = np.zeros((args.n_eval, PAD, 3), np.float32)
                pad_oh = np.zeros((args.n_eval, PAD, 5), np.float32)
                pad_nm = np.zeros((args.n_eval, PAD), np.float32)
                pad_x[:, :n] = x_s.numpy()
                pad_oh[:, :n] = h_s["categorical"].numpy()
                pad_nm[:, :n] = 1.0
                oh_all.append(pad_oh)
                x_all.append(pad_x)
                nm_all.append(pad_nm)
        ref.train()
        v_t = _stability(
            np.concatenate(oh_all), np.concatenate(x_all), np.concatenate(nm_all)
        )

        # jax sampling (same sizes).
        oh_all, x_all, nm_all = [], [], []
        for i, n in enumerate(sizes):
            nm = jnp.ones((args.n_eval, int(n), 1))
            em = build_edge_mask(nm)
            x_s, h_cat_s, _ = sample_j(params, jax.random.key(1000 + step + i), nm, em)
            pad_x = np.zeros((args.n_eval, PAD, 3), np.float32)
            pad_oh = np.zeros((args.n_eval, PAD, 5), np.float32)
            pad_nm = np.zeros((args.n_eval, PAD), np.float32)
            pad_x[:, :n] = np.asarray(x_s)
            pad_oh[:, :n] = np.asarray(h_cat_s)
            pad_nm[:, :n] = 1.0
            oh_all.append(pad_oh)
            x_all.append(pad_x)
            nm_all.append(pad_nm)
        v_j = _stability(
            np.concatenate(oh_all), np.concatenate(x_all), np.concatenate(nm_all)
        )
        stab_rows.append((step, v_t["atm_stable"], v_j["atm_stable"],
                          v_t["mol_stable"], v_j["mol_stable"]))
        print(f"  step {step}: stability torch atm={v_t['atm_stable']:.3f} "
              f"jax atm={v_j['atm_stable']:.3f} | mol torch={v_t['mol_stable']:.3f} "
              f"jax={v_j['mol_stable']:.3f}")

    print(f"A/B training: {args.steps} steps, bs={BS}, nf={NF}, layers={LAYERS}, T={T_DIFF}")
    ref.train()
    t0 = time.time()
    torch_gen = torch.Generator().manual_seed(123)
    for i, b in enumerate(batches):
        x_np, oh_np, ch_np, nm_np = b["x"], b["h_cat"], b["h_int"], b["node_mask"]
        em_np = (nm_np[:, :, None, 0] * nm_np[:, None, :, 0]) * (
            1 - np.eye(PAD, dtype=np.float32)[None]
        )

        # torch step
        opt_t.zero_grad()
        nll = ref(
            torch.from_numpy(x_np),
            {"categorical": torch.from_numpy(oh_np), "integer": torch.from_numpy(ch_np)},
            torch.from_numpy(nm_np),
            torch.from_numpy(em_np.reshape(-1, 1)),
            None,
        ).mean()
        nll.backward()
        opt_t.step()
        loss_t_hist.append(float(nll.detach()))

        # jax step (same batch, own rng)
        params, opt_state, loss_j = train_step(
            params, opt_state, jax.random.key(i),
            jnp.asarray(x_np), jnp.asarray(oh_np), jnp.asarray(ch_np),
            jnp.asarray(nm_np), jnp.asarray(em_np[..., None]),
        )
        loss_j_hist.append(float(loss_j))

        if i % 50 == 0:
            print(f"step {i}: torch {loss_t_hist[-1]:.4f} jax {loss_j_hist[-1]:.4f} "
                  f"({time.time()-t0:.0f}s)")
        if (i + 1) % args.eval_every == 0 or i == args.steps - 1:
            eval_stability(i + 1)

    # --- report -------------------------------------------------------------
    lt = np.array(loss_t_hist)
    lj = np.array(loss_j_hist)

    def win_mean(a, k=50):
        return [float(a[s:s + k].mean()) for s in range(0, len(a), k)]

    wt, wj = win_mean(lt), win_mean(lj)
    lines = [
        "# PARITY_TRAIN — matched A/B training, reference (torch) vs geoldm-tpu (JAX)",
        "",
        f"Same model (VDM nf={NF}, {LAYERS} layers, T={T_DIFF}, polynomial_2, l2), same",
        "initial weights (torch init transferred), same AdamW(amsgrad, wd=1e-12,",
        f"lr={LR}), same {args.steps}-step batch sequence (methane/water/ammonia with",
        "random rotations). Per-step diffusion randomness (t, eps) independent per",
        "side — curves are two samples of the same stochastic process.",
        "",
        "Companion evidence: tests/test_grad_parity.py pins t/eps to identical",
        "values and shows d(loss)/d(params) parity leaf-by-leaf at f32 tolerance",
        "for the VDM (l2 + vlb), VAE, and LDM losses; tests/test_model_parity.py",
        "covers the forward losses. This file shows the *trajectories* agree.",
        "",
        "## Loss trajectory (mean over 50-step windows)",
        "",
        "| steps | torch loss | jax loss | ratio |",
        "|---|---|---|---|",
    ]
    for k, (a, b_) in enumerate(zip(wt, wj)):
        lines.append(f"| {k*50}-{k*50+49} | {a:.4f} | {b_:.4f} | {b_/a:.3f} |")
    lines += [
        "",
        "## Sampled stability (90 molecules: 30x methane/water/ammonia sizes)",
        "",
        "| step | torch atm_stable | jax atm_stable | torch mol_stable | jax mol_stable |",
        "|---|---|---|---|---|",
    ]
    for row in stab_rows:
        lines.append(
            f"| {row[0]} | {row[1]:.3f} | {row[2]:.3f} | {row[3]:.3f} | {row[4]:.3f} |"
        )
    lines += [
        "",
        f"Final-window loss: torch {wt[-1]:.4f} vs jax {wj[-1]:.4f} "
        f"(ratio {wj[-1]/wt[-1]:.3f}).",
        f"Wall-clock: {time.time()-t0:.0f}s total on "
        f"{jax.devices()[0].platform.upper()} (both sides on the same host CPU).",
        "",
        f"Reproduce: `JAX_PLATFORMS=cpu python scripts/parity_train_ab.py --steps {args.steps}`",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

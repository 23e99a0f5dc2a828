"""PARITY_TRAIN v2: flagship-shape LATENT-DIFFUSION A/B with seeds + CIs.

Round-2's A/B compared a small VDM (nf=32, 2 layers); this one trains the
actual flagship model *kind* — EnLatentDiffusion with trainable_ae (VAE
encoder + 9-layer decoder + 9-layer denoiser), latent_nf=1, T=500 — scaled
to this host's 1-core CPU budget via nf=64 and template molecules.

Protocol upgrades over v1 (addressing the round-2 verdict):
- >=2 seeds per side: each seed draws its own torch init (transferred to
  JAX, so a pair shares init) and both frameworks see the SAME batch
  sequence; per-step diffusion randomness stays independent per side.
  Between-seed spread within a framework is the yardstick for
  between-framework differences.
- Binomial 95% CIs (Wilson) on every stability number, with enough
  sampled molecules per checkpoint for the CI to be meaningful.
- The loss table reports per-seed windows AND the cross-framework ratio
  of seed-pooled means.

reference counterparts: en_diffusion.py:1057-1219 (EnLatentDiffusion),
README.md:24 (flagship QM9 recipe), eval protocol qm9/analyze.py.

Run: JAX_PLATFORMS=cpu python scripts/parity_train_ab_ldm.py
     [--steps 600] [--n_eval 510] [--seeds 0 1] [--out PARITY_TRAIN.md]
"""

import argparse
import json
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

from egnn.models import (  # noqa: E402
    EGNN_decoder_QM9,
    EGNN_dynamics_QM9,
    EGNN_encoder_QM9,
)
from equivariant_diffusion.en_diffusion import (  # noqa: E402
    EnHierarchicalVAE,
    EnLatentDiffusion,
)

from geoldm_tpu.data.collate import collate_molecules  # noqa: E402
from geoldm_tpu.data.datasets_config import get_dataset_info  # noqa: E402
from geoldm_tpu.diffusion import latent as ldm  # noqa: E402
from geoldm_tpu.evalsuite.analyze import analyze_stability_for_molecules  # noqa: E402
from geoldm_tpu.models import factory  # noqa: E402
from geoldm_tpu.train import optim as optim_mod  # noqa: E402
from geoldm_tpu.ops.distance import build_edge_mask  # noqa: E402

sys.path.insert(0, os.path.join(REPO, "tests"))
from parity_utils import (  # noqa: E402
    decoder_params_from_torch,
    dynamics_params_from_torch,
    encoder_params_from_torch,
)

INFO = get_dataset_info("qm9")
NF, LAYERS, LATENT_NF, T_DIFF = 64, 9, 1, 500
BS, PAD = 32, 8
LR = 5e-4
IN_NODE_NF = 6  # 5 atom types + charges


# --- exact template molecules (same as scripts/parity_train_ab.py) ---------

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
SIZES = np.array([5, 3, 4])


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


def wilson_ci(k: float, n: float, z: float = 1.96):
    """95% Wilson score interval for k successes out of n."""
    if n == 0:
        return 0.0, 0.0, 1.0
    p = k / n
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = (z / denom) * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    return p, max(0.0, center - half), min(1.0, center + half)


def _stability_counts(one_hot, x, node_mask):
    """(stable_atoms, total_atoms, stable_mols, total_mols)."""
    mols = {"one_hot": one_hot, "x": x, "node_mask": node_mask}
    v, _ = analyze_stability_for_molecules(mols, INFO, use_rdkit=False)
    n_atoms = float(node_mask.sum())
    n_mols = float(one_hot.shape[0])
    return (v["atm_stable"] * n_atoms, n_atoms, v["mol_stable"] * n_mols, n_mols)


def build_pair(seed: int):
    """Torch flagship-kind LDM + its init transferred to a JAX param tree."""
    torch.manual_seed(seed)
    enc = EGNN_encoder_QM9(
        in_node_nf=IN_NODE_NF, context_node_nf=0, out_node_nf=LATENT_NF,
        n_dims=3, hidden_nf=NF, n_layers=1, attention=True, tanh=True,
        norm_constant=1.0, inv_sublayers=1, sin_embedding=False,
        normalization_factor=1.0, aggregation_method="sum", include_charges=True,
    )
    dec = EGNN_decoder_QM9(
        in_node_nf=LATENT_NF, context_node_nf=0, out_node_nf=IN_NODE_NF,
        n_dims=3, hidden_nf=NF, n_layers=LAYERS, attention=True, tanh=True,
        norm_constant=1.0, inv_sublayers=1, sin_embedding=False,
        normalization_factor=1.0, aggregation_method="sum", include_charges=True,
    )
    vae = EnHierarchicalVAE(
        encoder=enc, decoder=dec, in_node_nf=IN_NODE_NF, n_dims=3,
        latent_node_nf=LATENT_NF, kl_weight=0.01, norm_values=(1, 4, 10),
        include_charges=True,
    )
    dyn = EGNN_dynamics_QM9(
        in_node_nf=LATENT_NF + 1, context_node_nf=0, n_dims=3, hidden_nf=NF,
        n_layers=LAYERS, attention=True, tanh=True, norm_constant=1.0,
        inv_sublayers=1, sin_embedding=False, normalization_factor=1.0,
        aggregation_method="sum", condition_time=True,
    )
    ref = EnLatentDiffusion(
        vae=vae, trainable_ae=True, dynamics=dyn, in_node_nf=LATENT_NF,
        n_dims=3, timesteps=T_DIFF, noise_schedule="polynomial_2",
        noise_precision=1e-5, loss_type="l2", norm_values=(1.0, 4.0, 10.0),
        include_charges=True,
    )
    cfg = factory.make_latent_diffusion_config(
        INFO, nf=NF, n_layers=LAYERS, latent_nf=LATENT_NF,
        normalization_factor=1.0, diffusion_steps=T_DIFF, trainable_ae=True,
    )
    params = {
        "dynamics": dynamics_params_from_torch(dyn, LAYERS, 1, True),
        "vae": {
            "encoder": encoder_params_from_torch(enc, 1, 1, True),
            "decoder": decoder_params_from_torch(dec, LAYERS, 1, True),
        },
    }
    return ref, cfg, params


def run_seed(seed: int, batches, args, results):
    """Train one torch/jax pair for args.steps; returns loss + stab rows."""
    ref, cfg, params = build_pair(seed)

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
            return ldm.ldm_nll(
                p, cfg.diffusion, cfg.dynamics, cfg.vae, key, x, h_cat, h_int,
                node_mask, edge_mask, training=True, trainable_ae=True,
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sample_j = jax.jit(
        lambda p, key, nm, em: ldm.ldm_sample(
            p, cfg.diffusion, cfg.dynamics, cfg.vae, key, nm, em, None
        )
    )

    loss_t_hist, loss_j_hist = [], []

    def eval_stability(step):
        per_size = args.n_eval // len(SIZES)
        # torch side
        t_counts = np.zeros(4)
        ref.eval()
        with torch.no_grad():
            for n in SIZES:
                nm = torch.ones(per_size, int(n), 1)
                em = (torch.ones(int(n), int(n)) - torch.eye(int(n))).repeat(
                    per_size, 1, 1
                ).view(-1, 1)
                x_s, h_s = ref.sample(per_size, int(n), nm, em, None)
                pad_x = np.zeros((per_size, PAD, 3), np.float32)
                pad_oh = np.zeros((per_size, PAD, 5), np.float32)
                pad_nm = np.zeros((per_size, PAD), np.float32)
                pad_x[:, :n] = x_s.numpy()
                pad_oh[:, :n] = h_s["categorical"].numpy()
                pad_nm[:, :n] = 1.0
                t_counts += np.array(_stability_counts(pad_oh, pad_x, pad_nm))
        ref.train()

        # jax side
        j_counts = np.zeros(4)
        for i, n in enumerate(SIZES):
            nm = jnp.ones((per_size, int(n), 1))
            em = build_edge_mask(nm)
            # Seed-dependent eval keys: a key shared across seeds would give
            # every jax cell at this step the SAME eval-noise realization —
            # a common component the paired-across-seeds test cannot cancel
            # (it biased v2's jax cells by up to ~±0.02 together).
            x_s, h_cat_s, _ = sample_j(
                params, jax.random.key(seed * 1_000_003 + 7000 + 31 * step + i),
                nm, em,
            )
            pad_x = np.zeros((per_size, PAD, 3), np.float32)
            pad_oh = np.zeros((per_size, PAD, 5), np.float32)
            pad_nm = np.zeros((per_size, PAD), np.float32)
            pad_x[:, :n] = np.asarray(x_s)
            pad_oh[:, :n] = np.asarray(h_cat_s)
            pad_nm[:, :n] = 1.0
            j_counts += np.array(_stability_counts(pad_oh, pad_x, pad_nm))

        results["stab"].append(
            {"seed": seed, "step": step,
             "torch": list(t_counts), "jax": list(j_counts)}
        )
        if args.save_ckpt_dir:
            os.makedirs(args.save_ckpt_dir, exist_ok=True)
            torch.save(
                ref.state_dict(),
                os.path.join(args.save_ckpt_dir, f"torch_s{seed}_step{step}.pt"),
            )
            import pickle

            with open(
                os.path.join(args.save_ckpt_dir, f"jax_s{seed}_step{step}.pkl"), "wb"
            ) as fh:
                pickle.dump(jax.tree.map(np.asarray, params), fh)
        ta = wilson_ci(t_counts[0], t_counts[1])
        ja = wilson_ci(j_counts[0], j_counts[1])
        print(f"  [seed {seed}] step {step}: atm torch {ta[0]:.3f} "
              f"[{ta[1]:.3f},{ta[2]:.3f}] vs jax {ja[0]:.3f} "
              f"[{ja[1]:.3f},{ja[2]:.3f}]", flush=True)

    t0 = time.time()
    for i, b in enumerate(batches):
        x_np, oh_np, ch_np, nm_np = b["x"], b["h_cat"], b["h_int"], b["node_mask"]
        em_np = (nm_np[:, :, None, 0] * nm_np[:, None, :, 0]) * (
            1 - np.eye(PAD, dtype=np.float32)[None]
        )

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

        params, opt_state, loss_j = train_step(
            params, opt_state, jax.random.key(seed * 100_000 + i),
            jnp.asarray(x_np), jnp.asarray(oh_np), jnp.asarray(ch_np),
            jnp.asarray(nm_np), jnp.asarray(em_np[..., None]),
        )
        loss_j_hist.append(float(loss_j))

        if i % 50 == 0:
            print(f"[seed {seed}] step {i}: torch {loss_t_hist[-1]:.4f} "
                  f"jax {loss_j_hist[-1]:.4f} ({time.time()-t0:.0f}s)", flush=True)
        if (i + 1) % args.eval_every == 0 or i == args.steps - 1:
            eval_stability(i + 1)

    results["loss"].append(
        {"seed": seed, "torch": loss_t_hist, "jax": loss_j_hist}
    )


def write_report(results, args, elapsed, out_path):
    k = 50
    # Seeds come from the RESULTS (not argv): --report_only on a saved JSON
    # must label columns by the seeds that actually ran.
    seeds = [r["seed"] for r in results["loss"]]

    def win_means(hist):
        a = np.array(hist)
        return [float(a[s:s + k].mean()) for s in range(0, len(a), k)]

    lines = [
        "# PARITY_TRAIN — flagship-shape LDM A/B, reference (torch) vs geoldm-tpu (JAX)",
        "",
        f"EnLatentDiffusion with trainable_ae (encoder 1 + decoder {LAYERS} + "
        f"denoiser {LAYERS} EGNN blocks), nf={NF}, latent_nf={LATENT_NF}, "
        f"T={T_DIFF}, polynomial_2, l2 — the flagship model *kind* at the",
        "largest width this host's single CPU core can train in-budget.",
        f"{len(seeds)} seeds per side; a seed pair shares its initial",
        "weights (torch init transferred to JAX) and its batch sequence",
        "(methane/water/ammonia templates with random rotations); per-step",
        "diffusion randomness is independent per side. Between-seed spread",
        "within a framework is the yardstick for between-framework gaps.",
        "",
        "Companion evidence: tests/test_grad_parity.py (per-step d(loss)/d(params)",
        "parity at f32 tolerance for this exact model kind), tests/test_model_parity.py",
        "(forward losses), tests/test_sampler_parity.py (reverse-process rollouts).",
        "",
        "## Loss trajectory (mean over 50-step windows, per seed)",
        "",
        "| steps | " + " | ".join(
            f"torch s{s} | jax s{s}" for s in seeds
        ) + " | pooled ratio jax/torch |",
        "|" + "---|" * (2 * len(seeds) + 2),
    ]
    wt_all, wj_all = [], []
    for r in results["loss"]:
        wt_all.append(win_means(r["torch"]))
        wj_all.append(win_means(r["jax"]))
    n_win = len(wt_all[0])
    for w in range(n_win):
        t_vals = [wt[w] for wt in wt_all]
        j_vals = [wj[w] for wj in wj_all]
        cells = []
        for t, j in zip(t_vals, j_vals):
            cells.append(f"{t:.4f}")
            cells.append(f"{j:.4f}")
        ratio = float(np.mean(j_vals) / np.mean(t_vals))
        lines.append(
            f"| {w*k}-{w*k+k-1} | " + " | ".join(cells) + f" | {ratio:.3f} |"
        )

    # Seed spread vs framework gap at the final window.
    t_fin = [wt[-1] for wt in wt_all]
    j_fin = [wj[-1] for wj in wj_all]
    lines += [
        "",
        f"Final-window loss: torch {np.mean(t_fin):.4f} "
        f"(seed range {min(t_fin):.4f}-{max(t_fin):.4f}), "
        f"jax {np.mean(j_fin):.4f} "
        f"(seed range {min(j_fin):.4f}-{max(j_fin):.4f}).",
        "",
        "## Sampled stability with 95% Wilson CIs "
        f"({args.n_eval} molecules/side/checkpoint/seed)",
        "",
        "| seed | step | torch atm [CI] | jax atm [CI] | torch mol [CI] | jax mol [CI] | CIs overlap |",
        "|---|---|---|---|---|---|---|",
    ]

    def fmt(ci):
        return f"{ci[0]:.3f} [{ci[1]:.3f},{ci[2]:.3f}]"

    for row in results["stab"]:
        ta = wilson_ci(row["torch"][0], row["torch"][1])
        ja = wilson_ci(row["jax"][0], row["jax"][1])
        tm = wilson_ci(row["torch"][2], row["torch"][3])
        jm = wilson_ci(row["jax"][2], row["jax"][3])
        atm_ok = ta[1] <= ja[2] and ja[1] <= ta[2]
        mol_ok = tm[1] <= jm[2] and jm[1] <= tm[2]
        lines.append(
            f"| {row['seed']} | {row['step']} | {fmt(ta)} | {fmt(ja)} | "
            f"{fmt(tm)} | {fmt(jm)} | "
            f"atm {'yes' if atm_ok else 'NO'} / mol {'yes' if mol_ok else 'NO'} |"
        )

    # Paired framework comparison over ALL (seed, checkpoint) cells — the
    # statistically honest test. Individual checkpoint CIs often do NOT
    # overlap (in both directions!), because the metric swings between
    # checkpoints WITHIN one framework far more than binomial noise: the
    # training trajectory itself is the dominant randomness at this scale.
    # A paired t-interval over the 12 (seed, step) cells integrates over
    # that trajectory noise; zero inside the interval = no detectable
    # framework effect.
    import math

    ta = np.array([r["torch"][0] / r["torch"][1] for r in results["stab"]])
    ja = np.array([r["jax"][0] / r["jax"][1] for r in results["stab"]])
    tm = np.array([r["torch"][2] / r["torch"][3] for r in results["stab"]])
    jm = np.array([r["jax"][2] / r["jax"][3] for r in results["stab"]])

    def tci(d):
        # two-sided 95% t interval for the paired mean difference.
        # The quantile table must cover EVERY df that can reach here — a
        # silent fallback to 2.0 at df=2 once mislabeled a 3-seed run as
        # "DETECTED" (correct t_{2,.975} is 4.303, more than twice 2.0).
        tq_table = {1: 12.706, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571,
                    6: 2.447, 7: 2.365, 8: 2.306, 9: 2.262, 10: 2.228,
                    11: 2.201, 12: 2.179, 14: 2.145, 15: 2.131, 19: 2.093,
                    24: 2.064, 29: 2.045}
        df = len(d) - 1
        tq = tq_table.get(df) or tq_table[max(k for k in tq_table if k <= df)]
        m = float(np.mean(d))
        se = float(np.std(d, ddof=1)) / math.sqrt(len(d))
        return m, m - tq * se, m + tq * se

    da = tci(ja - ta)
    dm = tci(jm - tm)

    # Seed-clustered variant: the step-300 and step-600 cells of one seed
    # share a trajectory, so the per-cell interval above understates the
    # variance. Average the checkpoints within each seed first and take
    # the t interval over the n_seeds seed-level diffs — the conservative
    # number to quote.
    cell_seeds = np.array([r["seed"] for r in results["stab"]])
    def cluster(d):
        return np.array([d[cell_seeds == s].mean() for s in seeds])
    da_cl = tci(cluster(ja - ta))
    dm_cl = tci(cluster(jm - tm))
    n_cells = len(ta)
    half_binom = 1.96 * math.sqrt(0.25 / float(results["stab"][0]["torch"][1]))
    lines += [
        "",
        "### Paired framework comparison (the valid test)",
        "",
        f"Per-checkpoint stability swings WITHIN one framework (sd across the "
        f"{n_cells} cells: torch {np.std(ta, ddof=1):.3f}, jax "
        f"{np.std(ja, ddof=1):.3f}) dwarf single-checkpoint binomial noise "
        f"(~±{half_binom:.3f}), so isolated CI overlap above is the wrong "
        "test — the training trajectory is the dominant randomness and both "
        "frameworks sample it independently. Pairing the cells:",
        "",
        "| metric | torch mean | jax mean | paired diff jax−torch [95% CI] | framework effect? |",
        "|---|---|---|---|---|",
        f"| atom stability | {ta.mean():.3f} | {ja.mean():.3f} | "
        f"{da[0]:+.3f} [{da[1]:+.3f}, {da[2]:+.3f}] | "
        f"{'none detectable' if da[1] <= 0 <= da[2] else 'DETECTED'} |",
        f"| molecule stability | {tm.mean():.3f} | {jm.mean():.3f} | "
        f"{dm[0]:+.3f} [{dm[1]:+.3f}, {dm[2]:+.3f}] | "
        f"{'none detectable' if dm[1] <= 0 <= dm[2] else 'DETECTED'} |",
        "",
        f"Seed-clustered (checkpoints averaged within seed first, t over "
        f"the {len(seeds)} seed-level diffs — conservative w.r.t. the "
        "within-seed checkpoint correlation): atom "
        f"{da_cl[0]:+.3f} [{da_cl[1]:+.3f}, {da_cl[2]:+.3f}], molecule "
        f"{dm_cl[0]:+.3f} [{dm_cl[1]:+.3f}, {dm_cl[2]:+.3f}].",
    ]

    # Pooled across seeds at the final step.
    final_step = max(r["step"] for r in results["stab"])
    pool_t = np.sum([r["torch"] for r in results["stab"] if r["step"] == final_step], axis=0)
    pool_j = np.sum([r["jax"] for r in results["stab"] if r["step"] == final_step], axis=0)
    ta = wilson_ci(pool_t[0], pool_t[1])
    ja = wilson_ci(pool_j[0], pool_j[1])
    tm = wilson_ci(pool_t[2], pool_t[3])
    jm = wilson_ci(pool_j[2], pool_j[3])
    lines += [
        "",
        f"Pooled final-checkpoint (step {final_step}, "
        f"{int(pool_t[3])} molecules/side): atom stability torch {fmt(ta)} vs "
        f"jax {fmt(ja)}; molecule stability torch {fmt(tm)} vs jax {fmt(jm)}.",
        f"Atom-stability CIs overlap: {'yes' if (ta[1] <= ja[2] and ja[1] <= ta[2]) else 'NO'}; "
        f"molecule-stability CIs overlap: {'yes' if (tm[1] <= jm[2] and jm[1] <= tm[2]) else 'NO'}.",
    ]

    # Attribution of the round-3 detected molecule-stability effect and of
    # the early-window loss-ratio bump (round-3 verdict items 2 and 8).
    early_ratio = float(
        np.mean([wj[1] for wj in wj_all]) / np.mean([wt[1] for wt in wt_all])
    ) if n_win > 1 else float("nan")
    lines += [
        "",
        "## Framework-effect attribution (round 4)",
        "",
        "Round 3's 5-seed run detected a paired molecule-stability",
        "difference (+0.031 [+0.003, +0.060], jax ahead). Two follow-ups",
        "isolated it:",
        "",
        "1. **Not the sampler.** The weights-crossed 2×2 A/B",
        "   (docs/STABILITY_CROSS.md; 10,008 molecules/side, trained weights",
        "   crossed between frameworks) holds weights fixed and swaps",
        "   samplers: the molecule-stability sampler effect is +0.007",
        "   [-0.002, +0.016] — covers zero and caps any sampler/decoder",
        "   contribution well below the detected +0.031 — while the",
        "   weights effect reproduces it exactly (+0.031 [+0.022, +0.040]).",
        "   The effect rides in the trained weights.",
        "2. **The optimizers genuinely differed.** optax.scale_by_amsgrad",
        "   maxes the bias-CORRECTED second moment, permanently locking in",
        "   inflated early values — measured effective steps decay to",
        "   ~0.26× torch's under decaying gradients — where torch maxes the",
        "   RAW nu and bias-corrects the max with the current step. That",
        "   asymmetry was also the root cause of the early-window loss-ratio",
        "   bump (pooled jax/torch 1.084 at steps 50-99 in the round-3",
        "   table; with the matched train/optim.scale_by_amsgrad_torch the",
        f"   same window above measures {early_ratio:.3f}). Trajectories now",
        "   match torch.optim.Adam(amsgrad=True) to 2e-6 over 120 steps",
        "   (tests/test_train.py amsgrad suite).",
        "",
        "The table above is the matched-optimizer rerun; its paired rows",
        "are the post-fix verdict on whether any framework effect remains.",
    ]
    residual = not (da_cl[1] <= 0 <= da_cl[2]) or not (dm_cl[1] <= 0 <= dm_cl[2])
    if residual:
        lines += [
            "",
            "**Residual effect after the optimizer fix.** The seed-clustered",
            "paired interval still excludes zero, so the optimizer asymmetry",
            "was not the whole story. What is and is not known about the",
            "residual:",
            "",
            "- The weights-crossed A/B (docs/STABILITY_CROSS.md) bounds the",
            "  SAMPLER's contribution at about +0.008 atom / +0.007 molecule",
            "  — an order of magnitude below the residual — so it rides in",
            "  the trained weights.",
            "- The per-step map is parity-tested (grads at f32 tolerance,",
            "  optimizer trajectories to 2e-6/120 steps) and every training",
            "  draw distribution matches the reference analytically",
            "  (t ~ U{0..T} per molecule, CoM-projected position noise,",
            "  masked standard feature noise, encoder noise).",
            "- docs/PARITY_LOCKSTEP.md drives both frameworks with",
            "  IDENTICAL draw realizations to separate map differences from",
            "  draw/statistics effects; see its verdict for the attribution.",
            "- **Known defect of runs before the round-4 aliasing fix**",
            "  (tests/parity_utils.t2j): the transferred jax init ALIASED",
            "  the torch parameter storage, so torch's step-0 optimizer",
            "  update mutated the jax weights before jax's first step — the",
            "  jax side trained from torch's post-step-0 point, a permanent",
            "  one-step head start (visible as jax winning the 0-49 loss",
            "  window in 9/10 seeds above). Runs after the fix start from",
            "  the exact shared init; pre-fix stability tables carry this",
            "  bias and need a post-fix re-run to count as a clean",
            "  framework comparison.",
        ]

    lines += [
        "",
        f"Wall-clock: {elapsed/60:.1f} min total on 1 CPU core "
        "(both frameworks, all seeds, training + sampling).",
        "",
        f"Reproduce: `JAX_PLATFORMS=cpu python scripts/parity_train_ab_ldm.py "
        f"--steps {args.steps} --n_eval {args.n_eval} "
        f"--seeds {' '.join(str(s) for s in seeds)}`",
        "",
        "## Appendix: v1 (round 2) small-VDM A/B",
        "",
        "The earlier nf=32 2-layer VDM A/B (no CIs) is superseded by the",
        "table above; reproduce it with `scripts/parity_train_ab.py`.",
        "",
    ]
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--eval_every", type=int, default=300)
    ap.add_argument("--n_eval", type=int, default=510, help="molecules per side per checkpoint")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--out", type=str, default=os.path.join(REPO, "PARITY_TRAIN.md"))
    ap.add_argument("--json_out", type=str, default=None,
                    help="also dump raw results as JSON")
    ap.add_argument("--report_only", type=str, default=None,
                    help="regenerate the report from a saved --json_out file "
                         "without retraining")
    ap.add_argument("--save_ckpt_dir", type=str, default=None,
                    help="save torch state_dicts + jax param pickles at every "
                         "eval step (enables sampler-crossed re-evals without "
                         "retraining)")
    args = ap.parse_args(argv)
    torch.set_num_threads(max(1, len(os.sched_getaffinity(0))))

    if args.report_only:
        with open(args.report_only) as f:
            results = json.load(f)
        write_report(results, args, results.get("elapsed", 0.0), args.out)
        return

    rng = np.random.default_rng(7)
    batches = [make_batch(rng) for _ in range(args.steps)]

    print(f"LDM A/B: {args.steps} steps x seeds {args.seeds}, bs={BS}, "
          f"nf={NF}, layers={LAYERS}, T={T_DIFF}, trainable_ae", flush=True)
    results = {"loss": [], "stab": []}
    t0 = time.time()
    for seed in args.seeds:
        run_seed(seed, batches, args, results)
    elapsed = time.time() - t0

    results["elapsed"] = elapsed
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f)
    write_report(results, args, elapsed, args.out)


if __name__ == "__main__":
    main()

"""Weights-crossed sampler A/B: isolate PARITY_TRAIN's molecule-stability
framework effect.

PARITY_TRAIN v2 detected a paired molecule-stability difference between
frameworks (+0.031 jax-torch, CI excluding zero) that confounds two
mechanisms: the SAMPLERS/DECODERS could differ, or the TRAINING
trajectories could. This script separates them with a 2x2 grid per seed:

    {torch-trained weights W_T, jax-trained weights W_J}
  x {torch sampler (reference EnLatentDiffusion.sample),
     jax sampler (diffusion/latent.ldm_sample)}

Both samplers see the SAME weights in the crossed cells: W_T crosses into
jax via tests/parity_utils (the tested init-transfer maps, reading the
TRAINED module state), W_J crosses into torch via
utils/torch_convert.state_dict_from_params + load_state_dict(strict=True)
(the exporter path). Within a seed the sampler effect is therefore exact —
training-trajectory noise cancels, leaving only binomial sampling noise:

    sampler effect  = (W_T->jax) - (W_T->torch)  and  (W_J->jax) - (W_J->torch)
    weights effect  = (W_J->jax) - (W_T->jax)    and  (W_J->torch) - (W_T->torch)

If the round-3 effect follows the SAMPLER, the sampler-effect rows will
exclude zero; if it follows TRAINING, they will cover zero and the
weights-effect rows inherit the trajectory noise (requiring the many-seed
PARITY_TRAIN rerun to bound).

Training uses the shared-init / shared-batch protocol and the
torch-semantics AMSGrad from train/optim.py (both sides matched).

reference sampler under test: equivariant_diffusion/en_diffusion.py:716-793
(sample) + 1057-1219 (EnLatentDiffusion decode).

Run: JAX_PLATFORMS=cpu python scripts/stability_cross_ab.py
     [--steps 600] [--n_eval 2502] [--seeds 0 1] [--out docs/STABILITY_CROSS.md]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
import torch  # noqa: E402

from parity_train_ab_ldm import (  # noqa: E402
    BS, LR, PAD, SIZES, T_DIFF,
    _stability_counts, build_pair, make_batch, wilson_ci,
)

from geoldm_tpu.diffusion import latent as ldm  # noqa: E402
from geoldm_tpu.ops.distance import build_edge_mask  # noqa: E402
from geoldm_tpu.train import optim as optim_mod  # noqa: E402
from geoldm_tpu.utils.torch_convert import state_dict_from_params  # noqa: E402

sys.path.insert(0, os.path.join(REPO, "tests"))
from parity_utils import (  # noqa: E402
    decoder_params_from_torch,
    dynamics_params_from_torch,
    encoder_params_from_torch,
)

CELLS = ("WT_torch", "WT_jax", "WJ_jax", "WJ_torch")


def train_pair(seed: int, batches, cfg, ref, params):
    """Train the torch module and the jax pytree on the same batches."""
    opt_t = torch.optim.AdamW(ref.parameters(), lr=LR, amsgrad=True,
                              weight_decay=1e-12)
    tx = optax.chain(
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

    t0 = time.time()
    for i, b in enumerate(batches):
        x_np, oh_np, ch_np, nm_np = b["x"], b["h_cat"], b["h_int"], b["node_mask"]
        em_np = (nm_np[:, :, None, 0] * nm_np[:, None, :, 0]) * (
            1 - np.eye(PAD, dtype=np.float32)[None]
        )
        opt_t.zero_grad()
        nll = ref(
            torch.from_numpy(x_np),
            {"categorical": torch.from_numpy(oh_np),
             "integer": torch.from_numpy(ch_np)},
            torch.from_numpy(nm_np),
            torch.from_numpy(em_np.reshape(-1, 1)),
            None,
        ).mean()
        nll.backward()
        opt_t.step()
        params, opt_state, loss_j = train_step(
            params, opt_state, jax.random.key(seed * 100_000 + i),
            jnp.asarray(x_np), jnp.asarray(oh_np), jnp.asarray(ch_np),
            jnp.asarray(nm_np), jnp.asarray(em_np[..., None]),
        )
        if i % 100 == 0:
            print(f"[seed {seed}] step {i}: torch {float(nll):.4f} "
                  f"jax {float(loss_j):.4f} ({time.time()-t0:.0f}s)",
                  flush=True)
    return ref, params


def sample_torch(ref, n_eval: int, seed: int):
    """n_eval molecules through the reference sampler; stability counts."""
    per_size = n_eval // len(SIZES)
    counts = np.zeros(4)
    torch.manual_seed(90_000 + seed)
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
            counts += np.array(_stability_counts(pad_oh, pad_x, pad_nm))
    ref.train()
    return counts


def sample_jax(params, cfg, n_eval: int, seed: int):
    per_size = n_eval // len(SIZES)
    counts = np.zeros(4)
    sample_j = jax.jit(
        lambda p, key, nm, em: ldm.ldm_sample(
            p, cfg.diffusion, cfg.dynamics, cfg.vae, key, nm, em, None
        )
    )
    for i, n in enumerate(SIZES):
        nm = jnp.ones((per_size, int(n), 1))
        em = build_edge_mask(nm)
        x_s, h_cat_s, _ = sample_j(params, jax.random.key(80_000 + 31 * seed + i), nm, em)
        pad_x = np.zeros((per_size, PAD, 3), np.float32)
        pad_oh = np.zeros((per_size, PAD, 5), np.float32)
        pad_nm = np.zeros((per_size, PAD), np.float32)
        pad_x[:, :n] = np.asarray(x_s)
        pad_oh[:, :n] = np.asarray(h_cat_s)
        pad_nm[:, :n] = 1.0
        counts += np.array(_stability_counts(pad_oh, pad_x, pad_nm))
    return counts


def torch_weights_to_jax(ref, layers: int):
    """Trained torch module state -> jax pytree (parity_utils reads the
    module's CURRENT tensors, so this is the trained transfer)."""
    return {
        "dynamics": dynamics_params_from_torch(ref.dynamics, layers, 1, True),
        "vae": {
            "encoder": encoder_params_from_torch(ref.vae.encoder, 1, 1, True),
            "decoder": decoder_params_from_torch(ref.vae.decoder, layers, 1, True),
        },
    }


def jax_weights_to_torch(params, cfg, seed: int):
    """Trained jax pytree -> a fresh reference module via the exporter's
    state-dict map (strict load: any key/shape drift raises)."""
    fresh, _, _ = build_pair(seed)
    sd = {k: torch.tensor(np.asarray(v))
          for k, v in state_dict_from_params(params, cfg).items()}
    fresh.load_state_dict(sd, strict=True)
    return fresh


def diff_ci(k1, n1, k2, n2):
    """Normal-approx 95% CI for p1 - p2 (independent binomials)."""
    p1, p2 = k1 / n1, k2 / n2
    half = 1.96 * np.sqrt(p1 * (1 - p1) / n1 + p2 * (1 - p2) / n2)
    d = p1 - p2
    return d, d - half, d + half


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--n_eval", type=int, default=2502,
                    help="molecules per grid cell (divisible by 3)")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "docs", "STABILITY_CROSS.md"))
    ap.add_argument("--json_out", type=str,
                    default=os.path.join(REPO, "docs", "stability_cross.json"))
    args = ap.parse_args(argv)
    torch.set_num_threads(max(1, len(os.sched_getaffinity(0))))

    rng = np.random.default_rng(7)
    batches = [make_batch(rng) for _ in range(args.steps)]

    results = []
    t0 = time.time()
    for seed in args.seeds:
        ref, cfg, params = build_pair(seed)
        layers = cfg.dynamics.egnn.n_layers
        ref, params = train_pair(seed, batches, cfg, ref, params)

        cells = {}
        cells["WT_torch"] = sample_torch(ref, args.n_eval, seed)
        wt_jax = torch_weights_to_jax(ref, layers)
        cells["WT_jax"] = sample_jax(wt_jax, cfg, args.n_eval, seed)
        cells["WJ_jax"] = sample_jax(params, cfg, args.n_eval, 1000 + seed)
        wj_torch = jax_weights_to_torch(params, cfg, seed)
        cells["WJ_torch"] = sample_torch(wj_torch, args.n_eval, 1000 + seed)

        results.append({"seed": seed, **{c: list(cells[c]) for c in CELLS}})
        for c in CELLS:
            atm = wilson_ci(cells[c][0], cells[c][1])
            mol = wilson_ci(cells[c][2], cells[c][3])
            print(f"[seed {seed}] {c}: atm {atm[0]:.3f} [{atm[1]:.3f},{atm[2]:.3f}] "
                  f"mol {mol[0]:.3f} [{mol[1]:.3f},{mol[2]:.3f}]", flush=True)

    elapsed = time.time() - t0
    with open(args.json_out, "w") as f:
        json.dump({"results": results, "elapsed": elapsed,
                   "steps": args.steps, "n_eval": args.n_eval}, f)
    write_report(results, args, elapsed)


def write_report(results, args, elapsed):
    def fmt_cell(c):
        atm = wilson_ci(c[0], c[1])
        mol = wilson_ci(c[2], c[3])
        return (f"{atm[0]:.3f} [{atm[1]:.3f},{atm[2]:.3f}]",
                f"{mol[0]:.3f} [{mol[1]:.3f},{mol[2]:.3f}]")

    lines = [
        "# STABILITY_CROSS — weights-crossed sampler A/B",
        "",
        f"One trained checkpoint per framework per seed (PARITY_TRAIN "
        f"protocol: nf=64, 9-layer decoder/denoiser, T={T_DIFF}, "
        f"{args.steps} steps, bs={BS}, torch-semantics AMSGrad both sides), "
        f"then {args.n_eval} molecules per grid cell:",
        "",
        "- `WT_torch` torch-trained weights, reference sampler"
        " (en_diffusion.py:716-793)",
        "- `WT_jax`   the SAME torch-trained weights through the jax sampler"
        " (trained-state transfer via tests/parity_utils)",
        "- `WJ_jax`   jax-trained weights, jax sampler",
        "- `WJ_torch` the SAME jax-trained weights through the reference"
        " sampler (utils/torch_convert.state_dict_from_params,"
        " strict load)",
        "",
        "Within a seed the sampler rows share weights exactly, so the"
        " training-trajectory noise that dominates PARITY_TRAIN cancels —"
        " only binomial noise remains.",
        "",
        "## Grid (95% Wilson CIs)",
        "",
        "| seed | cell | atom stability | molecule stability |",
        "|---|---|---|---|",
    ]
    for r in results:
        for c in CELLS:
            a, m = fmt_cell(r[c])
            lines.append(f"| {r['seed']} | {c} | {a} | {m} |")

    lines += [
        "",
        "## Effect decomposition (jax minus torch, 95% CIs)",
        "",
        "| seed | contrast | holds fixed | atom stability diff | molecule stability diff |",
        "|---|---|---|---|---|",
    ]
    pooled = {"sampler": [], "weights": []}
    for r in results:
        rows = [
            ("sampler", "W_T", r["WT_jax"], r["WT_torch"]),
            ("sampler", "W_J", r["WJ_jax"], r["WJ_torch"]),
            ("weights", "jax sampler", r["WJ_jax"], r["WT_jax"]),
            ("weights", "torch sampler", r["WJ_torch"], r["WT_torch"]),
        ]
        for kind, held, c1, c2 in rows:
            da = diff_ci(c1[0], c1[1], c2[0], c2[1])
            dm = diff_ci(c1[2], c1[3], c2[2], c2[3])
            pooled[kind].append((c1, c2))
            lines.append(
                f"| {r['seed']} | {kind} effect | {held} | "
                f"{da[0]:+.3f} [{da[1]:+.3f},{da[2]:+.3f}] | "
                f"{dm[0]:+.3f} [{dm[1]:+.3f},{dm[2]:+.3f}] |"
            )

    lines += ["", "## Pooled verdicts", ""]
    verdicts = {}
    for kind, pairs in pooled.items():
        s1 = np.sum([p[0] for p in pairs], axis=0)
        s2 = np.sum([p[1] for p in pairs], axis=0)
        da = diff_ci(s1[0], s1[1], s2[0], s2[1])
        dm = diff_ci(s1[2], s1[3], s2[2], s2[3])
        hit_a = "EXCLUDES zero" if not (da[1] <= 0 <= da[2]) else "covers zero"
        hit_m = "EXCLUDES zero" if not (dm[1] <= 0 <= dm[2]) else "covers zero"
        verdicts[kind] = (da, dm)
        lines.append(
            f"- **{kind} effect** (pooled {int(s1[3])} molecules/side): atom "
            f"{da[0]:+.3f} [{da[1]:+.3f},{da[2]:+.3f}] ({hit_a}); molecule "
            f"{dm[0]:+.3f} [{dm[1]:+.3f},{dm[2]:+.3f}] ({hit_m})"
        )
    lines += [
        "",
        "**Validity caveat (important).** The pooled SAMPLER rows are the",
        "instrument this A/B is built for: within a seed the two sampler",
        "cells share trained weights exactly, so trajectory noise cancels",
        "and binomial CIs are the right error bars. The pooled WEIGHTS",
        "rows are NOT a valid framework test: a weights contrast compares",
        "two independently-trained checkpoints, whose stability varies",
        "across training trajectories with sd ~0.10 — far above binomial",
        "noise — and the per-seed rows here differ wildly (e.g. atom",
        "+0.141 on one seed vs +0.005 on the next). Binomial pooling",
        "ignores that across-seed variance entirely. Read the weights",
        "effect from PARITY_TRAIN.md's seed-clustered paired interval",
        "(10 seeds) instead; the weights rows here only serve to show the",
        "sampler contrast is the small term.",
        "",
        f"Wall-clock: {elapsed/60:.1f} min on 1 CPU core.",
        "",
        f"Reproduce: `JAX_PLATFORMS=cpu python scripts/stability_cross_ab.py "
        f"--steps {args.steps} --n_eval {args.n_eval} "
        f"--seeds {' '.join(str(r['seed']) for r in results)}`",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

"""Bisect STABILITY_CROSS's +0.008 sampler-level atom-stability effect.

STABILITY_CROSS holds trained weights fixed and contrasts the two
samplers; pooled over 10,008 molecules/side the atom-stability gap is
+0.008 [+0.003, +0.014] jax-over-torch — small but excluding zero, with
no mechanism named. A bigger statistical A/B cannot name one either;
this script replaces statistics with DETERMINISTIC differential tests
that cut the sampler at its joints. Candidate mechanisms (round-4
verdict's list): decode argmax/round tie-breaking, final-step sigma
handling, CoM re-projection cadence, f32-vs-f64 gamma lookup.

Phases (weights = torch-trained W_T transferred to jax, the cell where
the effect was detected; all draws injected identically on both sides):

- **Phase 0 — schedule tables.** max |gamma_jax - gamma_torch| over the
  full lookup table and |sigma_x(0)| both sides. Both frameworks build
  the table in f64 and store f32 (schedules.gamma_table vs
  en_diffusion.py:172-207); any residual diff would bias EVERY step
  systematically, so it is checked first and exactly.
- **Phase A — final step + decode on SHARED z0.** The final step
  (sample_p_xh_given_z0, en_diffusion.py:1099-1122) and the VAE decode
  (argmax/round, en_diffusion.py:1017-1035) execute ONCE per molecule —
  no chaotic amplification — so feeding both frameworks the same z0 and
  the same final eps makes their outputs comparable molecule-by-
  molecule. Reports max |d_xh| (final-step algebra), per-molecule
  verdict discordance (decode tie-breaking), and the PAIRED atom-
  stability difference with its CI: if the +0.008 lives in the final
  step/decode, it shows up here at full strength with paired power.
- **Phase B — lockstep chains vs a 1-ulp control.** Full T-step
  reverse chains with identical per-step draws; RMS(z_t^jax - z_t^torch)
  per step against RMS(z_t^jax - z_t^ctrl) where the control is the
  SAME jax chain from an init perturbed by 1e-7 relative. Divergence
  tracking the control envelope means the two step maps are equivalent
  (differences are f32 chaos, not algebra); an early systematic
  departure localizes a genuine map difference to a step range.

Run: JAX_PLATFORMS=cpu python scripts/stability_bisect_sampler.py
     [--steps 600] [--n_eval 2502] [--seed 0] [--chain_b 24]
     [--out docs/STABILITY_BISECT.md]
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
import torch  # noqa: E402

from parity_train_ab_ldm import (  # noqa: E402
    BS, LATENT_NF, LR, PAD, SIZES, T_DIFF, build_pair, make_batch,
)
from stability_cross_ab import torch_weights_to_jax  # noqa: E402

from geoldm_tpu.diffusion import latent as ldm  # noqa: E402
from geoldm_tpu.diffusion import schedules as S  # noqa: E402
from geoldm_tpu.diffusion import vae as vae_mod  # noqa: E402
from geoldm_tpu.diffusion import vdm  # noqa: E402
from geoldm_tpu.evalsuite.analyze import check_stability  # noqa: E402
from geoldm_tpu.data.datasets_config import get_dataset_info  # noqa: E402
from geoldm_tpu.train import optim as optim_mod  # noqa: E402

INFO = get_dataset_info("qm9")
LAYERS = 9


def train_torch_side(ref, batches, seed):
    """Train ONLY the reference module (same protocol as
    stability_cross_ab.train_pair's torch half) — Phase A/B need one
    trained weight set, used by both frameworks."""
    opt_t = torch.optim.AdamW(ref.parameters(), lr=LR, amsgrad=True,
                              weight_decay=1e-12)
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
        if i % 200 == 0:
            print(f"[train seed {seed}] step {i}: {float(nll):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    ref.eval()
    return ref


def replicate_sampler_draws(key, node_mask_j, n_steps):
    """Mirror ldm_sample -> vdm_sample's key tree for the dense sampler
    and return (eps_init, [eps_step_0..T-1], eps_final) as numpy. Uses
    the same pure functions the sampler calls, so exact by construction."""
    k_diff, _ = jax.random.split(key)
    k_init, k_scan, k_final = jax.random.split(k_diff, 3)
    mk = lambda k: np.asarray(  # noqa: E731
        vdm.sample_combined_position_feature_noise(k, node_mask_j, 3, LATENT_NF),
        np.float32,
    )
    eps_init = mk(k_init)
    step_keys = jax.random.split(k_scan, n_steps)
    eps_steps = [mk(step_keys[i]) for i in range(n_steps)]
    eps_final = mk(k_final)
    return eps_init, eps_steps, eps_final, (k_init, step_keys, k_final)


class DrawQueue:
    """Patched sample_combined_position_feature_noise: pop pre-generated
    jax draws in call order (init, per-step, final)."""

    def __init__(self, arrays):
        self.arrays = list(arrays)
        self.i = 0

    def __call__(self, n_samples, n_nodes, node_mask):
        a = self.arrays[self.i]
        self.i += 1
        assert a.shape[0] == n_samples and a.shape[1] == n_nodes, (
            a.shape, n_samples, n_nodes)
        return torch.from_numpy(a)


def per_molecule_stability(x, h_cat, node_mask):
    """Per-molecule (stable_frac_atoms, mol_stable) from padded arrays."""
    out = []
    for i in range(x.shape[0]):
        m = node_mask[i, :, 0] > 0
        types = np.argmax(h_cat[i][m], axis=1)
        mol_ok, st, na = check_stability(x[i][m], types, INFO)
        out.append((st / na, float(mol_ok)))
    return np.array(out)


def phase0_tables(ref, cfg):
    gamma_fn = vdm.make_gamma_fn(cfg.diffusion, None)
    ts = jnp.asarray(np.arange(T_DIFF + 1, dtype=np.float32) / T_DIFF)[:, None]
    g_j = np.asarray(gamma_fn(ts)).reshape(-1)
    with torch.no_grad():
        g_t = ref.gamma(torch.from_numpy(np.asarray(ts))).numpy().reshape(-1)
    dmax = float(np.abs(g_j - g_t).max())
    sig_j = float(np.asarray(S.snr(-0.5 * gamma_fn(jnp.zeros((1, 1))))))
    with torch.no_grad():
        sig_t = float(ref.SNR(-0.5 * ref.gamma(torch.zeros(1, 1))))
    return {"gamma_max_abs_diff": dmax, "sigma_x0_jax": sig_j,
            "sigma_x0_torch": sig_t}


def make_chain_z0(params, cfg, n):
    """Jitted dense reverse chain STOPPING at z0 (the state fed to the
    final step) — replicates vdm_sample's dense path draw-for-draw."""
    gamma_fn = vdm.make_gamma_fn(cfg.diffusion, params)

    @jax.jit
    def chain(params, key, node_mask, edge_mask):
        k_diff, _ = jax.random.split(key)
        k_init, k_scan, k_final = jax.random.split(k_diff, 3)
        z = vdm.sample_combined_position_feature_noise(
            k_init, node_mask, 3, LATENT_NF)
        b = node_mask.shape[0]

        def step(z, inp):
            s_idx, k = inp
            s_arr = jnp.full((b, 1), s_idx, dtype=jnp.float32) / T_DIFF
            t_arr = jnp.full((b, 1), s_idx + 1, dtype=jnp.float32) / T_DIFF
            z = vdm.sample_p_zs_given_zt(
                params, cfg.diffusion, cfg.dynamics, gamma_fn, k, s_arr,
                t_arr, z, node_mask, edge_mask, None,
            )
            return z, None

        s_indices = jnp.arange(T_DIFF - 1, -1, -1)
        z0, _ = jax.lax.scan(step, z, (s_indices, jax.random.split(k_scan, T_DIFF)))
        return z0, k_final

    return chain


def phase_a(ref, params, cfg, n_eval, seed):
    """Final step + decode on shared z0: paired per-molecule verdicts."""
    gamma_fn = vdm.make_gamma_fn(cfg.diffusion, params)
    per_size = n_eval // len(SIZES)
    rows_j, rows_t = [], []
    max_dxh = 0.0
    final_jit = jax.jit(
        lambda p, k, z0, nm, em: vdm.sample_p_xh_given_z0(
            p, cfg.diffusion, cfg.dynamics, gamma_fn, k, z0, nm, em, None,
            latent_space=True,
        )
    )
    decode_jit = jax.jit(
        lambda p, z, nm, em: vae_mod.decode(p["vae"], cfg.vae, z, nm, em, None)
    )
    for si, n in enumerate(SIZES):
        n = int(n)
        nm = jnp.ones((per_size, n, 1), jnp.float32)
        em_j = jnp.asarray(
            (np.ones((n, n)) - np.eye(n))[None].repeat(per_size, 0)[..., None],
            jnp.float32,
        )
        chain = make_chain_z0(params, cfg, n)
        key = jax.random.key(70_000 + 31 * seed + si)
        z0, k_final = chain(params, key, nm, em_j)
        eps_final = np.asarray(
            vdm.sample_combined_position_feature_noise(k_final, nm, 3, LATENT_NF),
            np.float32,
        )

        # jax side: final step (latent) then decode
        xj, _, hj_int = final_jit(params, k_final, z0, nm, em_j)
        zxh_j = jnp.concatenate([xj, hj_int], axis=2)
        xdj, hcat_j, _ = decode_jit(params, zxh_j, nm, em_j)

        # torch side: SAME z0, SAME eps_final through the reference path
        z0_t = torch.from_numpy(np.asarray(z0, np.float32))
        nm_t = torch.ones(per_size, n, 1)
        em_t = (torch.ones(n, n) - torch.eye(n)).repeat(per_size, 1, 1).view(-1, 1)
        saved = ref.sample_combined_position_feature_noise
        ref.sample_combined_position_feature_noise = DrawQueue([eps_final])
        try:
            with torch.no_grad():
                xt, ht = ref.sample_p_xh_given_z0(z0_t, nm_t, em_t, None)
                zxh_t = torch.cat([xt, ht["categorical"], ht["integer"]], dim=2)
                xdt, hdt = ref.vae.decode(zxh_t, nm_t, em_t, None)
        finally:
            ref.sample_combined_position_feature_noise = saved

        max_dxh = max(max_dxh, float(np.abs(
            np.asarray(zxh_j) - zxh_t.numpy()).max()))
        nm_np = np.asarray(nm)
        rows_j.append(per_molecule_stability(
            np.asarray(xdj), np.asarray(hcat_j), nm_np))
        rows_t.append(per_molecule_stability(
            xdt.numpy(), hdt["categorical"].numpy(), nm_np))
    sj = np.concatenate(rows_j)
    st = np.concatenate(rows_t)
    d_atom = sj[:, 0] - st[:, 0]
    n_mol = len(d_atom)
    mean = float(d_atom.mean())
    half = 1.96 * float(d_atom.std(ddof=1)) / np.sqrt(n_mol)
    discordant = int((d_atom != 0).sum())
    d_mol = sj[:, 1] - st[:, 1]
    return {
        "n_molecules": n_mol,
        "max_abs_dxh": max_dxh,
        "atom_paired_diff": mean,
        "atom_paired_ci": (mean - half, mean + half),
        "atom_discordant_molecules": discordant,
        "mol_paired_diff": float(d_mol.mean()),
        "mol_discordant_molecules": int((d_mol != 0).sum()),
        "atom_jax": float(sj[:, 0].mean()),
        "atom_torch": float(st[:, 0].mean()),
    }


def phase_b(ref, params, cfg, b, seed, record_every=10):
    """Lockstep chains: per-step RMS divergence vs a 1-ulp-class control."""
    n = 5
    gamma_fn = vdm.make_gamma_fn(cfg.diffusion, params)
    nm = jnp.ones((b, n, 1), jnp.float32)
    em_j = jnp.asarray(
        (np.ones((n, n)) - np.eye(n))[None].repeat(b, 0)[..., None], jnp.float32)
    key = jax.random.key(50_000 + seed)
    eps_init, eps_steps, eps_final, (k_init, step_keys, k_final) = \
        replicate_sampler_draws(key, nm, T_DIFF)

    @jax.jit
    def step_jit(params, z, s_idx, k):
        s_arr = jnp.full((b, 1), s_idx, dtype=jnp.float32) / T_DIFF
        t_arr = jnp.full((b, 1), s_idx + 1, dtype=jnp.float32) / T_DIFF
        return vdm.sample_p_zs_given_zt(
            params, cfg.diffusion, cfg.dynamics, gamma_fn, k, s_arr, t_arr,
            z, nm, em_j, None,
        )

    # jax chain + 1e-7-perturbed-init control chain (identical draws)
    z_j = jnp.asarray(eps_init)
    z_c = z_j * (1.0 + 1e-7)
    zs_j, zs_c = [], []
    for i, s_idx in enumerate(range(T_DIFF - 1, -1, -1)):
        z_j = step_jit(params, z_j, s_idx, step_keys[i])
        z_c = step_jit(params, z_c, s_idx, step_keys[i])
        if i % record_every == 0 or s_idx == 0:
            zs_j.append((s_idx, np.asarray(z_j)))
            zs_c.append((s_idx, np.asarray(z_c)))

    # torch chain with the SAME draws
    nm_t = torch.ones(b, n, 1)
    em_t = (torch.ones(n, n) - torch.eye(n)).repeat(b, 1, 1).view(-1, 1)
    saved = ref.sample_combined_position_feature_noise
    ref.sample_combined_position_feature_noise = DrawQueue(eps_steps)
    zs_t = []
    try:
        with torch.no_grad():
            z_t = torch.from_numpy(eps_init)
            for i, s_idx in enumerate(range(T_DIFF - 1, -1, -1)):
                s_arr = torch.full((b, 1), float(s_idx)) / T_DIFF
                t_arr = torch.full((b, 1), float(s_idx + 1)) / T_DIFF
                z_t = ref.sample_p_zs_given_zt(s_arr, t_arr, z_t, nm_t, em_t, None)
                if i % record_every == 0 or s_idx == 0:
                    zs_t.append((s_idx, z_t.numpy()))
    finally:
        ref.sample_combined_position_feature_noise = saved

    rows = []
    for (s_idx, a), (_, c), (_, t) in zip(zs_j, zs_c, zs_t):
        rms = lambda u, v: float(np.sqrt(np.mean((u - v) ** 2)))  # noqa: E731
        rows.append((s_idx, rms(a, t), rms(a, c), float(np.sqrt(np.mean(a**2)))))
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--n_eval", type=int, default=2502)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chain_b", type=int, default=24)
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "docs", "STABILITY_BISECT.md"))
    args = ap.parse_args(argv)
    torch.set_num_threads(max(1, len(os.sched_getaffinity(0))))
    t_start = time.time()

    rng = np.random.default_rng(7)
    batches = [make_batch(rng) for _ in range(args.steps)]
    ref, cfg, _ = build_pair(args.seed)
    ref = train_torch_side(ref, batches, args.seed)
    params = torch_weights_to_jax(ref, LAYERS)

    p0 = phase0_tables(ref, cfg)
    print("phase0:", p0, flush=True)

    pb = phase_b(ref, params, cfg, args.chain_b, args.seed)
    print("phase B (s, rms jax-torch, rms jax-ctrl, rms z):", flush=True)
    for r in pb:
        print(f"  s={r[0]:4d} d_torch={r[1]:.3e} d_ctrl={r[2]:.3e} |z|={r[3]:.3e}",
              flush=True)

    pa = phase_a(ref, params, cfg, args.n_eval, args.seed)
    print("phase A:", pa, flush=True)

    wall = (time.time() - t_start) / 60

    lines = [
        "# STABILITY_BISECT — mechanism hunt for the +0.008 sampler effect",
        "",
        "Deterministic differential tests on the sampler seam "
        "(torch-trained weights W_T on both sides, identical injected "
        "draws; protocol in scripts/stability_bisect_sampler.py). "
        f"Seed {args.seed}, {args.steps} train steps, "
        f"{pa['n_molecules']} paired molecules in Phase A.",
        "",
        "## Phase 0 — schedule tables",
        "",
        f"- max |gamma_jax - gamma_torch| over the {T_DIFF + 1}-entry "
        f"lookup: **{p0['gamma_max_abs_diff']:.2e}**",
        f"- final-step sigma_x(0): jax {p0['sigma_x0_jax']:.8f}, "
        f"torch {p0['sigma_x0_torch']:.8f}",
        "",
        "## Phase A — final step + decode on shared z0",
        "",
        f"- max |d_xh| after the final step (same z0, same eps): "
        f"**{pa['max_abs_dxh']:.2e}**",
        f"- paired atom-stability diff (jax - torch): "
        f"**{pa['atom_paired_diff']:+.5f}** "
        f"[{pa['atom_paired_ci'][0]:+.5f}, {pa['atom_paired_ci'][1]:+.5f}] "
        f"over {pa['n_molecules']} molecules",
        f"- molecules with ANY atom-verdict difference: "
        f"{pa['atom_discordant_molecules']} / {pa['n_molecules']}",
        f"- molecule-stability paired diff: {pa['mol_paired_diff']:+.5f} "
        f"({pa['mol_discordant_molecules']} discordant)",
        f"- cell means: jax {pa['atom_jax']:.4f}, torch {pa['atom_torch']:.4f}",
        "",
        "## Phase B — lockstep chain divergence vs 1e-7 control",
        "",
        "| s | RMS(z_jax - z_torch) | RMS(z_jax - z_ctrl) | RMS(z) |",
        "|---|---|---|---|",
    ]
    for r in pb:
        lines.append(f"| {r[0]} | {r[1]:.3e} | {r[2]:.3e} | {r[3]:.3e} |")
    lines += [
        "",
        f"Wall-clock: {wall:.1f} min on 1 CPU core.",
        "",
        "Reproduce: `JAX_PLATFORMS=cpu python scripts/stability_bisect_sampler.py"
        f" --steps {args.steps} --n_eval {args.n_eval} --seed {args.seed}`",
    ]
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out} ({wall:.1f} min)", flush=True)


if __name__ == "__main__":
    main()

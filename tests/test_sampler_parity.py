"""Multi-step reverse-diffusion rollout parity against the reference.

Both samplers are made deterministic (noise draws patched to zero) and
rolled for several mid-schedule steps from the same state. A full-chain
bitwise comparison is numerically meaningless: with zero noise the map
amplifies by 1/alpha_{t|s} (up to ~22x per step at the schedule tail with
random weights), so f32 reduction-order differences explode identically on
both sides. Mid-schedule multi-step rollouts with relative tolerance are
the strongest well-conditioned check (single-step exactness is covered in
test_model_parity.py).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
if not os.path.isdir("/root/reference"):
    pytest.skip("reference repo not available", allow_module_level=True)
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from egnn.models import EGNN_dynamics_QM9  # noqa: E402
from equivariant_diffusion import utils as ref_utils  # noqa: E402
from equivariant_diffusion.en_diffusion import EnVariationalDiffusion  # noqa: E402

from geoldm_tpu.data.datasets_config import get_dataset_info  # noqa: E402
from geoldm_tpu.diffusion import vdm  # noqa: E402
from geoldm_tpu.models import factory  # noqa: E402
from geoldm_tpu.ops import com  # noqa: E402
from geoldm_tpu.ops.distance import build_edge_mask  # noqa: E402
from tests.parity_utils import dynamics_params_from_torch  # noqa: E402

INFO = get_dataset_info("qm9")
NF, LAYERS, SUBL, T = 32, 2, 1, 20
B, N = 2, 7


def test_multi_step_rollout_parity():
    torch.manual_seed(0)
    in_node_nf = 6
    dyn = EGNN_dynamics_QM9(
        in_node_nf=in_node_nf + 1, context_node_nf=0, n_dims=3, hidden_nf=NF,
        n_layers=LAYERS, attention=True, tanh=True, norm_constant=1.0,
        inv_sublayers=SUBL, sin_embedding=False, normalization_factor=1.0,
        aggregation_method="sum", condition_time=True,
    )
    ref = EnVariationalDiffusion(
        dynamics=dyn, in_node_nf=in_node_nf, n_dims=3, timesteps=T,
        noise_schedule="polynomial_2", noise_precision=1e-5, loss_type="l2",
        norm_values=(1.0, 4.0, 10.0), include_charges=True,
    )
    ref.eval()

    cfg = factory.make_diffusion_model_config(
        INFO, nf=NF, n_layers=LAYERS, inv_sublayers=SUBL, diffusion_steps=T,
        normalization_factor=1.0,
    )
    params = {"dynamics": dynamics_params_from_torch(dyn, LAYERS, SUBL, True)}

    # Masks and a fixed initial z on the CoM subspace.
    node_mask = np.zeros((B, N, 1), dtype=np.float32)
    node_mask[0, :5] = 1.0
    node_mask[1, :7] = 1.0
    rng = np.random.default_rng(0)
    d = 3 + in_node_nf
    z0 = (rng.standard_normal((B, N, d)) * node_mask).astype(np.float32)
    z0[:, :, :3] = np.asarray(
        com.remove_mean_with_mask(jnp.asarray(z0[:, :, :3]), jnp.asarray(node_mask))
    )

    # Zero-noise rollout for several mid-schedule steps (s = 12 .. 8), where
    # 1/alpha_{t|s} amplification is mild.
    orig_cg = ref_utils.sample_center_gravity_zero_gaussian_with_mask
    orig_g = ref_utils.sample_gaussian_with_mask
    ref_utils.sample_center_gravity_zero_gaussian_with_mask = (
        lambda size, device, node_mask: torch.zeros(size)
    )
    ref_utils.sample_gaussian_with_mask = (
        lambda size, device, node_mask: torch.zeros(size)
    )
    orig_sample_normal = vdm.sample_normal
    vdm.sample_normal = (
        lambda key, mu, sigma, node_mask, n_dims, feat_nf, fix_noise=False: mu
    )

    em_flat = node_mask[:, :, None, 0] * node_mask[:, None, :, 0]
    em_flat = em_flat * (1 - np.eye(N, dtype=np.float32)[None])
    gamma_fn = vdm.make_gamma_fn(cfg.diffusion, params)

    z_r = torch.from_numpy(z0.copy())
    z_m = jnp.asarray(z0)
    nm_t = torch.from_numpy(node_mask)
    em_t = torch.from_numpy(em_flat.reshape(-1, 1))
    nm_j = jnp.asarray(node_mask)
    em_j = build_edge_mask(nm_j)
    try:
        for s in range(12, 7, -1):
            s_arr = np.full((B, 1), s / T, dtype=np.float32)
            t_arr = np.full((B, 1), (s + 1) / T, dtype=np.float32)
            with torch.no_grad():
                z_r = ref.sample_p_zs_given_zt(
                    torch.from_numpy(s_arr), torch.from_numpy(t_arr), z_r,
                    nm_t, em_t, None,
                )
            z_m = vdm.sample_p_zs_given_zt(
                params, cfg.diffusion, cfg.dynamics, gamma_fn, jax.random.key(0),
                jnp.asarray(s_arr), jnp.asarray(t_arr), z_m, nm_j, em_j, None,
            )
        scale = float(np.abs(z_r.numpy()).max())
        np.testing.assert_allclose(
            np.asarray(z_m) / scale, z_r.numpy() / scale, atol=5e-3
        )

        # Final decode parity from the shared rolled state.
        with torch.no_grad():
            x_r, h_r = ref.sample_p_xh_given_z0(z_r, nm_t, em_t, None)
        x_m, hc_m, hi_m = vdm.sample_p_xh_given_z0(
            params, cfg.diffusion, cfg.dynamics, gamma_fn, jax.random.key(0),
            z_m, nm_j, em_j, None,
        )
        scale = max(float(np.abs(x_r.numpy()).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(x_m) / scale, x_r.numpy() / scale, atol=5e-3
        )
        np.testing.assert_array_equal(
            np.asarray(hc_m), h_r["categorical"].numpy().astype(np.float32)
        )
    finally:
        ref_utils.sample_center_gravity_zero_gaussian_with_mask = orig_cg
        ref_utils.sample_gaussian_with_mask = orig_g
        vdm.sample_normal = orig_sample_normal

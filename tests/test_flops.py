"""Tests for the analytic FLOP accounting (utils/flops.py)."""

import numpy as np

from geoldm_tpu.config import EGNNConfig
from geoldm_tpu.data.datasets_config import get_dataset_info
from geoldm_tpu.models import factory
from geoldm_tpu.utils import flops as fl


def test_egnn_flops_hand_count_single_block():
    """One block, no attention, plain d^2 edge features: hand-counted."""
    cfg = EGNNConfig(
        in_node_nf=4, out_node_nf=4, hidden_nf=8, n_layers=1,
        inv_sublayers=1, attention=False, sin_embedding=False,
    )
    n, h, e = 5, 8, 2
    pair_first = 2 * (2 * n * h * h) + 2 * n * n * e * h
    gcl = pair_first + 2 * n * n * h * h + 2 * n * 2 * h * h + 2 * n * h * h
    coord = pair_first + 2 * n * n * h * h + 2 * n * n * h
    embed = 2 * n * 4 * h + 2 * n * h * 4
    assert fl.egnn_flops(cfg, n) == embed + gcl + coord


def test_flops_scaling_and_composition():
    info = get_dataset_info("qm9")
    cfg = factory.make_latent_diffusion_config(info, nf=256, n_layers=9)
    # O(N^2) regime: doubling N should grow flops by ~4x (within 2x..4x).
    f16, f32 = fl.sample_flops(cfg, 16), fl.sample_flops(cfg, 32)
    assert 2.5 < f32 / f16 < 4.0
    # Sampling = (T+1) denoiser calls + one decode > T * denoiser.
    dyn = fl.egnn_flops(cfg.dynamics.egnn, 32)
    assert f32 > cfg.diffusion.timesteps * dyn
    # Train step = 3x forward; trainable_ae adds the decoder.
    cfg_t = factory.make_latent_diffusion_config(
        info, nf=256, n_layers=9, trainable_ae=True
    )
    assert fl.train_step_flops(cfg, 32) == 3 * fl.forward_flops(cfg, 32)
    assert fl.forward_flops(cfg_t, 32) == fl.forward_flops(cfg, 32) + fl.egnn_flops(
        cfg_t.vae.decoder_egnn, 32
    )


def test_mfu_and_peak_lookup():
    assert fl.device_peak_flops("TPU v5 lite") == 197e12
    assert fl.device_peak_flops("TPU v5p chip") == 459e12
    assert fl.device_peak_flops("cpu") is None
    assert fl.mfu(1e12, 1.0, "cpu") is None
    got = fl.mfu(197e12, 2.0, "TPU v5 lite")
    assert np.isclose(got, 0.5)

"""Analytic matmul-FLOP accounting for the EGNN models + MFU helpers.

The reference publishes no FLOP/MFU numbers (SURVEY §6); this module gives
the TPU build first-class performance observability: every bench artifact
reports achieved model-FLOP/s against the chip's peak so regressions in the
denoiser are visible as an MFU drop, not just a wall-clock blip.

Conventions (standard MFU accounting):
- Only matmul FLOPs are counted (2*m*k*n per [m,k]x[k,n] contraction) —
  elementwise/VPU work (silu, sigmoid, tanh over the [B,N,N,H] edge grid)
  is excluded even though it is a large share of this model's runtime on
  v5e. MFU here therefore measures MXU utilization.
- Backward pass = 2x forward; rematerialized recompute is NOT counted
  (model FLOPs, not hardware FLOPs), matching the usual MFU convention.
- Peak is the bf16 MXU peak of the chip regardless of the run dtype, so
  numbers are comparable across dtype configs.
"""

from __future__ import annotations

from typing import Optional

from geoldm_tpu.config import EGNNConfig, ModelConfig

# bf16 MXU peak FLOP/s per chip, by jax `device_kind`. Public spec-sheet
# numbers (cloud.google.com/tpu/docs): v4 275T, v5e 197T, v5p 459T,
# v6e (Trillium) 918T.
_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def device_peak_flops(device_kind: str) -> Optional[float]:
    """bf16 peak FLOP/s for a jax device_kind, or None if unknown (CPU)."""
    for key, peak in sorted(_PEAK_FLOPS.items(), key=lambda kv: -len(kv[0])):
        if device_kind.startswith(key):
            return peak
    return None


def egnn_flops(cfg: EGNNConfig, n: int) -> int:
    """Matmul FLOPs of one EGNN forward for ONE molecule padded to n nodes.

    Mirrors nn/egnn.py exactly: the first edge-MLP layer is split into two
    [N,H]x[H,H] node-side matmuls plus one [N^2,E]x[E,H] edge-feature
    matmul (the concat is never materialized), so its cost is O(N H^2),
    not O(N^2 H^2).
    """
    h = cfg.hidden_nf
    e = cfg.edge_feat_nf
    n2 = n * n

    def pair_first_layer() -> int:
        # src + dst [N,H]x[H,H] matmuls + [N^2,E]x[E,H] edge features.
        return 2 * (2 * n * h * h) + 2 * n2 * e * h

    gcl = (
        pair_first_layer()
        + 2 * n2 * h * h  # second edge-MLP layer [N^2,H]x[H,H]
        + (2 * n2 * h if cfg.attention else 0)  # attention gate [N^2,H]x[H,1]
        + 2 * n * (2 * h) * h  # node MLP layer 1 [N,2H]x[2H,H]
        + 2 * n * h * h  # node MLP layer 2
    )
    coord = (
        pair_first_layer()
        + 2 * n2 * h * h  # coord MLP layer 2
        + 2 * n2 * h  # coord MLP layer 3 [N^2,H]x[H,1]
    )
    block = cfg.inv_sublayers * gcl + coord
    embed = 2 * n * cfg.in_node_nf * h + 2 * n * h * cfg.out_node_nf
    return embed + cfg.n_layers * block


def _dynamics_flops(model_cfg: ModelConfig, n: int) -> int:
    return egnn_flops(model_cfg.dynamics.egnn, n)


def sample_flops(model_cfg: ModelConfig, n: int) -> int:
    """Matmul FLOPs to generate ONE molecule at pad n through the full
    reverse process: T denoiser calls (+1 for the t=0 projection) plus, for
    latent diffusion, one VAE decode."""
    t = model_cfg.diffusion.timesteps if model_cfg.diffusion else 0
    total = (t + 1) * _dynamics_flops(model_cfg, n)
    if model_cfg.kind == "latent_diffusion":
        total += egnn_flops(model_cfg.vae.decoder_egnn, n)
    return total


def forward_flops(model_cfg: ModelConfig, n: int) -> int:
    """Matmul FLOPs of one training-loss forward for ONE molecule at pad n."""
    kind = model_cfg.kind
    if kind == "diffusion":
        return _dynamics_flops(model_cfg, n)
    if kind == "vae":
        return egnn_flops(model_cfg.vae.encoder_egnn, n) + egnn_flops(
            model_cfg.vae.decoder_egnn, n
        )
    if kind == "latent_diffusion":
        total = egnn_flops(model_cfg.vae.encoder_egnn, n) + _dynamics_flops(
            model_cfg, n
        )
        if model_cfg.trainable_ae:
            total += egnn_flops(model_cfg.vae.decoder_egnn, n)
        return total
    raise ValueError(kind)


def train_step_flops(model_cfg: ModelConfig, n: int) -> int:
    """Model FLOPs of one train step for ONE molecule: fwd + 2x bwd.

    Remat recompute is intentionally excluded (see module docstring)."""
    return 3 * forward_flops(model_cfg, n)


def mfu(total_flops: float, seconds: float, device_kind: str) -> Optional[float]:
    """Achieved model-FLOP/s divided by the chip's bf16 peak; None on CPU."""
    peak = device_peak_flops(device_kind)
    if peak is None or seconds <= 0:
        return None
    return total_flops / seconds / peak

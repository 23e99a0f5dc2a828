"""Typed configuration for geoldm-tpu.

Replaces the reference's argparse-flag surface and pickled-args persistence
(reference: main_qm9.py:23-133, main_geom_drugs.py:25-131, and the
"args.pickle travels with the checkpoint" convention at main_qm9.py:147-171)
with frozen dataclasses serialized as JSON next to checkpoints.

All dataclasses are frozen (hashable) so they can be closed over by, or passed
as static arguments to, ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


@dataclass(frozen=True)
class EGNNConfig:
    """Architecture of one dense-masked EGNN stack.

    Mirrors the constructor surface of the reference EGNN
    (reference: egnn/egnn_new.py:150-182) — hidden size, block count,
    invariant sublayers, attention gate, tanh-clamped coordinate updates,
    distance normalisation constant, sinusoidal distance embedding and the
    aggregation normalisation.
    """

    in_node_nf: int
    out_node_nf: int
    hidden_nf: int = 256
    n_layers: int = 9
    inv_sublayers: int = 1
    attention: bool = True
    tanh: bool = True
    coords_range: float = 15.0
    norm_constant: float = 1.0
    sin_embedding: bool = False
    normalization_factor: float = 1.0
    aggregation_method: str = "sum"  # 'sum' (divide by normalization_factor) | 'mean'
    # Rematerialize each EquivariantBlock in the backward pass (trade one
    # extra forward for not storing the [B,N,N,H] edge activations of every
    # block — required for GEOM-scale molecules, N up to 181).
    remat: bool = False

    @property
    def coords_range_layer(self) -> float:
        # The reference computes coords_range/n_layers (egnn_new.py:160) but
        # that attribute is never used: EGNN passes the UNDIVIDED
        # coords_range to every EquivariantBlock (egnn_new.py:175-181, block
        # ctor :116), so the effective per-block tanh multiplier is the full
        # value. Matched here for parity (verified by a 2x vel discrepancy
        # otherwise at normalization_factor=1).
        return float(self.coords_range)

    @property
    def edge_feat_nf(self) -> int:
        # Distance features are fed both from the initial coordinates and
        # recomputed per block (reference: egnn/egnn_new.py:139,:184-191).
        if self.sin_embedding:
            from geoldm_tpu.ops.distance import SIN_EMBEDDING_DIM

            return 2 * SIN_EMBEDDING_DIM
        return 2


@dataclass(frozen=True)
class DynamicsConfig:
    """The denoiser wrapper: time/context conditioning around an EGNN.

    reference: egnn/models.py:8-47 (EGNN_dynamics_QM9 constructor).
    """

    in_node_nf: int  # features of the diffused variable (incl. charges / latent_nf)
    context_node_nf: int = 0
    n_dims: int = 3
    condition_time: bool = True
    mode: str = "egnn_dynamics"  # 'egnn_dynamics' | 'gnn_dynamics'
    egnn: EGNNConfig = None  # type: ignore[assignment]


@dataclass(frozen=True)
class VAEConfig:
    """First-stage E(n) hierarchical VAE (reference: en_diffusion.py:858-1048).

    ``encoder``/``decoder`` are the EGNN wrapper configs
    (reference: egnn/models.py:137-284 encoder, :287-402 decoder;
    built by qm9/models.py:54-100 with encoder n_layers=1).
    """

    in_node_nf: int  # atom-type classes + include_charges
    latent_nf: int = 1
    n_dims: int = 3
    kl_weight: float = 0.01
    include_charges: bool = True
    encoder_egnn: EGNNConfig = None  # type: ignore[assignment]
    decoder_egnn: EGNNConfig = None  # type: ignore[assignment]
    context_node_nf: int = 0
    # Fixed posterior std used when encoding (reference: en_diffusion.py:1012-1013).
    encoder_sigma: float = 0.0032

    @property
    def num_classes(self) -> int:
        return self.in_node_nf - int(self.include_charges)


@dataclass(frozen=True)
class DiffusionConfig:
    """E(n) variational diffusion (reference: en_diffusion.py:254-296)."""

    in_node_nf: int  # feature dims of the diffused variable
    n_dims: int = 3
    timesteps: int = 1000
    noise_schedule: str = "polynomial_2"  # 'polynomial_<p>' | 'cosine' | 'learned'
    noise_precision: float = 1e-5
    loss_type: str = "l2"  # 'l2' | 'vlb'
    norm_values: Tuple[float, float, float] = (1.0, 4.0, 10.0)
    norm_biases: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    include_charges: bool = True
    parametrization: str = "eps"

    @property
    def num_classes(self) -> int:
        return self.in_node_nf - int(self.include_charges)


@dataclass(frozen=True)
class ModelConfig:
    """Top-level generative model: probabilistic model + stages.

    ``kind`` selects between the plain diffusion model over (x, h), the
    first-stage VAE alone, and the latent diffusion composition
    (reference factories: qm9/models.py:12, :54, :103).
    """

    kind: str = "latent_diffusion"  # 'diffusion' | 'vae' | 'latent_diffusion'
    diffusion: Optional[DiffusionConfig] = None
    dynamics: Optional[DynamicsConfig] = None
    vae: Optional[VAEConfig] = None
    trainable_ae: bool = False
    # Context carries a trailing is-conditioned channel (1 = conditioned,
    # 0 = null): disambiguates the classifier-free-guidance null condition
    # from "property equals the dataset mean" (properties are mean/MAD
    # normalized, so an all-zero property context IS the mean). Set by the
    # factories when context_indicator=True; context_node_nf then includes
    # the extra channel.
    context_indicator: bool = False


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "qm9"  # 'qm9' | 'qm9_second_half' | 'geom' | 'qm9_first_half'
    datadir: str = "data"
    remove_h: bool = False
    include_charges: bool = True
    batch_size: int = 64
    # Pad every batch to this many nodes (static shapes under jit). If 0, use
    # the dataset's max_n_nodes.
    pad_nodes: int = 0
    filter_n_atoms: int = 0  # 0 = off
    filter_molecule_size: int = 0  # GEOM only; 0 = off
    shuffle: bool = True
    subtract_thermo: bool = True
    force_download: bool = False
    conditioning: Tuple[str, ...] = ()


@dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-4
    n_epochs: int = 3000
    ema_decay: float = 0.9999
    clip_grad: bool = True
    weight_decay: float = 1e-12
    test_epochs: int = 10
    n_stability_samples: int = 500
    augment_noise: float = 0.0
    data_augmentation: bool = False
    # Classifier-free guidance training: probability of replacing a
    # molecule's context with the all-zero null condition per step, so
    # sampling can apply guidance_scale != 1 (vdm.guided_eps). 0 = off.
    context_dropout: float = 0.0
    break_train_epoch: bool = False
    seed: int = 0
    # Mixed precision for the EGNN compute path ('float32' or 'bfloat16').
    compute_dtype: str = "float32"
    # Mesh axes: data-parallel size 0 = use all devices.
    dp: int = 0
    tp: int = 1
    # Sequence-parallel devices (atom-row sharding of the EGNN pair grid
    # over a ``seq`` mesh axis; composes with dp). 1 = off.
    sp: int = 1


@dataclass(frozen=True)
class ExperimentConfig:
    exp_name: str = "geoldm_tpu"
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)


# ---------------------------------------------------------------------------
# JSON (de)serialization — the "config travels with the checkpoint" behavior.
# ---------------------------------------------------------------------------

_CONFIG_TYPES = {
    cls.__name__: cls
    for cls in (
        EGNNConfig,
        DynamicsConfig,
        VAEConfig,
        DiffusionConfig,
        ModelConfig,
        DataConfig,
        TrainConfig,
        ExperimentConfig,
    )
}


def to_dict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg):
        out = {"__type__": type(cfg).__name__}
        for f in dataclasses.fields(cfg):
            out[f.name] = to_dict(getattr(cfg, f.name))
        return out
    if isinstance(cfg, tuple):
        return {"__tuple__": [to_dict(v) for v in cfg]}
    if isinstance(cfg, list):
        return [to_dict(v) for v in cfg]
    return cfg


def from_dict(obj: Any) -> Any:
    if isinstance(obj, dict) and "__type__" in obj:
        cls = _CONFIG_TYPES[obj["__type__"]]
        kwargs = {k: from_dict(v) for k, v in obj.items() if k != "__type__"}
        known = {f.name for f in dataclasses.fields(cls)}
        # Forward compatibility: ignore unknown fields from newer configs.
        kwargs = {k: v for k, v in kwargs.items() if k in known}
        return cls(**kwargs)
    if isinstance(obj, dict) and "__tuple__" in obj:
        return tuple(from_dict(v) for v in obj["__tuple__"])
    if isinstance(obj, list):
        return [from_dict(v) for v in obj]
    return obj


def dumps(cfg: Any, **kwargs: Any) -> str:
    kwargs.setdefault("indent", 2)
    return json.dumps(to_dict(cfg), **kwargs)


def loads(s: str) -> Any:
    return from_dict(json.loads(s))


def save(cfg: Any, path: str) -> None:
    with open(path, "w") as f:
        f.write(dumps(cfg))


def load(path: str) -> Any:
    with open(path) as f:
        return loads(f.read())


def replace(cfg: Any, **kwargs: Any) -> Any:
    return dataclasses.replace(cfg, **kwargs)

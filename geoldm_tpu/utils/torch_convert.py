"""Convert released GeoLDM PyTorch checkpoints into geoldm-tpu param pytrees.

The reference saves ``torch.save(model.state_dict())`` as
``generative_model[_ema].npy`` next to a pickled argparse namespace
(``args.pickle``) — reference utils.py:20-26, main_qm9.py:283-298. This
module maps those state dicts (by key pattern, no reference code needed)
into this framework's functional param pytrees, and maps the pickled args
into a ModelConfig, so a released checkpoint can be evaluated directly with
eval_analyze / eval_sample.

Weight layout notes: torch nn.Linear stores [out, in]; we store
w = weight.T ([in, out]) plus b. EGNN blocks are scan-stacked along a
leading layer axis (nn/egnn.py), so per-block trees are stacked with
np.stack. Module names follow egnn/egnn_new.py (e_block_i, gcl_j,
gcl_equiv.coord_mlp) and egnn/models.py (egnn, final_mlp).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _strip_module_prefix(sd: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Drop DataParallel's 'module.' prefix and convert tensors to numpy."""
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    return out


class _Consumer:
    """Tracks which state-dict keys were consumed, for a readable error on
    layout mismatch (wrong n_layers / attention / model kind)."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.used = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            near = [k for k in self.sd if k.startswith(key.rsplit(".", 2)[0])][:5]
            raise KeyError(
                f"checkpoint is missing '{key}' — the config does not match the "
                f"checkpoint layout. Nearby keys: {near}"
            )
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    def unused(self, prefix: str = "") -> list:
        return sorted(
            k for k in self.sd
            if k not in self.used and k.startswith(prefix)
            and k.split(".")[-1] not in ("gamma", "buffer")  # schedule/dummy buffers
        )


def _lin(c: _Consumer, prefix: str) -> Dict[str, np.ndarray]:
    p = {"w": c.take(prefix + ".weight").T.copy()}
    if c.has(prefix + ".bias"):
        p["b"] = c.take(prefix + ".bias")
    return p


def egnn_params_from_state_dict(
    c: _Consumer, prefix: str, n_layers: int, inv_sublayers: int, attention: bool
) -> Dict[str, Any]:
    """Modern-EGNN weights (egnn/egnn_new.py layout) -> scan-stacked pytree."""
    blocks = []
    for i in range(n_layers):
        bp = f"{prefix}e_block_{i}."
        gcls = []
        for j in range(inv_sublayers):
            gp = f"{bp}gcl_{j}."
            p = {
                "edge_mlp": (_lin(c, gp + "edge_mlp.0"), _lin(c, gp + "edge_mlp.2")),
                "node_mlp": (_lin(c, gp + "node_mlp.0"), _lin(c, gp + "node_mlp.2")),
            }
            if attention:
                p["att_mlp"] = _lin(c, gp + "att_mlp.0")
            gcls.append(p)
        blocks.append(
            {
                "gcls": tuple(gcls),
                "coord_mlp": (
                    _lin(c, bp + "gcl_equiv.coord_mlp.0"),
                    _lin(c, bp + "gcl_equiv.coord_mlp.2"),
                    _lin(c, bp + "gcl_equiv.coord_mlp.4"),
                ),
            }
        )
    import jax

    return {
        "embedding": _lin(c, prefix + "embedding"),
        "embedding_out": _lin(c, prefix + "embedding_out"),
        "blocks": jax.tree.map(lambda *xs: np.stack(xs), *blocks),
    }


def gamma_params_from_state_dict(c: _Consumer, prefix: str = "gamma.") -> Dict[str, Any]:
    """Learned GammaNetwork (reference en_diffusion.py:210-247)."""
    return {
        "l1": _lin(c, prefix + "l1"),
        "l2": _lin(c, prefix + "l2"),
        "l3": _lin(c, prefix + "l3"),
        "gamma_0": c.take(prefix + "gamma_0"),
        "gamma_1": c.take(prefix + "gamma_1"),
    }


def params_from_reference_state_dict(sd: Mapping[str, Any], model_cfg) -> Dict[str, Any]:
    """Map a reference state dict onto a param pytree matching
    factory.init_params(model_cfg). Raises with readable context when the
    layouts disagree; warns (prints) on unconsumed weight keys."""
    c = _Consumer(_strip_module_prefix(sd))
    e = model_cfg.dynamics.egnn if model_cfg.kind != "vae" else None

    def _egnn(prefix, cfg_egnn, n_layers):
        return egnn_params_from_state_dict(
            c, prefix, n_layers, cfg_egnn.inv_sublayers, cfg_egnn.attention
        )

    params: Dict[str, Any] = {}
    if model_cfg.kind in ("diffusion", "latent_diffusion"):
        params["dynamics"] = {"egnn": _egnn("dynamics.egnn.", e, e.n_layers)}
        if model_cfg.diffusion.noise_schedule == "learned":
            params["gamma"] = gamma_params_from_state_dict(c)
    if model_cfg.kind in ("vae", "latent_diffusion"):
        vp = "vae." if model_cfg.kind == "latent_diffusion" else ""
        enc_e = model_cfg.vae.encoder_egnn
        dec_e = model_cfg.vae.decoder_egnn
        params_vae = {
            "encoder": {
                "egnn": _egnn(f"{vp}encoder.egnn.", enc_e, enc_e.n_layers),
                "final_mlp": (
                    _lin(c, f"{vp}encoder.final_mlp.0"),
                    _lin(c, f"{vp}encoder.final_mlp.2"),
                ),
            },
            "decoder": {"egnn": _egnn(f"{vp}decoder.egnn.", dec_e, dec_e.n_layers)},
        }
        if model_cfg.kind == "latent_diffusion":
            params["vae"] = params_vae
        else:
            params = params_vae

    leftovers = c.unused()
    if leftovers:
        print(f"warning: {len(leftovers)} unconsumed checkpoint keys, e.g. "
              f"{leftovers[:5]}")
    return params


def model_config_from_reference_args(args: Any, dataset_info):
    """Pickled reference argparse namespace -> ModelConfig.

    Mirrors qm9/models.py:12-166 (get_model / get_autoencoder /
    get_latent_diffusion) including the back-compat shims for args saved
    before normalization_factor/aggregation_method existed
    (qm9/models.py:112-116)."""
    from geoldm_tpu.models import factory

    g = lambda name, default: getattr(args, name, default)
    common = dict(
        include_charges=g("include_charges", True),
        context_node_nf=g("context_node_nf", 0),
        nf=g("nf", 256),
        n_layers=g("n_layers", 9),
        latent_nf=g("latent_nf", 1),
        kl_weight=g("kl_weight", 0.01),
        attention=g("attention", True),
        tanh=g("tanh", True),
        norm_constant=g("norm_constant", 1.0),
        inv_sublayers=g("inv_sublayers", 1),
        sin_embedding=g("sin_embedding", False),
        normalization_factor=g("normalization_factor", 1),
        aggregation_method=g("aggregation_method", "sum"),
    )
    if g("train_diffusion", False):
        return factory.make_latent_diffusion_config(
            dataset_info,
            condition_time=g("condition_time", True),
            trainable_ae=g("trainable_ae", False),
            diffusion_steps=g("diffusion_steps", 1000),
            noise_schedule=g("diffusion_noise_schedule", "polynomial_2"),
            noise_precision=g("diffusion_noise_precision", 1e-5),
            loss_type=g("diffusion_loss_type", "l2"),
            normalize_factors=tuple(g("normalize_factors", (1.0, 4.0, 10.0))),
            model=g("model", "egnn_dynamics"),
            **common,
        )
    return factory.make_vae_config(dataset_info, **common)

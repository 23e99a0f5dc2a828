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
        # copy=True: .numpy() is a view of the torch storage, and jax's CPU
        # backend can zero-copy alias numpy arrays — without the copy, a
        # later in-place torch update (optimizer step) would silently mutate
        # the converted weights.
        out[k] = np.array(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v, copy=True
        )
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


# ---------------------------------------------------------------------------
# Reverse direction: geoldm-tpu params -> reference state dict (export)
# ---------------------------------------------------------------------------


def _unstack_blocks(blocks) -> list:
    """Invert the scan-stacking: leading layer axis -> list of per-layer
    pytrees."""
    import jax

    n = jax.tree.leaves(blocks)[0].shape[0]
    return [jax.tree.map(lambda x: np.asarray(x)[i], blocks) for i in range(n)]


def _lin_out(out: Dict[str, np.ndarray], prefix: str, p: Dict[str, Any]) -> None:
    out[prefix + ".weight"] = np.ascontiguousarray(np.asarray(p["w"]).T)
    if "b" in p:
        out[prefix + ".bias"] = np.asarray(p["b"])


def egnn_state_dict_from_params(
    out: Dict[str, np.ndarray], prefix: str, egnn_params: Dict[str, Any],
    attention: bool,
) -> None:
    """Inverse of egnn_params_from_state_dict: scan-stacked pytree ->
    reference egnn/egnn_new.py key layout."""
    _lin_out(out, prefix + "embedding", egnn_params["embedding"])
    _lin_out(out, prefix + "embedding_out", egnn_params["embedding_out"])
    for i, blk in enumerate(_unstack_blocks(egnn_params["blocks"])):
        bp = f"{prefix}e_block_{i}."
        for j, g in enumerate(blk["gcls"]):
            gp = f"{bp}gcl_{j}."
            _lin_out(out, gp + "edge_mlp.0", g["edge_mlp"][0])
            _lin_out(out, gp + "edge_mlp.2", g["edge_mlp"][1])
            _lin_out(out, gp + "node_mlp.0", g["node_mlp"][0])
            _lin_out(out, gp + "node_mlp.2", g["node_mlp"][1])
            if attention:
                _lin_out(out, gp + "att_mlp.0", g["att_mlp"])
        for k, idx in enumerate((0, 2, 4)):
            _lin_out(out, f"{bp}gcl_equiv.coord_mlp.{idx}", blk["coord_mlp"][k])


def state_dict_from_params(params: Dict[str, Any], model_cfg) -> Dict[str, np.ndarray]:
    """Map a geoldm-tpu param pytree back onto the reference's
    ``model.state_dict()`` key layout (numpy values; wrap with torch.tensor
    for torch.save). Includes the reference's non-trainable entries — the
    fixed-schedule gamma lookup table and the dummy ``buffer`` — so
    ``load_state_dict(..., strict=True)`` passes on a freshly built
    reference model."""
    from geoldm_tpu.diffusion.schedules import gamma_table

    out: Dict[str, np.ndarray] = {}
    if model_cfg.kind in ("diffusion", "latent_diffusion"):
        d = model_cfg.diffusion
        out["buffer"] = np.zeros(1, dtype=np.float32)  # en_diffusion.py:294
        if d.noise_schedule == "learned":
            g = params["gamma"]
            for name in ("l1", "l2", "l3"):
                _lin_out(out, f"gamma.{name}", g[name])
            out["gamma.gamma_0"] = np.asarray(g["gamma_0"])
            out["gamma.gamma_1"] = np.asarray(g["gamma_1"])
        else:
            out["gamma.gamma"] = gamma_table(
                d.noise_schedule, d.timesteps, d.noise_precision
            ).astype(np.float32)
        e = model_cfg.dynamics.egnn
        egnn_state_dict_from_params(
            out, "dynamics.egnn.", params["dynamics"]["egnn"], e.attention)
    if model_cfg.kind in ("vae", "latent_diffusion"):
        vp = "vae." if model_cfg.kind == "latent_diffusion" else ""
        vparams = params["vae"] if model_cfg.kind == "latent_diffusion" else params
        out[vp + "buffer"] = np.zeros(1, dtype=np.float32)  # en_diffusion.py:885
        enc = vparams["encoder"]
        egnn_state_dict_from_params(
            out, f"{vp}encoder.egnn.", enc["egnn"],
            model_cfg.vae.encoder_egnn.attention)
        _lin_out(out, f"{vp}encoder.final_mlp.0", enc["final_mlp"][0])
        _lin_out(out, f"{vp}encoder.final_mlp.2", enc["final_mlp"][1])
        egnn_state_dict_from_params(
            out, f"{vp}decoder.egnn.", vparams["decoder"]["egnn"],
            model_cfg.vae.decoder_egnn.attention)
    return out


def reference_args_from_model_config(model_cfg, dataset: str = "qm9",
                                     remove_h: bool = False,
                                     conditioning=(),
                                     ema_decay=None):
    """ModelConfig -> an argparse.Namespace in the reference's args.pickle
    shape, inverse of model_config_from_reference_args (round-trip tested).
    Model-architecture fields plus the attributes the reference's model
    builders read (qm9/models.py get_model/get_autoencoder/
    get_latent_diffusion: conditioning, probabilistic_model, ae_path) are
    populated — training hyperparameters are not part of a weights export.
    ``conditioning`` must list the property names the context channels were
    trained on if context_node_nf > 0 (we store only the channel count).
    ``ema_decay`` is the real decay the checkpoint was trained with
    (checkpoints store only the ModelConfig, not TrainConfig, so it must
    be supplied by the caller); None falls back to the reference default
    0.9999 with a printed warning, since upstream tooling reads this field
    (e.g. --ae_path reuse picks the ema weights file when it's > 0)."""
    import argparse

    if ema_decay is None:
        ema_decay = 0.9999
        print("warning: --ema_decay not given; writing the reference "
              "default 0.9999 into args.pickle — pass the checkpoint's "
              "real training decay (0 for non-EMA) if it differed")

    kind = model_cfg.kind
    if getattr(model_cfg, "context_indicator", False):
        raise ValueError(
            "this checkpoint was trained with the CFG is-conditioned "
            "context channel (context_indicator=True); the reference has "
            "no equivalent — its context_node_nf would not match "
            "len(conditioning)"
        )
    if kind == "diffusion":
        raise ValueError(
            "the reference args.pickle layout has no pure-VDM shape "
            "(qm9/models.py builds the latent model whenever "
            "train_diffusion is set) — export latent_diffusion or vae "
            "checkpoints"
        )
    e = (model_cfg.dynamics.egnn if kind != "vae"
         else model_cfg.vae.decoder_egnn)
    vae = model_cfg.vae
    ctx_nf = (model_cfg.dynamics.context_node_nf
              if model_cfg.dynamics is not None else vae.context_node_nf)
    if ctx_nf > 0 and not conditioning:
        print(f"warning: model has context_node_nf={ctx_nf} but no "
              "--conditioning property names given; the reference's eval "
              "scripts need them to rebuild the context")
    ns = argparse.Namespace(
        dataset=dataset,
        remove_h=remove_h,
        conditioning=list(conditioning),
        ae_path=None,
        cuda=False,  # qm9/models.py:118 picks the device from this
        ema_decay=float(ema_decay),
        include_charges=(vae.include_charges if vae is not None
                         else model_cfg.diffusion.include_charges),
        context_node_nf=ctx_nf,
        nf=e.hidden_nf,
        n_layers=e.n_layers,
        latent_nf=vae.latent_nf if vae is not None else 1,
        kl_weight=vae.kl_weight if vae is not None else 0.01,
        attention=e.attention,
        tanh=e.tanh,
        norm_constant=e.norm_constant,
        inv_sublayers=e.inv_sublayers,
        sin_embedding=e.sin_embedding,
        normalization_factor=e.normalization_factor,
        aggregation_method=e.aggregation_method,
        train_diffusion=kind in ("diffusion", "latent_diffusion"),
        trainable_ae=model_cfg.trainable_ae,
    )
    ns.model = (model_cfg.dynamics.mode if model_cfg.dynamics is not None
                else "egnn_dynamics")
    if kind in ("diffusion", "latent_diffusion"):
        d = model_cfg.diffusion
        ns.probabilistic_model = "diffusion"
        ns.condition_time = model_cfg.dynamics.condition_time
        ns.diffusion_steps = d.timesteps
        ns.diffusion_noise_schedule = d.noise_schedule
        ns.diffusion_noise_precision = d.noise_precision
        ns.diffusion_loss_type = d.loss_type
        ns.normalize_factors = tuple(d.norm_values)
    return ns


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

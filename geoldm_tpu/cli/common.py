"""Shared CLI plumbing: argparse surface -> typed configs -> training run.

Mirrors the reference flag surface (main_qm9.py:23-133 / main_geom_drugs.py:
25-131) so reference users can bring their commands across, but everything
lands in the frozen dataclass config tree (persisted as JSON with
checkpoints) instead of pickled argparse namespaces.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def add_model_args(p: argparse.ArgumentParser, qm9_defaults: bool = True) -> None:
    d = {
        "nf": 256 if qm9_defaults else 256,
        "n_layers": 9 if qm9_defaults else 4,
        "lr": 1e-4 if qm9_defaults else 5e-5,
        "batch_size": 64 if qm9_defaults else 32,
        "latent_nf": 1 if qm9_defaults else 2,
        "normalization_factor": 1.0,
    }
    p.add_argument("--exp_name", type=str, default="geoldm_tpu_run")
    p.add_argument("--model", type=str, default="egnn_dynamics",
                   choices=["egnn_dynamics", "gnn_dynamics"])
    p.add_argument("--probabilistic_model", type=str, default="diffusion")
    p.add_argument("--diffusion_steps", type=int, default=1000)
    p.add_argument("--diffusion_noise_schedule", type=str, default="polynomial_2")
    p.add_argument("--diffusion_noise_precision", type=float, default=1e-5)
    p.add_argument("--diffusion_loss_type", type=str, default="l2", choices=["vlb", "l2"])
    p.add_argument("--n_epochs", type=int, default=3000)
    p.add_argument("--batch_size", type=int, default=d["batch_size"])
    p.add_argument("--lr", type=float, default=d["lr"])
    p.add_argument("--break_train_epoch", type=eval, default=False)
    p.add_argument("--dp", type=int, default=0, help="data-parallel devices (0=all)")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel devices")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel devices: shard the EGNN's O(N^2) "
                        "pair grid over atom rows (composes with --dp; "
                        "pays off at GEOM-scale molecules). Combining with "
                        "a pallas compute dtype is validated in interpret "
                        "mode and via real-chip Mosaic kernel tests "
                        "(tests/test_pallas_tpu.py); run one train-step "
                        "compile on your mesh before a long production run")
    p.add_argument("--condition_time", type=eval, default=True)
    p.add_argument("--clip_grad", type=eval, default=True)
    p.add_argument("--trace", type=str, default=None,
                   help="jax profiler trace dir (enables per-epoch traces)")
    p.add_argument("--n_layers", type=int, default=d["n_layers"])
    p.add_argument("--inv_sublayers", type=int, default=1)
    p.add_argument("--nf", type=int, default=d["nf"])
    p.add_argument("--tanh", type=eval, default=True)
    p.add_argument("--attention", type=eval, default=True)
    p.add_argument("--norm_constant", type=float, default=1.0)
    p.add_argument("--sin_embedding", type=eval, default=False)
    p.add_argument("--remat", type=eval, default=None,
                   help="rematerialize EGNN blocks in backward (default on; "
                        "flagship configs OOM without it)")
    p.add_argument("--ode_regularization", type=float, default=1e-3)
    p.add_argument("--trainable_ae", action="store_true")
    p.add_argument("--latent_nf", type=int, default=d["latent_nf"])
    p.add_argument("--kl_weight", type=float, default=0.01)
    p.add_argument("--ae_path", type=str, default=None,
                   help="checkpoint dir of a pre-trained first-stage VAE")
    p.add_argument("--train_diffusion", action="store_true",
                   help="train the latent diffusion (else: train the VAE)")
    p.add_argument("--dequantization", type=str, default="argmax_variational")
    p.add_argument("--n_report_steps", type=int, default=50)
    p.add_argument("--no_wandb", action="store_true")
    p.add_argument("--online", type=eval, default=True)
    p.add_argument("--wandb_usr", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--test_epochs", type=int, default=10)
    p.add_argument("--save_model", type=eval, default=True)
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--prefetch", type=int, default=2,
                   help="host batch-prep lookahead depth (one background "
                        "thread overlaps prep/transfer with the device "
                        "step; 0 = serial loop, identical results)")
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--augment_noise", type=float, default=0.0)
    p.add_argument("--context_dropout", type=float, default=0.0,
                   help="classifier-free guidance training: probability of "
                        "nulling a molecule's conditioning context per step "
                        "(enables --cfg_scale at sampling time)")
    p.add_argument("--n_stability_samples", type=int, default=500)
    p.add_argument("--eval_n_steps", type=int, default=None,
                   help="few-step DDIM sampling for the PERIODIC in-training "
                        "stability analysis only (cuts test-epoch wall clock "
                        "~T/K-fold; final eval_analyze still defaults to the "
                        "full-T protocol)")
    p.add_argument("--normalize_factors", type=eval, default=[1, 4, 10])
    # Reference defaults diverge: True for QM9 (main_qm9.py:125), False for
    # GEOM (main_geom_drugs.py:121) — a spurious always-zero charge channel
    # would change in_node_nf and break reference-checkpoint compatibility.
    p.add_argument("--include_charges", type=eval, default=qm9_defaults)
    p.add_argument("--visualize_every_batch", type=int, default=int(1e8))
    p.add_argument("--visualize", type=eval, default=False,
                   help="save a molecule grid + chain gif at every test epoch")
    p.add_argument("--normalization_factor", type=float, default=d["normalization_factor"])
    p.add_argument("--aggregation_method", type=str, default="sum")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16", "pallas", "bfloat16_pallas"])
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--data_augmentation", type=eval, default=False)
    p.add_argument("--conditioning", nargs="+", default=[],
                   help="properties to condition on: alpha gap homo lumo mu Cv")
    p.add_argument("--outdir", type=str, default="outputs")


def build_model_config(args, dataset_info):
    from geoldm_tpu.models import factory

    # Default remat ON: without it the flagship QM9 training config
    # (bs 64, nf 256, 9+9 EGNN blocks) exceeds a single v5e's 16GB HBM in
    # the backward pass (measured); remat stores only block boundaries.
    remat = args.remat if args.remat is not None else True
    common = dict(
        include_charges=args.include_charges,
        remat=remat,
        context_node_nf=len(args.conditioning),
        # CFG training disambiguates its null from the mean property via a
        # trailing is-conditioned channel (config.ModelConfig docstring).
        context_indicator=bool(args.conditioning
                               and getattr(args, "context_dropout", 0.0) > 0),
        nf=args.nf,
        n_layers=args.n_layers,
        attention=args.attention,
        tanh=args.tanh,
        norm_constant=args.norm_constant,
        inv_sublayers=args.inv_sublayers,
        sin_embedding=args.sin_embedding,
        normalization_factor=args.normalization_factor,
        aggregation_method=args.aggregation_method,
    )
    diff = dict(
        diffusion_steps=args.diffusion_steps,
        noise_schedule=args.diffusion_noise_schedule,
        noise_precision=args.diffusion_noise_precision,
        loss_type=args.diffusion_loss_type,
        normalize_factors=tuple(float(v) for v in args.normalize_factors),
        model=args.model,
        condition_time=args.condition_time,
    )
    if args.train_diffusion:
        return factory.make_latent_diffusion_config(
            dataset_info, latent_nf=args.latent_nf, kl_weight=args.kl_weight,
            trainable_ae=args.trainable_ae, **common, **diff,
        )
    return factory.make_vae_config(
        dataset_info, latent_nf=args.latent_nf, kl_weight=args.kl_weight, **common
    )


def run_training(args, dataset_info, splits, charge_scale, loaders=None) -> None:
    """Shared train loop driver for QM9 and GEOM entry points.

    ``loaders`` overrides the default QM9Loader construction (the GEOM entry
    point passes size-bucketed GeomLoaders and splits=None)."""
    import jax

    from geoldm_tpu.utils.jaxcache import setup_compilation_cache

    setup_compilation_cache()

    from geoldm_tpu.config import TrainConfig
    from geoldm_tpu.data.qm9 import QM9Loader
    from geoldm_tpu.models.distributions import DistributionNodes, DistributionProperty
    from geoldm_tpu.parallel import sharding as shd
    from geoldm_tpu.train import conditioning as cond
    from geoldm_tpu.train import trainer as trainer_mod
    from geoldm_tpu.train.train_step import (
        create_train_state,
        make_eval_nll,
        make_train_step,
    )
    from geoldm_tpu.utils import checkpoint as ckpt
    from geoldm_tpu.utils.logging_utils import MetricLogger

    model_cfg = build_model_config(args, dataset_info)
    if args.resume:
        # The config travels with the checkpoint and wins over CLI flags on
        # resume (the reference's pickled-args override, main_qm9.py:147-171).
        resumed_cfg = ckpt.load_config(args.resume)
        if resumed_cfg != model_cfg:
            print("resume: using the checkpoint's model config (overrides CLI)")
            model_cfg = resumed_cfg
    train_cfg = TrainConfig(
        lr=args.lr,
        n_epochs=args.n_epochs,
        ema_decay=args.ema_decay,
        clip_grad=args.clip_grad,
        test_epochs=args.test_epochs,
        n_stability_samples=args.n_stability_samples,
        augment_noise=args.augment_noise,
        context_dropout=getattr(args, "context_dropout", 0.0),
        data_augmentation=args.data_augmentation,
        break_train_epoch=args.break_train_epoch,
        seed=args.seed,
        compute_dtype=args.compute_dtype,
        dp=args.dp,
        tp=args.tp,
        sp=getattr(args, "sp", 1),
    )
    # Passed as the resolve_compute string: selects operand dtype AND the
    # XLA-vs-fused-Pallas backend ("pallas" was previously dropped here,
    # silently training on the XLA path).
    compute_dtype = None if args.compute_dtype == "float32" else args.compute_dtype

    pad_nodes = dataset_info.max_n_nodes
    # Loaders must agree with the (possibly checkpoint-overridden) model
    # config on the charge channel, not with the CLI default — resuming a
    # run trained under a different --include_charges would otherwise feed
    # h_int of the wrong width.
    model_include_charges = (
        model_cfg.vae.include_charges if model_cfg.vae
        else model_cfg.diffusion.include_charges
    )
    if loaders is None:
        loaders = {
            split: QM9Loader(
                data,
                batch_size=args.batch_size,
                pad_nodes=pad_nodes,
                shuffle=(split == "train"),
                include_charges=model_include_charges,
                properties=tuple(args.conditioning),
                seed=args.seed,
            )
            for split, data in splits.items()
        }
    else:
        for split, loader in loaders.items():
            got = getattr(loader, "include_charges", model_include_charges)
            if got != model_include_charges:
                raise ValueError(
                    f"{split} loader include_charges={got} but the model "
                    f"config (checkpoint-resolved) expects "
                    f"{model_include_charges}; rebuild the loaders with "
                    f"--include_charges {model_include_charges}"
                )

    nodes_dist = DistributionNodes(dataset_info.n_nodes)
    prop_dist = None
    property_norms = None
    if args.conditioning:
        assert splits is not None, "conditioning requires property arrays"
        property_norms = cond.compute_mean_mad(
            splits, args.conditioning, args.dataset
        )
        prop_dist = DistributionProperty(
            splits["train"]["num_atoms"],
            {k: splits["train"][k] for k in args.conditioning},
        )
        prop_dist.set_normalizer(property_norms)

    key = jax.random.key(args.seed)
    key, init_key = jax.random.split(key)
    state, tx = create_train_state(init_key, model_cfg, train_cfg)

    # Load a pre-trained first-stage VAE (reference: qm9/models.py:103-128;
    # EMA weights are used when the first stage trained with EMA).
    if args.ae_path and model_cfg.kind == "latent_diffusion":
        vae_template = state.params["vae"]
        vae_state = ckpt.load_checkpoint(
            args.ae_path,
            template={"params": vae_template, "ema_params": vae_template},
            name="best",
        )
        vae_params = vae_state["ema_params"] if args.ema_decay > 0 else vae_state["params"]
        state = state._replace(
            params={**state.params, "vae": vae_params},
            ema_params={**state.ema_params, "vae": vae_params},
        )

    outdir = os.path.join(args.outdir, args.exp_name)
    if args.resume:
        state = ckpt.load_checkpoint(args.resume, template=state, name="latest")
        print(f"resumed from {args.resume} at step {int(state.step)}")

    sp = getattr(args, "sp", 1)
    if sp > 1:
        # Sequence parallelism: (data, seq) mesh; the EGNN atom-row sharding
        # rides the ``seq`` axis inside the compute spec, batches shard over
        # ``data`` as usual. TP shards the same hidden dim SP's gathers
        # assume replicated — not composable. The fused Pallas kernels DO
        # compose: each slab's math runs as the row-tiled kernels
        # (ops/pallas_egnn_sp.py); interpret mode engages automatically on
        # CPU meshes so the combination stays testable without a pod.
        if args.tp > 1:
            raise ValueError("--sp and --tp cannot be combined")
        from geoldm_tpu.nn.core import resolve_compute, sp_spec
        from geoldm_tpu.parallel.sp import make_sp_mesh

        n_dev = len(jax.devices())
        dp = args.dp if args.dp > 0 else max(1, n_dev // sp)
        mesh = make_sp_mesh(dp=dp, sp=sp)
        use_pallas = "pallas" in args.compute_dtype
        compute_dtype = sp_spec(
            mesh, resolve_compute(compute_dtype).dtype, pallas=use_pallas,
            interpret=use_pallas and jax.devices()[0].platform == "cpu",
        )
    else:
        mesh = shd.make_mesh(dp=args.dp, tp=args.tp) if (args.dp != 1 or args.tp > 1) else None
    if mesh is not None and mesh.size > 1:
        hidden = args.nf if args.tp > 1 else None
        p_sh = shd.param_shardings(state.params, mesh, hidden_nf=hidden)
        state = state._replace(
            params=jax.device_put(state.params, p_sh),
            ema_params=jax.device_put(state.ema_params, p_sh),
        )

    from geoldm_tpu.utils.tpuflags import train_step_compiler_options

    # The fused pallas backward needs a raised scoped-VMEM limit — applied
    # per-compile to the train step ONLY (forward programs like the
    # periodic sampler stay at the default limit, which XLA prefers).
    # donate_argnums=0: the train state (params/opt-state/EMA) is consumed
    # and rebound every step, so XLA can update it in place — saves a full
    # state copy of HBM at flagship scale (no-op on CPU).
    train_step = jax.jit(
        make_train_step(model_cfg, train_cfg, tx, compute_dtype),
        compiler_options=train_step_compiler_options(compute_dtype),
        donate_argnums=0,
    )
    eval_nll = jax.jit(make_eval_nll(model_cfg, compute_dtype))

    if model_cfg.kind != "vae":
        from geoldm_tpu.diffusion import vdm as vdm_mod

        info = vdm_mod.log_info(model_cfg.diffusion, state.params)
        print(f"schedule: {info}")

    logger = MetricLogger(
        outdir=outdir, use_wandb=not args.no_wandb, exp_name=args.exp_name,
        online=args.online,
    )

    best_nll_val = float("inf")
    rng = np.random.default_rng(args.seed)
    for epoch in range(args.start_epoch, args.n_epochs):
        if args.trace:
            jax.profiler.start_trace(args.trace)
        # Per-epoch keys are derived from (seed, epoch) so --resume
        # --start_epoch k reproduces the exact RNG stream of an uninterrupted
        # run (the reference restores neither RNG nor EMA on resume).
        epoch_key = jax.random.fold_in(jax.random.key(args.seed), epoch)
        state, mean_loss = trainer_mod.train_epoch(
            state, train_step, loaders["train"], nodes_dist, epoch_key, epoch,
            conditioning=args.conditioning, property_norms=property_norms,
            augment_noise=args.augment_noise,
            data_augmentation=args.data_augmentation,
            context_indicator=model_cfg.context_indicator,
            break_train_epoch=args.break_train_epoch,
            logger=logger, log_every=args.n_report_steps, rng=rng, mesh=mesh,
            prefetch=getattr(args, "prefetch", 2),
        )
        if args.trace:
            jax.profiler.stop_trace()
        logger.log({"train_loss_epoch": mean_loss}, step=epoch)

        if epoch % args.test_epochs == 0:
            eval_params = state.ema_params if args.ema_decay > 0 else state.params
            if model_cfg.kind != "vae":
                key, a_key = jax.random.split(key)
                validity, rdkit_tuple, _ = trainer_mod.analyze_and_save(
                    model_cfg, eval_params, a_key, dataset_info, nodes_dist,
                    n_samples=args.n_stability_samples, prop_dist=prop_dist,
                    pad_nodes=pad_nodes, compute_dtype=args.compute_dtype,
                    rng=rng, mesh=mesh, n_steps=args.eval_n_steps,
                )
                print(f"epoch {epoch} stability: {validity}")
                logger.log(validity, step=epoch)
                if args.visualize:
                    # reference: train_test.py:152-174 (periodic chain +
                    # size-grid visualization during training).
                    from geoldm_tpu.evalsuite import visualizer as viz
                    from geoldm_tpu.train import sampling as sampling_mod

                    key, c_key, g_key = jax.random.split(key, 3)
                    epoch_dir = os.path.join(outdir, f"epoch_{epoch}")
                    ch_oh, ch_ch, ch_x = sampling_mod.sample_chain(
                        model_cfg, eval_params, c_key, dataset_info,
                        n_tries=1, prop_dist=prop_dist, rng=rng,
                        compute_dtype=args.compute_dtype,
                    )
                    viz.save_chain(
                        os.path.join(epoch_dir, "chain"), ch_oh, ch_ch, ch_x,
                        dataset_info,
                    )
                    viz.visualize_chain(os.path.join(epoch_dir, "chain"), dataset_info)
                    nodesxsample = nodes_dist.sample(9, rng)
                    oh, ch, xs, nm = sampling_mod.sample(
                        model_cfg, eval_params, g_key, dataset_info, nodesxsample,
                        prop_dist=prop_dist, pad_nodes=pad_nodes,
                        compute_dtype=args.compute_dtype, rng=rng,
                    )
                    viz.save_xyz_file(
                        os.path.join(epoch_dir, "molecules"), oh, ch, xs,
                        dataset_info, node_mask=nm,
                    )
                    viz.visualize(os.path.join(epoch_dir, "molecules"), dataset_info)
            key, v_key = jax.random.split(key)
            nll_val = trainer_mod.evaluate_nll(
                eval_params, eval_nll, loaders["valid"], nodes_dist, v_key,
                conditioning=args.conditioning, property_norms=property_norms,
                context_indicator=model_cfg.context_indicator,
                prefetch=getattr(args, "prefetch", 2),
                partition="valid", augment_noise=args.augment_noise, rng=rng,
                mesh=mesh,
            )
            logger.log({"nll_val": nll_val}, step=epoch)
            if args.save_model:
                ckpt.save_checkpoint(outdir, state, model_cfg, name="latest")
            if nll_val < best_nll_val and args.save_model:
                best_nll_val = nll_val
                ckpt.save_checkpoint(outdir, {"params": state.params,
                                              "ema_params": state.ema_params},
                                     model_cfg, name="best")
                key, t_key = jax.random.split(key)
                nll_test = trainer_mod.evaluate_nll(
                    eval_params, eval_nll, loaders["test"], nodes_dist, t_key,
                    conditioning=args.conditioning, property_norms=property_norms,
                    context_indicator=model_cfg.context_indicator,
                    prefetch=getattr(args, "prefetch", 2),
                    partition="test", augment_noise=args.augment_noise, rng=rng,
                    mesh=mesh,
                )
                logger.log({"nll_test": nll_test, "best_nll_val": best_nll_val}, step=epoch)
    logger.close()

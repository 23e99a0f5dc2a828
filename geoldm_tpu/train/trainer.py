"""Epoch-level training/eval orchestration for the generative models.

TPU-native equivalent of the reference loops (train_test.py:15-207 and the
epoch driver in main_qm9.py:257-303):

- train_epoch: host loader -> (augment, context) -> one fused jitted
  train step per batch; no per-batch device syncs beyond the metric fetch,
- test: eval-NLL (t0_always estimator) over a loader,
- analyze_and_save: batched generation -> CPU stability/rdkit metrics,
- periodic chain/grid visualization hooks,
- best-on-val checkpointing of params/EMA/optimizer/RNG + config JSON.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from geoldm_tpu.config import ModelConfig
from geoldm_tpu.data.datasets_config import DatasetInfo
from geoldm_tpu.evalsuite.analyze import analyze_stability_for_molecules
from geoldm_tpu.models.distributions import DistributionNodes
from geoldm_tpu.train import sampling as sampling_mod
from geoldm_tpu.train.augment import random_rotation
from geoldm_tpu.train.conditioning import prepare_context
from geoldm_tpu.train.prefetch import prefetch_map
from geoldm_tpu.utils.buckets import covering_buckets


def prepare_batch(
    raw: Dict[str, np.ndarray],
    nodes_dist: DistributionNodes,
    conditioning=(),
    property_norms=None,
    augment_noise: float = 0.0,
    data_augmentation: bool = False,
    rng: Optional[np.random.Generator] = None,
    context_indicator: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Host-side batch prep: log p(N), optional augmentation, context.

    reference: train_test.py:22-44."""
    rng = rng or np.random.default_rng()
    x = raw["x"]
    if augment_noise > 0:
        # reference: train_test.py:30-33 (eps scaled into normalized space).
        eps = rng.standard_normal(x.shape).astype(np.float32) * raw["node_mask"]
        eps -= eps.sum(axis=1, keepdims=True) / np.maximum(
            raw["node_mask"].sum(axis=1, keepdims=True), 1
        ) * raw["node_mask"]
        x = x + eps * augment_noise
    if data_augmentation:
        x = random_rotation(x, rng) * raw["node_mask"]

    batch = {
        "x": x.astype(np.float32),
        "h_cat": raw["h_cat"],
        "h_int": raw["h_int"],
        "node_mask": raw["node_mask"],
        "edge_mask": raw["edge_mask"],
        "log_pN": nodes_dist.log_prob(raw["n_atoms"]).astype(np.float32),
    }
    if conditioning:
        batch["context"] = prepare_context(conditioning, raw, property_norms,
                                           indicator=context_indicator)
    return jax.tree.map(jnp.asarray, batch)


def train_epoch(
    state,
    train_step,
    loader,
    nodes_dist: DistributionNodes,
    key,
    epoch: int,
    *,
    conditioning=(),
    property_norms=None,
    augment_noise: float = 0.0,
    data_augmentation: bool = False,
    context_indicator: bool = False,
    break_train_epoch: bool = False,
    logger=None,
    log_every: int = 50,
    rng: Optional[np.random.Generator] = None,
    mesh=None,
    prefetch: int = 2,
):
    """One pass over the loader. Returns (state, mean_loss).

    With ``mesh`` each batch is committed to a batch-sharded layout over the
    data axis BEFORE the step — without this, GSPMD propagation from the
    replicated params leaves the batch replicated and every device
    redundantly computes the full batch (dp would silently do nothing)."""
    rng = rng or np.random.default_rng(epoch)
    if mesh is not None and mesh.size > 1:
        from geoldm_tpu.parallel import sharding as shd
    losses = []
    dropped = 0
    t0 = time.time()

    def _prep(raw):
        nonlocal dropped
        batch = prepare_batch(
            raw, nodes_dist, conditioning, property_norms, augment_noise,
            data_augmentation, rng, context_indicator=context_indicator,
        )
        if mesh is not None and mesh.size > 1:
            dp = mesh.shape[shd.DATA_AXIS]
            b = len(batch["x"])
            if b % dp:
                # Trim the uneven tail batch to a data-axis multiple —
                # device_put rejects uneven sharding of the batch axis.
                # (The tail shape differs from the steady-state shape either
                # way, so a tail recompile happens regardless.) The dropped
                # molecules are reshuffled into full batches next epoch;
                # the count is reported below so the omission is visible.
                dropped += b % dp
                batch = {k: v[: b - b % dp] for k, v in batch.items()}
                if len(batch["x"]) == 0:
                    return None
            batch = shd.shard_batch(batch, mesh)
        return batch

    # One background thread prepares (and enqueues transfers for) batch
    # k+1 while the device runs step k — identical order/RNG to the
    # serial loop (prefetch.py); prefetch=0 disables. break_train_epoch
    # forces the serial path: lookahead would advance the shared rng past
    # where the serial loop stops, changing downstream draws.
    depth = 0 if break_train_epoch else prefetch
    for i, batch in enumerate(prefetch_map(_prep, loader, depth=depth)):
        if batch is None:
            continue
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub)
        losses.append(metrics)
        if i % log_every == 0:
            m = jax.tree.map(float, losses[-1])
            print(
                f"Epoch {epoch}, iter {i}/{len(loader)}: loss {m['loss']:.3f}, "
                f"grad norm {m['grad_norm']:.2f}"
            )
            if logger is not None:
                logger.log({"batch_loss": m["loss"], "grad_norm": m["grad_norm"]})
        if break_train_epoch:
            break
    if not losses:
        raise RuntimeError(
            "train_epoch processed zero batches — every batch was smaller "
            "than the data-axis size (batch_size < dp?); raise --batch_size "
            "or lower --dp"
        )
    mean_loss = float(np.mean([float(m["loss"]) for m in losses]))
    print(f"Epoch {epoch} took {time.time() - t0:.1f}s, mean loss {mean_loss:.3f}"
          + (f" ({dropped} tail molecules dropped for dp-divisibility)"
             if dropped else ""))
    return state, mean_loss


def evaluate_nll(
    params,
    eval_nll_fn,
    loader,
    nodes_dist: DistributionNodes,
    key,
    *,
    conditioning=(),
    property_norms=None,
    partition: str = "valid",
    augment_noise: float = 0.0,
    context_indicator: bool = False,
    rng=None,
    mesh=None,
    prefetch: int = 2,
) -> float:
    """Mean NLL over a split (t0_always estimator). reference:
    train_test.py:103-149 — note the reference applies augment_noise during
    evaluation as well (train_test.py:119-124), matched here.

    With a mesh, uneven tail batches are PADDED to a shardable size by
    repeating leading molecules with weight 0 (make_eval_nll computes the
    weighted mean), so every molecule of the split contributes exactly once
    — matching the reference's partial-batch evaluation. Padding goes to
    the loader's nominal batch size when known, which also avoids a
    tail-shape recompile."""
    # Accumulate the weighted sum ON DEVICE and fetch once: a float() per
    # batch forces a host sync (tunnel RTT ~100ms/batch); lazy accumulation
    # overlaps device compute with the next batch's host-side prep.
    total, count = jnp.zeros((), jnp.float32), 0
    rng = rng or np.random.default_rng(0)
    if mesh is not None and mesh.size > 1:
        from geoldm_tpu.parallel import sharding as shd
    nominal = getattr(loader, "batch_size", 0)

    def _prep(raw):
        batch = prepare_batch(raw, nodes_dist, conditioning, property_norms,
                              augment_noise=augment_noise, rng=rng,
                              context_indicator=context_indicator)
        b = batch["x"].shape[0]
        if mesh is not None and mesh.size > 1:
            dp = mesh.shape[shd.DATA_AXIS]
            if b % dp:
                target = nominal if (nominal >= b and nominal % dp == 0) else (
                    -(-b // dp) * dp
                )
                # Repeat leading molecules (np.resize cycles rows) with
                # weight 0 — zero-mask rows would NaN the latent model.
                batch = {
                    k: jnp.asarray(
                        np.resize(np.asarray(v), (target,) + v.shape[1:])
                    )
                    for k, v in batch.items()
                }
                batch["weight"] = jnp.asarray(
                    (np.arange(target) < b).astype(np.float32)
                )
            batch = shd.shard_batch(batch, mesh)
        return b, batch

    # Same background host-prep overlap as train_epoch (prefetch.py).
    for b, batch in prefetch_map(_prep, loader, depth=prefetch):
        key, sub = jax.random.split(key)
        total = total + eval_nll_fn(params, batch, sub) * b
        count += b
    mean = float(total) / max(count, 1)
    print(f"{partition} NLL: {mean:.4f}")
    return mean


def evaluate_nll_packed(
    params,
    model_cfg: ModelConfig,
    split: Dict[str, np.ndarray],
    nodes_dist: DistributionNodes,
    key,
    *,
    batch_size: int = 64,
    pad_nodes: int = 0,
    n_passes: int = 1,
    partition: str = "test",
    compute_dtype=None,
    augment_noise: float = 0.0,
    stage_bytes: int = 2 << 30,
):
    """Device-resident NLL evaluation: stage the split on device in large
    segments and run each segment as a single ``lax.scan`` over batches.

    The loader-per-batch path (evaluate_nll) pays a host->device transfer
    plus dispatch per batch — ~0.4s/batch through the axon tunnel, which
    made the reference protocol's 5 test passes (eval_analyze.py:172-188)
    the wall-clock bottleneck. Here the split is packed [M, N, ...] host-side
    (vectorized), transferred in <= ``stage_bytes`` segments (one segment =
    one dispatch; small splits stay a single transfer, GEOM-scale splits
    no longer risk exhausting HBM), edge masks are rebuilt ON DEVICE from
    the node mask, and ``augment_noise`` is applied on device per pass with
    fresh CoM-projected noise (reference eval-time augment,
    train_test.py:119-124). Returns a list of per-pass mean NLLs.
    """
    from geoldm_tpu.models import factory
    from geoldm_tpu.ops.com import remove_mean_with_mask
    from geoldm_tpu.ops.distance import build_edge_mask

    from geoldm_tpu.data.collate import prepare_split_arrays

    d = split
    m = len(d["num_atoms"])
    n = pad_nodes or d["positions"].shape[1]
    n_atoms = np.asarray(d["num_atoms"])
    include_charges = (
        model_cfg.vae.include_charges if model_cfg.vae
        else model_cfg.diffusion.include_charges
    )
    arrs = prepare_split_arrays(
        n_atoms, d["positions"], d["one_hot"], d["charges"], n, include_charges
    )
    pos, hc, h_int, node_mask = (
        arrs["x"], arrs["h_cat"], arrs["h_int"], arrs["node_mask"]
    )
    log_pN = nodes_dist.log_prob(n_atoms).astype(np.float32)

    # Pad the molecule count to a batch multiple by REPEATING the leading
    # molecules with weight 0 — an all-zero-mask molecule would send NaN
    # through the latent model's per-graph reductions, and NaN * 0 = NaN.
    steps = -(-m // batch_size)
    mp = steps * batch_size
    weight = np.concatenate(
        [np.ones(m, dtype=np.float32), np.zeros(mp - m, dtype=np.float32)]
    )

    def pack(a):
        if len(a) < mp:
            # np.resize cycles whole rows, so this works even when the
            # padding exceeds the split size (m < batch_size).
            a = np.resize(a, (mp,) + a.shape[1:])
        return a.reshape((steps, batch_size) + a.shape[1:])

    data_np = tuple(
        pack(a) for a in (pos, hc, h_int, node_mask, log_pN, weight)
    )

    # Segment size: how many scan steps fit the staging budget at once.
    bytes_per_step = sum(
        a.itemsize * int(np.prod(a.shape[1:])) for a in data_np
    )
    seg_steps = max(1, int(stage_bytes // max(bytes_per_step, 1)))
    n_segs = -(-steps // seg_steps)
    if n_segs > 1:
        print(f"{partition}: staging {steps} batches in {n_segs} segments "
              f"of <= {seg_steps} ({bytes_per_step * seg_steps / 2**30:.2f} GiB "
              "device-resident at a time)")

    nll_fn = factory.model_nll_fn(model_cfg, training=False,
                                  compute_dtype=compute_dtype)

    @jax.jit
    def run_segment(params, data, key, offset):
        def body(acc, chunk):
            x_, hc_, hi_, nm_, lpn_, w_ = chunk
            em_ = build_edge_mask(nm_)
            k = jax.random.fold_in(key, acc[1])
            if augment_noise > 0:
                eps = jax.random.normal(
                    jax.random.fold_in(k, 0x5EED), x_.shape, x_.dtype
                ) * nm_
                eps = remove_mean_with_mask(eps, nm_)
                x_ = x_ + eps * augment_noise
            nll = nll_fn(params, k, x_, hc_, hi_, nm_, em_, None) - lpn_
            return (acc[0] + jnp.sum(nll * w_), acc[1] + 1), None

        init = (jnp.zeros((), jnp.float32), offset)
        (total, _), _ = jax.lax.scan(body, init, data)
        return total

    if m == 0:
        # Empty split: match evaluate_nll's 0.0 (instead of scanning
        # nothing and dividing 0/0).
        return [0.0] * n_passes

    # Segments outer, passes inner: each segment is transferred host->device
    # exactly ONCE and reused by every pass (the whole point of the packed
    # path); the per-pass keys are pre-split so the RNG stream matches the
    # passes-outer order.
    pass_keys = []
    for _ in range(n_passes):
        key, sub = jax.random.split(key)
        pass_keys.append(sub)
    totals = [0.0] * n_passes
    for s0 in range(0, steps, seg_steps):
        seg = tuple(jnp.asarray(a[s0:s0 + seg_steps]) for a in data_np)
        off = jnp.asarray(s0, jnp.int32)
        for i in range(n_passes):
            totals[i] += float(run_segment(params, seg, pass_keys[i], off))
    means = [t / max(m, 1) for t in totals]
    for i, val in enumerate(means):
        print(f"{partition}[{i}] NLL: {val:.4f}")
    return means


def analyze_and_save(
    model_cfg: ModelConfig,
    params,
    key,
    dataset_info: DatasetInfo,
    nodes_dist: DistributionNodes,
    *,
    n_samples: int = 500,
    batch_size: int = 100,
    prop_dist=None,
    pad_nodes: Optional[int] = None,
    compute_dtype: Optional[str] = None,
    rng: Optional[np.random.Generator] = None,
    mesh=None,
    datadir: str = "data",
    n_steps: Optional[int] = None,
    eta: float = 1.0,
    method: str = "ddim",
    external_smiles=None,
):
    """Generate n_samples molecules and compute stability (+rdkit) metrics.

    ``n_steps``/``eta``/``method`` select the strided few-step sampler
    (generation beyond the reference's fixed-T protocol; see
    vdm.vdm_sample). reference: train_test.py:176-197, eval_analyze.py:35-67."""
    rng = rng or np.random.default_rng(0)
    batch_size = min(batch_size, n_samples)
    nodesxsample = nodes_dist.sample(n_samples, rng)
    # Size-bucketed generation: small molecules are padded only to their
    # bucket boundary, cutting the O(N^2) edge work (~2x on QM9, ~1.5x on
    # GEOM vs coarse buckets — buckets are matched per dataset).
    max_n = pad_nodes or dataset_info["max_n_nodes"]
    buckets = covering_buckets(
        sampling_mod.default_buckets(dataset_info), max_n)
    t0 = time.time()
    one_hot, charges, x, node_mask = sampling_mod.sample_bucketed(
        model_cfg, params, key, dataset_info, nodesxsample,
        batch_size=batch_size, buckets=buckets, prop_dist=prop_dist,
        compute_dtype=compute_dtype, rng=rng, mesh=mesh, n_steps=n_steps,
        eta=eta, method=method,
    )
    t_gen = time.time() - t0
    molecules = {"one_hot": one_hot, "x": x, "node_mask": node_mask[..., 0]}
    t0 = time.time()
    validity_dict, rdkit_tuple = analyze_stability_for_molecules(
        molecules, dataset_info, datadir=datadir, external_smiles=external_smiles
    )
    print(f"  [analyze_and_save] generation {t_gen:.1f}s, "
          f"analysis {time.time() - t0:.1f}s for {n_samples} molecules")
    return validity_dict, rdkit_tuple, molecules

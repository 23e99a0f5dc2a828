"""Property-classifier training protocol.

Jitted re-design of the reference trainer
(qm9/property_prediction/main_qm9_prop.py:15-115, 170-218): train on
qm9_first_half, validate on qm9 valid, test on qm9_second_half's train
split; L1 loss on mean/MAD-normalized labels (denormalized L1 at eval);
Adam + cosine LR over epochs; best-on-valid checkpointing with a JSON
loss log.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from geoldm_tpu.models import classifier as clf

Array = jax.Array


def make_loss_fns(node_attr: bool = False, compute_dtype=None):
    def train_loss(params, batch, mean, mad):
        pred = clf.classifier_apply(
            params, batch["h0"], batch["x"], batch["node_mask"], batch["edge_mask"],
            node_attr, compute_dtype,
        )
        return jnp.mean(jnp.abs(pred - (batch["label"] - mean) / mad))

    def eval_loss(params, batch, mean, mad):
        pred = clf.classifier_apply(
            params, batch["h0"], batch["x"], batch["node_mask"], batch["edge_mask"],
            node_attr, compute_dtype,
        )
        return jnp.mean(jnp.abs(mad * pred + mean - batch["label"]))

    return train_loss, eval_loss


def make_train_step(tx, node_attr: bool = False, compute_dtype=None):
    """The learning rate is a traced argument so the host-side cosine
    schedule (stepped per epoch, like the reference's CosineAnnealingLR)
    needs no recompilation."""
    train_loss, _ = make_loss_fns(node_attr, compute_dtype)

    @jax.jit
    def step(params, opt_state, batch, mean, mad, lr):
        loss, grads = jax.value_and_grad(train_loss)(params, batch, mean, mad)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def batch_for_classifier(batch: Dict[str, np.ndarray], prop: str) -> Dict[str, jnp.ndarray]:
    """Adapt a QM9Loader batch: the classifier consumes the one-hot as node
    features (reference uses one_hot directly — main_qm9_prop.py:31-35)."""
    return {
        "h0": jnp.asarray(batch["h_cat"]),
        "x": jnp.asarray(batch["x"]),
        "node_mask": jnp.asarray(batch["node_mask"]),
        "edge_mask": jnp.asarray(batch["edge_mask"]),
        "label": jnp.asarray(batch[prop]),
    }


def train_classifier(
    loaders: Dict[str, object],
    prop: str,
    property_norms: Dict[str, Dict[str, float]],
    *,
    epochs: int = 1000,
    lr: float = 1e-3,
    weight_decay: float = 1e-16,
    nf: int = 128,
    n_layers: int = 7,
    attention: bool = True,
    node_attr: bool = False,
    in_node_nf: int = 5,
    seed: int = 1,
    outdir: Optional[str] = None,
    log_every: int = 20,
    compute_dtype=None,
) -> dict:
    """Full training run; returns {'params', 'best_val', 'best_test', ...}."""
    mean = property_norms[prop]["mean"]
    mad = property_norms[prop]["mad"]

    params = clf.classifier_init(
        jax.random.key(seed), in_node_nf, nf, n_layers, attention, node_attr
    )
    schedule = optax.cosine_decay_schedule(lr, epochs)

    tx = optax.chain(
        optax.scale_by_adam(),
        optax.add_decayed_weights(weight_decay),
    )
    opt_state = tx.init(params)
    step = make_train_step(tx, node_attr, compute_dtype)
    _, eval_loss = make_loss_fns(node_attr, compute_dtype)
    eval_loss = jax.jit(eval_loss)

    res = {"epochs": [], "losess": [], "best_val": 1e10, "best_test": 1e10, "best_epoch": 0}
    best_params = params

    for epoch in range(epochs):
        # The reference steps CosineAnnealingLR at the START of each train
        # epoch (main_qm9_prop.py:16-17), so epoch e trains at schedule(e+1).
        epoch_lr = float(schedule(epoch + 1))
        for i, raw in enumerate(loaders["train"]):
            batch = batch_for_classifier(raw, prop)
            params, opt_state, loss = step(params, opt_state, batch, mean, mad, epoch_lr)
            if i % log_every == 0:
                print(f"Epoch {epoch} \t Iteration {i} \t loss {float(loss):.4f}")

        def eval_split(split):
            losses, counts = [], []
            for raw in loaders[split]:
                batch = batch_for_classifier(raw, prop)
                losses.append(float(eval_loss(params, batch, mean, mad)) * len(raw["x"]))
                counts.append(len(raw["x"]))
            return sum(losses) / max(sum(counts), 1)

        val_loss = eval_split("valid")
        test_loss = eval_split("test")
        res["epochs"].append(epoch)
        res["losess"].append(test_loss)
        if val_loss < res["best_val"]:
            res["best_val"] = val_loss
            res["best_test"] = test_loss
            res["best_epoch"] = epoch
            best_params = jax.tree.map(np.asarray, params)
            if outdir:
                from geoldm_tpu.utils import checkpoint as ckpt

                ckpt.save_checkpoint(outdir, best_params, name="best")
        print(
            f"Val loss: {val_loss:.4f} \t test loss: {test_loss:.4f} \t epoch {epoch}"
        )
        if outdir:
            with open(os.path.join(outdir, "losess.json"), "w") as f:
                json.dump(res, f, indent=4)

    return {"params": best_params, **res}

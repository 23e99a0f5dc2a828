"""Host-prep prefetch pipeline (train/prefetch.py): serial-identical
results, error propagation, early-exit cleanliness, and train_epoch
equivalence with prefetch on/off."""

import threading
import time

import jax
import numpy as np
import pytest

from geoldm_tpu.train.prefetch import prefetch_map


def test_order_and_equality_with_serial_map():
    items = list(range(50))
    fn = lambda x: x * x
    assert list(prefetch_map(fn, items, depth=3)) == [fn(x) for x in items]
    # depth<=0 degrades to a plain map, no thread
    assert list(prefetch_map(fn, items, depth=0)) == [fn(x) for x in items]


def test_single_worker_preserves_stateful_fn_order():
    """One background worker consumes sequentially, so a stateful fn (like
    prepare_batch's numpy RNG) sees the exact serial call order."""
    calls = []

    def fn(x):
        calls.append(x)
        return x

    out = list(prefetch_map(fn, range(20), depth=4))
    assert calls == list(range(20)) == out


def test_exception_propagates_to_consumer():
    def fn(x):
        if x == 3:
            raise ValueError("boom at 3")
        return x

    it = prefetch_map(fn, range(10), depth=2)
    got = [next(it), next(it), next(it)]
    assert got == [0, 1, 2]
    with pytest.raises(ValueError, match="boom at 3"):
        list(it)


def test_early_break_stops_worker():
    started = threading.active_count()
    produced = []

    def fn(x):
        produced.append(x)
        return x

    for v in prefetch_map(fn, range(10_000), depth=2):
        if v == 5:
            break
    # Generator close stops the worker; give the thread a beat to exit.
    time.sleep(0.2)
    assert threading.active_count() <= started + 1
    assert len(produced) < 9_000  # did not race through the whole iterable


@pytest.mark.slow
def test_train_epoch_prefetch_matches_serial():
    """prefetch=2 must be byte-identical to prefetch=0 (same RNG stream,
    same batch order, same losses)."""
    from geoldm_tpu.config import TrainConfig
    from geoldm_tpu.data.collate import build_masks
    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.models import factory
    from geoldm_tpu.models.distributions import DistributionNodes
    from geoldm_tpu.train import train_step as ts
    from geoldm_tpu.train import trainer

    info = get_dataset_info("qm9")
    cfg = factory.make_latent_diffusion_config(
        info, nf=8, n_layers=1, latent_nf=1, diffusion_steps=4)
    tc = TrainConfig(lr=1e-3, ema_decay=0.9)

    def make_loader():
        rng = np.random.default_rng(0)
        batches = []
        for _ in range(4):
            sizes = rng.integers(3, 9, size=4)
            node_mask, edge_mask = build_masks(sizes, 12)
            nc = len(info["atom_decoder"])
            batches.append({
                "x": (rng.standard_normal((4, 12, 3)).astype(np.float32)
                      * node_mask),
                "h_cat": np.eye(nc, dtype=np.float32)[
                    rng.integers(0, nc, (4, 12))] * node_mask,
                "h_int": rng.integers(1, 9, (4, 12, 1)).astype(np.float32)
                * node_mask,
                "node_mask": node_mask,
                "edge_mask": edge_mask,
                "n_atoms": sizes,
            })
        return batches

    nodes_dist = DistributionNodes(info.n_nodes)
    results = {}
    for depth in (0, 2):
        state, tx = ts.create_train_state(jax.random.key(0), cfg, tc)
        step = jax.jit(ts.make_train_step(cfg, tc, tx))
        state, mean_loss = trainer.train_epoch(
            state, step, make_loader(), nodes_dist, jax.random.key(1), 0,
            augment_noise=0.01, data_augmentation=True,
            rng=np.random.default_rng(7), prefetch=depth, log_every=100,
        )
        results[depth] = (mean_loss, jax.tree.leaves(state.params)[0])
    assert results[0][0] == results[2][0]
    np.testing.assert_array_equal(np.asarray(results[0][1]),
                                  np.asarray(results[2][1]))

"""Tests for sampling orchestration, conditioning utils, and the visualizer."""

import os

import jax
import numpy as np
import pytest

from geoldm_tpu.data.datasets_config import get_dataset_info
from geoldm_tpu.evalsuite import visualizer as viz
from geoldm_tpu.models import factory
from geoldm_tpu.models.distributions import DistributionProperty
from geoldm_tpu.train import conditioning as cond
from geoldm_tpu.train import sampling as S

INFO = get_dataset_info("qm9")


def tiny_cfg(**kw):
    base = dict(nf=16, n_layers=1, diffusion_steps=8, latent_nf=1)
    base.update(kw)
    return factory.make_latent_diffusion_config(INFO, **base)


def test_sample_orchestration():
    cfg = tiny_cfg()
    params = factory.init_params(jax.random.key(0), cfg)
    nodesxsample = np.array([5, 9, 7])
    one_hot, charges, x, node_mask = S.sample(
        cfg, params, jax.random.key(1), INFO, nodesxsample, pad_nodes=12
    )
    assert x.shape == (3, 12, 3)
    assert one_hot.shape == (3, 12, 5)
    np.testing.assert_array_equal(node_mask[..., 0].sum(1), nodesxsample)
    assert np.abs(x * (1 - node_mask)).max() == 0.0


@pytest.mark.slow
def test_sample_chain_orchestration():
    cfg = tiny_cfg()
    params = factory.init_params(jax.random.key(0), cfg)
    one_hot, charges, x = S.sample_chain(
        cfg, params, jax.random.key(2), INFO, n_tries=1, keep_frames=4
    )
    assert x.shape == (14, 19, 3)  # 4 frames + 10 repeats of the last
    assert one_hot.shape == (14, 19, 5)
    # Last frames are identical (hold).
    np.testing.assert_allclose(x[-1], x[-5], atol=0)


@pytest.mark.slow
def test_conditional_sampling_with_prop_dist():
    cfg = tiny_cfg(context_node_nf=2)
    params = factory.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    num_atoms = rng.integers(5, 20, size=200)
    props = {
        "alpha": rng.standard_normal(200) * 8 + 70,
        "mu": np.abs(rng.standard_normal(200)),
    }
    prop_dist = DistributionProperty(num_atoms, props)
    prop_dist.set_normalizer(cond.compute_mean_mad_from_arrays(props, ["alpha", "mu"]))

    nodesxsample = np.array([6, 9])
    one_hot, charges, x, node_mask = S.sample(
        cfg, params, jax.random.key(1), INFO, nodesxsample, prop_dist=prop_dist,
        pad_nodes=12, rng=rng,
    )
    assert x.shape == (2, 12, 3)

    # Conditional sweep with fixed noise.
    one_hot, charges, x, node_mask = S.sample_sweep_conditional(
        cfg, params, jax.random.key(2), INFO, prop_dist, n_nodes=9, n_frames=5
    )
    assert x.shape == (5, INFO.max_n_nodes, 3)


def test_prepare_context_and_mean_mad():
    rng = np.random.default_rng(0)
    b, n = 4, 7
    node_mask = np.ones((b, n, 1), dtype=np.float32)
    node_mask[0, 5:] = 0
    batch = {
        "node_mask": node_mask,
        "alpha": rng.standard_normal(b).astype(np.float32),
        "homo": rng.standard_normal(b).astype(np.float32),
    }
    norms = cond.compute_mean_mad_from_arrays(
        {"alpha": rng.standard_normal(100), "homo": rng.standard_normal(100)},
        ["alpha", "homo"],
    )
    ctx = cond.prepare_context(["alpha", "homo"], batch, norms)
    assert ctx.shape == (b, n, 2)
    assert np.abs(ctx * (1 - node_mask)).max() == 0.0
    # Same value broadcast across nodes of a molecule.
    np.testing.assert_allclose(ctx[1, 0], ctx[1, 3])


def test_preprocess_input_charge_power():
    one_hot = np.eye(5, dtype=np.float32)[None, [0, 1, 2]]  # [1, 3, 5]
    charges = np.array([[1.0, 6.0, 7.0]], dtype=np.float32)
    feats = cond.preprocess_input(one_hot, charges, charge_power=2, charge_scale=9.0)
    assert feats.shape == (1, 3, 15)
    # Layout is [..., type, power]: for atom 1 (type index 1, charge 6) the
    # p=0 slot of its own type is 1 and the p=1 slot is charge/scale.
    feats = feats.reshape(1, 3, 5, 3)
    assert feats[0, 1, 1, 0] == 1.0
    np.testing.assert_allclose(feats[0, 1, 1, 1], 6.0 / 9.0, rtol=1e-6)
    # Other types' slots are zero.
    assert feats[0, 1, 0].max() == 0.0


def test_rotate_chain():
    z = np.random.default_rng(0).standard_normal((1, 6, 9)).astype(np.float32)
    out = S.rotate_chain(z, n_steps=5)
    assert out.shape == (6, 6, 9)
    # Norms of coordinates preserved by rotations.
    np.testing.assert_allclose(
        np.linalg.norm(out[0, :, :3], axis=1),
        np.linalg.norm(out[-1, :, :3], axis=1),
        rtol=1e-5,
    )
    # h parts identical.
    np.testing.assert_allclose(out[0, :, 3:], out[-1, :, 3:])


def test_visualizer_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    b, n = 2, 5
    one_hot = np.eye(5, dtype=np.float32)[rng.integers(0, 5, (b, n))]
    positions = rng.standard_normal((b, n, 3)).astype(np.float32)
    node_mask = np.ones((b, n, 1), dtype=np.float32)
    node_mask[1, 4:] = 0
    positions = positions * node_mask
    files = viz.save_xyz_file(
        str(tmp_path), one_hot, None, positions, INFO, node_mask=node_mask
    )
    assert len(files) == 2
    pos, oh = viz.load_molecule_xyz(files[0], INFO)
    np.testing.assert_allclose(pos, positions[0], atol=1e-6)
    np.testing.assert_array_equal(oh, one_hot[0])
    # Second molecule has padding stripped.
    pos2, oh2 = viz.load_molecule_xyz(files[1], INFO)
    assert pos2.shape == (4, 3)


def test_visualizer_render_and_gif(tmp_path):
    rng = np.random.default_rng(0)
    n = 4
    one_hot = np.eye(5, dtype=np.float32)[rng.integers(0, 5, (3, n))]
    positions = rng.standard_normal((3, n, 3)).astype(np.float32)
    chain_dir = tmp_path / "chain"
    viz.save_chain(str(chain_dir), one_hot, np.zeros((3, n, 1)), positions, INFO)
    gif = viz.visualize_chain(str(chain_dir), INFO)
    assert gif is not None and os.path.exists(gif)
    pngs = viz.visualize(str(chain_dir), INFO, max_num=2)
    assert all(os.path.exists(p) for p in pngs)


def test_visualizer_chain_uncertainty_gif(tmp_path):
    """The 3-frame alpha-overlay chain renderer (reference
    eval_sample.py:42) produces a gif; short chains fall back to plain."""
    rng = np.random.default_rng(1)
    n = 4
    one_hot = np.eye(5, dtype=np.float32)[rng.integers(0, 5, (4, n))]
    positions = rng.standard_normal((4, n, 3)).astype(np.float32)
    chain_dir = tmp_path / "chain_u"
    viz.save_chain(str(chain_dir), one_hot, np.zeros((4, n, 1)), positions, INFO)
    gif = viz.visualize_chain_uncertainty(str(chain_dir), INFO)
    assert gif is not None and os.path.exists(gif)
    short_dir = tmp_path / "chain_short"
    viz.save_chain(str(short_dir), one_hot[:2], np.zeros((2, n, 1)),
                   positions[:2], INFO)
    gif2 = viz.visualize_chain_uncertainty(str(short_dir), INFO)
    assert gif2 is not None and os.path.exists(gif2)


@pytest.mark.slow
def test_sample_bucketed():
    cfg = tiny_cfg_bucketed = tiny_cfg()
    params = factory.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    nodesxsample = np.array([5, 12, 20, 7, 15, 25, 3, 9, 18])
    one_hot, charges, x, node_mask = S.sample_bucketed(
        cfg, params, jax.random.key(1), INFO, nodesxsample, batch_size=4,
        buckets=(8, 16, 29), rng=rng,
    )
    # Buckets round up to multiples of 8 (29 -> 32).
    assert x.shape == (9, 32, 3)
    # Requested sizes preserved in original order.
    np.testing.assert_array_equal(node_mask[..., 0].sum(1), nodesxsample)
    # Masked + CoM-centered per molecule.
    assert np.abs(x * (1 - node_mask)).max() == 0.0
    np.testing.assert_allclose(x.sum(axis=1), 0.0, atol=1e-3)
    # One-hot valid on real nodes.
    np.testing.assert_allclose(one_hot.sum(-1) * node_mask[..., 0], node_mask[..., 0])


def test_covering_buckets():
    from geoldm_tpu.utils.buckets import covering_buckets

    # QM9: max 29 -> top bucket 32 (8-aligned), below-max buckets kept
    assert covering_buckets((16, 24, 32), 29) == (16, 24, 32)
    assert covering_buckets((16, 24), 29) == (16, 24, 32)
    # GEOM: a configured bucket covering max_n is used as the top as-is
    assert covering_buckets((32, 48, 64, 96, 136, 184), 181) == \
        (32, 48, 64, 96, 136, 184)
    # buckets past the covering top are dropped, duplicates collapse
    assert covering_buckets((8, 16, 16, 64), 10) == (8, 16)
    assert covering_buckets((), 13) == (16,)


def test_sample_bucketed_full_chunk_pad():
    """chunk_pad='full' (the serving path) pads remainder chunks to the
    full batch and returns identical molecules for identical keys."""
    cfg = tiny_cfg()
    params = factory.init_params(jax.random.key(0), cfg)
    nodesxsample = np.array([5, 12, 20, 7, 15])  # 4+1 at batch_size 4
    outs = [
        S.sample_bucketed(
            cfg, params, jax.random.key(1), INFO, nodesxsample, batch_size=4,
            buckets=(8, 16, 29), rng=np.random.default_rng(0), chunk_pad=cp,
        )
        for cp in ("full", "full")
    ]
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(a, b)
    one_hot, charges, x, node_mask = outs[0]
    np.testing.assert_array_equal(node_mask[..., 0].sum(1), nodesxsample)
    assert np.all(np.isfinite(x))


@pytest.mark.slow
def test_sample_bucketed_few_step():
    """Bucketed generation composes with the strided DDIM sampler."""
    cfg = tiny_cfg()
    params = factory.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    nodesxsample = np.array([5, 12, 20, 7])
    one_hot, charges, x, node_mask = S.sample_bucketed(
        cfg, params, jax.random.key(1), INFO, nodesxsample, batch_size=4,
        buckets=(8, 16, 29), rng=rng, n_steps=3, eta=0.0,
    )
    np.testing.assert_array_equal(node_mask[..., 0].sum(1), nodesxsample)
    assert np.all(np.isfinite(x))
    assert np.abs(x * (1 - node_mask)).max() == 0.0
    np.testing.assert_allclose(x.sum(axis=1), 0.0, atol=1e-3)

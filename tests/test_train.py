"""Training-stack tests: optimizer semantics, EMA, loss descent on synthetic
data, and SPMD (DP/TP) equivalence on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from geoldm_tpu.config import TrainConfig
from geoldm_tpu.data.datasets_config import get_dataset_info
from geoldm_tpu.data.synthetic import synthetic_batch
from geoldm_tpu.models import factory
from geoldm_tpu.models.distributions import DistributionNodes
from geoldm_tpu.parallel import sharding as shd
from geoldm_tpu.train import optim as optim_mod
from geoldm_tpu.train.train_step import create_train_state, make_eval_nll, make_train_step

INFO = get_dataset_info("qm9")


def tiny_cfg(**kw):
    base = dict(nf=16, n_layers=1, diffusion_steps=10, latent_nf=1)
    base.update(kw)
    return factory.make_latent_diffusion_config(INFO, **base)


def make_batch(b=4, n=12, seed=0):
    rng = np.random.default_rng(seed)
    batch = synthetic_batch(INFO, b, pad_nodes=n, rng=rng)
    nodes_dist = DistributionNodes(INFO.n_nodes)
    batch["log_pN"] = nodes_dist.log_prob(batch["n_atoms"]).astype(np.float32)
    del batch["n_atoms"]
    return jax.tree.map(jnp.asarray, batch)


def test_adaptive_clip_spike():
    clip = optim_mod.adaptive_grad_clip(max_len=8, init_value=10.0)
    params = {"w": jnp.zeros((3,))}
    state = clip.init(params)
    # History = [10] -> allowed = 15. A spike of norm 1000 must be scaled to 15.
    spike = {"w": jnp.full((3,), 1000.0 / np.sqrt(3))}
    upd, state = clip.update(spike, state)
    np.testing.assert_allclose(float(optax.global_norm(upd)), 15.0, rtol=1e-5)
    # The recorded value is the clipped norm, so the threshold stays sane.
    assert float(state.norms[1]) == pytest.approx(15.0, rel=1e-5)


def test_adaptive_clip_no_clip_small():
    clip = optim_mod.adaptive_grad_clip(max_len=8, init_value=10.0)
    params = {"w": jnp.zeros((3,))}
    state = clip.init(params)
    small = {"w": jnp.full((3,), 1.0)}
    upd, _ = clip.update(small, state)
    np.testing.assert_allclose(np.asarray(upd["w"]), np.asarray(small["w"]), rtol=1e-6)


def test_train_steps_descend():
    cfg = tiny_cfg()
    tc = TrainConfig(lr=1e-3, ema_decay=0.99)
    state, tx = create_train_state(jax.random.key(0), cfg, tc)
    step = jax.jit(make_train_step(cfg, tc, tx))
    batch = make_batch()
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.key(100 + i))
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))
    assert int(state.step) == 8
    # EMA differs from params but tracks them.
    d = jax.tree.map(lambda a, b: jnp.max(jnp.abs(a - b)), state.params, state.ema_params)
    assert max(float(x) for x in jax.tree.leaves(d)) > 0


@pytest.mark.slow
def test_frozen_vae_params_unchanged():
    cfg = tiny_cfg()  # trainable_ae=False
    tc = TrainConfig(lr=1e-2, ema_decay=0.0)
    state, tx = create_train_state(jax.random.key(0), cfg, tc)
    step = jax.jit(make_train_step(cfg, tc, tx))
    vae_before = jax.tree.map(np.asarray, state.params["vae"])
    batch = make_batch()
    state, _ = step(state, batch, jax.random.key(1))
    dyn_before = np.asarray(state.params["dynamics"]["egnn"]["embedding"]["w"]).copy()
    batch = make_batch(seed=1)
    state, _ = step(state, batch, jax.random.key(2))
    vae_after = jax.tree.map(np.asarray, state.params["vae"])
    for a, b in zip(jax.tree.leaves(vae_before), jax.tree.leaves(vae_after)):
        np.testing.assert_array_equal(a, b)
    # Dynamics did change.
    dyn_after = np.asarray(state.params["dynamics"]["egnn"]["embedding"]["w"])
    assert np.max(np.abs(dyn_after - dyn_before)) > 0


@pytest.mark.slow
def test_eval_nll_runs():
    cfg = tiny_cfg()
    tc = TrainConfig()
    state, _ = create_train_state(jax.random.key(0), cfg, tc)
    eval_nll = jax.jit(make_eval_nll(cfg))
    batch = make_batch()
    val = eval_nll(state.params, batch, jax.random.key(5))
    assert np.isfinite(float(val))


# ---------------------------------------------------------------------------
# SPMD equivalence on the virtual mesh
# ---------------------------------------------------------------------------


def _run_one_step(mesh, tp_hidden=None):
    cfg = tiny_cfg(nf=16)
    tc = TrainConfig(lr=1e-3, ema_decay=0.0, clip_grad=False)
    state, tx = create_train_state(jax.random.key(0), cfg, tc)
    batch = make_batch(b=8)
    step_fn = make_train_step(cfg, tc, tx)

    if mesh is None:
        state2, metrics = jax.jit(step_fn)(state, batch, jax.random.key(7))
        return state2, metrics

    p_sh = shd.param_shardings(state.params, mesh, hidden_nf=tp_hidden)
    state_sh = state._replace(
        params=jax.device_put(state.params, p_sh),
        ema_params=jax.device_put(state.ema_params, p_sh),
    )
    batch_sh = shd.shard_batch(batch, mesh)
    state2, metrics = jax.jit(step_fn)(state_sh, batch_sh, jax.random.key(7))
    return state2, metrics


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_dp_matches_single_device():
    ref_state, ref_metrics = _run_one_step(None)
    mesh = shd.make_mesh(dp=8, tp=1)
    dp_state, dp_metrics = _run_one_step(mesh)
    np.testing.assert_allclose(
        float(ref_metrics["loss"]), float(dp_metrics["loss"]), rtol=1e-5
    )
    a = np.asarray(ref_state.params["dynamics"]["egnn"]["embedding"]["w"])
    b = np.asarray(dp_state.params["dynamics"]["egnn"]["embedding"]["w"])
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_dp_tp_matches_single_device():
    ref_state, ref_metrics = _run_one_step(None)
    mesh = shd.make_mesh(dp=4, tp=2)
    tp_state, tp_metrics = _run_one_step(mesh, tp_hidden=16)
    np.testing.assert_allclose(
        float(ref_metrics["loss"]), float(tp_metrics["loss"]), rtol=1e-4
    )
    a = np.asarray(ref_state.params["dynamics"]["egnn"]["embedding"]["w"])
    b = np.asarray(tp_state.params["dynamics"]["egnn"]["embedding"]["w"])
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_nodes_dist_log_prob_unseen_size_readable_error():
    """log p(N) for a size absent from the histogram raises a readable
    ValueError instead of a raw KeyError (found by the 10k eval protocol
    on fabricated data containing 28-atom molecules; real QM9 has none)."""
    nodes_dist = DistributionNodes({4: 10, 5: 20, 7: 5})
    np.testing.assert_allclose(
        nodes_dist.log_prob([5, 4]), np.log(np.array([20, 10]) / 35.0), rtol=1e-6
    )
    with pytest.raises(ValueError, match="not in the dataset's n_nodes"):
        nodes_dist.log_prob([5, 6])


@pytest.mark.slow
def test_evaluate_nll_packed_matches_manual():
    """evaluate_nll_packed == manually running the nll_fn over the same
    chunks with the same fold_in keys (incl. a weighted padded tail)."""
    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.models import factory
    from geoldm_tpu.ops.distance import build_edge_mask
    from geoldm_tpu.train import trainer as trainer_mod

    info = get_dataset_info("qm9")
    cfg = factory.make_diffusion_model_config(
        info, nf=16, n_layers=1, diffusion_steps=8
    )
    params = factory.init_params(jax.random.key(0), cfg)
    nodes_dist = DistributionNodes(info.n_nodes)

    m, stored_n = 11, 9  # deliberately not a batch multiple
    rng = np.random.default_rng(0)
    num_atoms = rng.choice(list(info.n_nodes.keys())[:4], size=m)
    num_atoms = np.minimum(num_atoms, stored_n)
    split = {
        "num_atoms": num_atoms,
        "positions": rng.standard_normal((m, stored_n, 3)).astype(np.float32)
        * (np.arange(stored_n)[None] < num_atoms[:, None])[..., None],
        "one_hot": np.eye(5, dtype=np.float32)[
            rng.integers(0, 5, (m, stored_n))
        ],
        "charges": rng.integers(1, 9, (m, stored_n)).astype(np.float32),
    }

    key = jax.random.key(7)
    key2, sub = jax.random.split(key)
    got = trainer_mod.evaluate_nll_packed(
        params, cfg, split, nodes_dist, key, batch_size=4, pad_nodes=12,
        n_passes=1, partition="t",
    )[0]

    # Manual expected value with identical packing + keys.
    n, bs = 12, 4
    n_at = split["num_atoms"]
    node_mask = (np.arange(n)[None] < n_at[:, None]).astype(np.float32)[..., None]
    pos = np.pad(split["positions"], ((0, 0), (0, 3), (0, 0)))
    mean = pos.sum(1, keepdims=True) / n_at[:, None, None]
    pos = (pos - mean) * node_mask
    oh = np.pad(split["one_hot"], ((0, 0), (0, 3), (0, 0))) * node_mask
    ch = np.pad(split["charges"], ((0, 0), (0, 3)))[..., None] * node_mask
    log_pN = nodes_dist.log_prob(n_at)
    nll_fn = factory.model_nll_fn(cfg, training=False)
    total = 0.0
    for i in range(3):  # ceil(11/4) steps
        sl = slice(i * bs, (i + 1) * bs)
        w = np.zeros(bs); w[: max(0, min(m - i * bs, bs))] = 1.0
        def take(a):
            # The packed path pads the tail by cycling rows (np.resize).
            out = np.resize(a, (3 * bs,) + a.shape[1:])[sl]
            return jnp.asarray(out.astype(np.float32))
        nm = take(node_mask)
        k = jax.random.fold_in(sub, i)
        nll = nll_fn(params, k, take(pos), take(oh), take(ch), nm,
                     build_edge_mask(nm), None)
        lpn = take(log_pN[..., None])[..., 0]
        total += float(jnp.sum((nll - lpn) * jnp.asarray(w)))
    np.testing.assert_allclose(got, total / m, rtol=2e-5)


def test_evaluate_nll_packed_finite_for_ldm_with_padded_tail():
    """Regression: the padded tail must repeat real molecules — an all-zero
    node_mask row makes the LATENT model's per-graph reductions NaN, and
    NaN * weight(0) poisoned the whole scan (seen on the 10k TPU run)."""
    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.models import factory
    from geoldm_tpu.train import trainer as trainer_mod

    info = get_dataset_info("qm9")
    cfg = factory.make_latent_diffusion_config(
        info, nf=16, n_layers=1, latent_nf=1, diffusion_steps=8
    )
    params = factory.init_params(jax.random.key(0), cfg)
    nodes_dist = DistributionNodes(info.n_nodes)
    m, stored_n = 5, 9
    rng = np.random.default_rng(1)
    num_atoms = np.minimum(nodes_dist.sample(m, rng), stored_n)
    mask = (np.arange(stored_n)[None] < num_atoms[:, None]).astype(np.float32)
    split = {
        "num_atoms": num_atoms,
        "positions": (rng.standard_normal((m, stored_n, 3)) * mask[..., None]
                      ).astype(np.float32),
        "one_hot": np.eye(5, dtype=np.float32)[rng.integers(0, 5, (m, stored_n))],
        "charges": rng.integers(1, 9, (m, stored_n)).astype(np.float32),
    }
    vals = trainer_mod.evaluate_nll_packed(
        params, cfg, split, nodes_dist, jax.random.key(3),
        batch_size=4, pad_nodes=12, n_passes=2, partition="t",
    )
    assert np.isfinite(vals).all()


def _nll_split(m=11, stored_n=9, seed=0):
    rng = np.random.default_rng(seed)
    nodes_dist = DistributionNodes(INFO.n_nodes)
    num_atoms = np.minimum(nodes_dist.sample(m, rng), stored_n)
    mask = (np.arange(stored_n)[None] < num_atoms[:, None]).astype(np.float32)
    return {
        "num_atoms": num_atoms,
        "positions": (rng.standard_normal((m, stored_n, 3)) * mask[..., None]
                      ).astype(np.float32),
        "one_hot": np.eye(5, dtype=np.float32)[rng.integers(0, 5, (m, stored_n))],
        "charges": rng.integers(1, 9, (m, stored_n)).astype(np.float32),
    }, nodes_dist


def test_evaluate_nll_packed_segmented_matches_single_transfer():
    """A tiny stage_bytes budget forces multi-segment device staging; the
    result must be identical to the single-transfer path (same scan keys —
    the segment offset continues the fold_in index)."""
    from geoldm_tpu.models import factory
    from geoldm_tpu.train import trainer as trainer_mod

    cfg = factory.make_diffusion_model_config(INFO, nf=16, n_layers=1,
                                              diffusion_steps=8)
    params = factory.init_params(jax.random.key(0), cfg)
    split, nodes_dist = _nll_split()
    kw = dict(batch_size=4, pad_nodes=12, n_passes=1, partition="t")
    single = trainer_mod.evaluate_nll_packed(
        params, cfg, split, nodes_dist, jax.random.key(7), **kw
    )[0]
    segmented = trainer_mod.evaluate_nll_packed(
        params, cfg, split, nodes_dist, jax.random.key(7), stage_bytes=1, **kw
    )[0]
    np.testing.assert_allclose(segmented, single, rtol=2e-6)


@pytest.mark.slow
def test_evaluate_nll_packed_augment_noise():
    """augment_noise > 0 perturbs coordinates on device per pass (reference
    applies eval-time augment noise, train_test.py:119-124): the value must
    stay finite and differ from the noise-free evaluation."""
    from geoldm_tpu.models import factory
    from geoldm_tpu.train import trainer as trainer_mod

    cfg = factory.make_diffusion_model_config(INFO, nf=16, n_layers=1,
                                              diffusion_steps=8)
    params = factory.init_params(jax.random.key(0), cfg)
    split, nodes_dist = _nll_split(seed=3)
    kw = dict(batch_size=4, pad_nodes=12, n_passes=1, partition="t")
    clean = trainer_mod.evaluate_nll_packed(
        params, cfg, split, nodes_dist, jax.random.key(5), **kw
    )[0]
    noisy = trainer_mod.evaluate_nll_packed(
        params, cfg, split, nodes_dist, jax.random.key(5),
        augment_noise=0.5, **kw
    )[0]
    assert np.isfinite(noisy)
    assert abs(noisy - clean) > 1e-6


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_evaluate_nll_mesh_counts_every_molecule():
    """With a mesh, uneven tail batches are padded with zero-weight repeats
    (not trimmed): every molecule contributes exactly once, matching the
    no-mesh evaluation of the same batches with a deterministic metric."""
    from geoldm_tpu.train import trainer as trainer_mod

    nodes_dist = DistributionNodes(INFO.n_nodes)
    batches = [
        synthetic_batch(INFO, b, pad_nodes=12, rng=np.random.default_rng(s))
        for s, b in ((0, 8), (1, 8), (2, 3))  # tail of 3 on a dp=8 mesh
    ]

    def metric_fn(params, batch, key):
        per_mol = jnp.sum(batch["x"] ** 2, axis=(1, 2)) - batch["log_pN"]
        w = batch.get("weight")
        if w is None:
            return jnp.mean(per_mol)
        return jnp.sum(per_mol * w) / jnp.maximum(jnp.sum(w), 1.0)

    expected = trainer_mod.evaluate_nll(
        None, metric_fn, batches, nodes_dist, jax.random.key(0), partition="t"
    )
    mesh = shd.make_mesh(dp=8, tp=1)
    got = trainer_mod.evaluate_nll(
        None, metric_fn, batches, nodes_dist, jax.random.key(0),
        partition="t", mesh=mesh,
    )
    np.testing.assert_allclose(got, expected, rtol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_train_epoch_shards_batches_on_mesh():
    """train_epoch(mesh=...) must commit batches to the data-sharded layout
    (regression: the CLI path built a mesh but never sharded batches, so
    every device redundantly computed the full batch) and produce the same
    params as the unsharded run — including the uneven tail batch, which is
    trimmed to a data-axis multiple."""
    from geoldm_tpu.train import trainer as trainer_mod

    cfg = tiny_cfg(nf=16)
    tc = TrainConfig(lr=1e-3, ema_decay=0.0, clip_grad=False)
    nodes_dist = DistributionNodes(INFO.n_nodes)
    mesh = shd.make_mesh(dp=8, tp=1)

    def raw_batches():
        # Two full batches of 8 + one uneven tail of 3 (trimmed under dp=8).
        out = []
        for seed, b in ((0, 8), (1, 8), (2, 3)):
            rng = np.random.default_rng(seed)
            raw = synthetic_batch(INFO, b, pad_nodes=12, rng=rng)
            out.append(raw)
        return out

    def run(mesh_arg, trim_tail):
        state, tx = create_train_state(jax.random.key(0), cfg, tc)
        step = jax.jit(make_train_step(cfg, tc, tx))
        if mesh_arg is not None:
            p_sh = shd.param_shardings(state.params, mesh_arg)
            state = state._replace(
                params=jax.device_put(state.params, p_sh),
                ema_params=jax.device_put(state.ema_params, p_sh),
            )
        batches = raw_batches()
        if trim_tail:
            batches = batches[:2]  # tail is dropped entirely at b=3 < dp=8
        state, _ = trainer_mod.train_epoch(
            state, step, batches, nodes_dist, jax.random.key(1), 0,
            mesh=mesh_arg,
        )
        return jax.tree.map(np.asarray, state.params)

    p_mesh = run(mesh, trim_tail=False)
    p_single = run(None, trim_tail=True)
    for a, b in zip(jax.tree.leaves(p_single), jax.tree.leaves(p_mesh)):
        np.testing.assert_allclose(b, a, atol=1e-5)


def test_frozen_mask_zeroes_updates_even_with_nonzero_grads():
    """optax.masked alone passes masked-out grads through UNCHANGED; the
    optimizer must explicitly zero frozen leaves so freezing holds even if
    a future loss term sends gradient into them."""
    params = {"vae": {"w": jnp.ones(3)}, "dynamics": {"w": jnp.ones(3)}}
    mask = {"vae": {"w": False}, "dynamics": {"w": True}}
    tx = optim_mod.make_optimizer(lr=0.1, frozen_mask=mask, clip_grad=False)
    st = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    upd, _ = tx.update(grads, st, params)
    np.testing.assert_array_equal(np.asarray(upd["vae"]["w"]), 0.0)
    assert np.max(np.abs(np.asarray(upd["dynamics"]["w"]))) > 0


def test_amsgrad_torch_maxes_raw_second_moment():
    """scale_by_amsgrad_torch must max the RAW nu and bias-correct the max
    with the CURRENT step's correction (torch semantics): after a large
    early gradient followed by small ones, its denominator decays as
    bc2 -> 1, while optax.scale_by_amsgrad's (max over bias-corrected
    nu-hat) stays pinned at the inflated early value. Verified against a
    literal numpy transcription of torch/optim/adam.py."""
    b1, b2, eps = 0.9, 0.999, 1e-8
    tx = optim_mod.scale_by_amsgrad_torch(b1, b2, eps)
    g_seq = [5.0, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1]

    params = {"w": jnp.zeros((1,))}
    state = tx.init(params)
    got = []
    for g in g_seq:
        upd, state = tx.update({"w": jnp.full((1,), g)}, state, params)
        got.append(float(upd["w"][0]))

    mu = nu = nu_max = 0.0
    want = []
    for t, g in enumerate(g_seq, start=1):
        mu = b1 * mu + (1 - b1) * g
        nu = b2 * nu + (1 - b2) * g * g
        nu_max = max(nu_max, nu)
        bc1, bc2 = 1 - b1**t, 1 - b2**t
        want.append((mu / bc1) / (np.sqrt(nu_max / bc2) + eps))
    # f32 transform vs f64 numpy reference
    np.testing.assert_allclose(got, want, rtol=1e-4)

    # And the optax variant really is different here (the documented bug
    # this transform exists to avoid) — steps shrink under it.
    tx_ox = optax.scale_by_amsgrad(b1=b1, b2=b2, eps=eps)
    st = tx_ox.init(params)
    ox = []
    for g in g_seq:
        upd, st = tx_ox.update({"w": jnp.full((1,), g)}, st, params)
        ox.append(float(upd["w"][0]))
    assert ox[-1] < 0.75 * got[-1], (ox[-1], got[-1])


@pytest.mark.slow
def test_amsgrad_torch_matches_torch_trajectory():
    """Parameter trajectories through make_optimizer's AMSGrad match
    torch.optim.Adam(amsgrad=True) exactly (same gradient sequence,
    decaying magnitudes — the regime where the optax variant diverges to
    ~0.26x step sizes; reference trains with amsgrad, qm9/models.py:175)."""
    import torch

    rng = np.random.default_rng(0)
    grads = [
        (3.0 / (1 + 0.1 * t)) * rng.standard_normal(6).astype(np.float32)
        for t in range(120)
    ]
    lr = 5e-4

    p_t = torch.zeros(6, requires_grad=True)
    opt = torch.optim.Adam([p_t], lr=lr, amsgrad=True)
    for g in grads:
        opt.zero_grad()
        p_t.grad = torch.from_numpy(g.copy())
        opt.step()

    tx = optax.chain(optim_mod.scale_by_amsgrad_torch(), optax.scale(-lr))
    p_j = jnp.zeros(6)
    st = tx.init(p_j)
    for g in grads:
        upd, st = tx.update(jnp.asarray(g), st, p_j)
        p_j = optax.apply_updates(p_j, upd)

    np.testing.assert_allclose(
        np.asarray(p_j), p_t.detach().numpy(), atol=2e-6
    )

"""Tests for the sampling server (geoldm_tpu/cli/serve.py): health, metrics,
JSON and xyz generation, request validation — driven over real HTTP against
a tiny checkpoint."""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from geoldm_tpu.data.datasets_config import get_dataset_info
from geoldm_tpu.models import factory
from geoldm_tpu.utils import checkpoint as ckpt

INFO = get_dataset_info("qm9")


def _request(base, path, body=None):
    if body is None:
        req = urllib.request.Request(base + path)
    else:
        req = urllib.request.Request(
            base + path, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from geoldm_tpu.cli import serve

    tmp = tmp_path_factory.mktemp("serve")
    cfg = factory.make_latent_diffusion_config(
        INFO, nf=16, n_layers=1, latent_nf=1, diffusion_steps=6,
    )
    params = factory.init_params(jax.random.key(0), cfg)
    path = str(tmp / "gen")
    ckpt.save_checkpoint(path, {"params": params, "ema_params": params}, cfg,
                         name="best")
    srv, service = serve.main(
        ["--model_path", path, "--port", "0", "--batch_max", "8",
         "--compute_dtype", "float32", "--n_steps", "3", "--no_warmup"],
        serve_forever=False,
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, service
    srv.shutdown()


def test_health(server):
    base, _ = server
    code, body = _request(base, "/health")
    assert code == 200
    assert body["status"] == "ok"
    assert body["kind"] == "latent_diffusion"
    assert body["buckets"][-1] == 32  # qm9 top bucket 8-aligned


def test_sample_json_with_sizes(server):
    base, _ = server
    code, body = _request(base, "/sample",
                          {"sizes": [5, 9, 7], "seed": 1})
    assert code == 200
    assert body["n"] == 3
    assert [len(m) for m in body["molecules"]] == [5, 9, 7]
    el, x, y, z = body["molecules"][0][0]
    assert el in INFO["atom_decoder"]
    assert all(np.isfinite([x, y, z]))
    assert body["sampler"]["protocol"] == "fewstep-3"
    assert len(body["stable"]) == 3


def test_sample_xyz_and_histogram_sizes(server):
    base, _ = server
    code, body = _request(base, "/sample",
                          {"n_samples": 4, "format": "xyz", "seed": 2})
    assert code == 200
    assert body["n"] == 4
    first = body["molecules"][0].splitlines()
    assert int(first[0]) == len(first) - 2  # xyz header matches atom lines


def test_sample_dense_protocol_override(server):
    base, _ = server
    code, body = _request(base, "/sample",
                          {"sizes": [4], "n_steps": 0, "seed": 3})
    assert code == 200
    assert body["sampler"]["protocol"] == "dense-T"


def test_unseeded_requests_are_fresh(server):
    """Two requests without an explicit seed must draw different molecules
    (a per-request counter is mixed into the base seed), and each response
    echoes the seed it used so the draw is reproducible."""
    base, _ = server
    code1, b1 = _request(base, "/sample", {"n_samples": 2})
    code2, b2 = _request(base, "/sample", {"n_samples": 2})
    assert code1 == code2 == 200
    assert b1["seed"] != b2["seed"]
    assert b1["molecules"] != b2["molecules"]
    # replaying the echoed seed reproduces the first draw exactly
    code3, b3 = _request(base, "/sample", {"n_samples": 2, "seed": b1["seed"]})
    assert code3 == 200 and b3["molecules"] == b1["molecules"]


def test_unseeded_base_has_startup_entropy(server):
    """A restarted server must not replay the previous process's unseeded
    molecule sequence: the auto-seed base mixes per-process entropy on top
    of --seed (the probability it equals the bare CLI seed is 2^-48)."""
    _, service = server
    assert service._auto_seed_base != service.args.seed


def test_n_steps_validated_and_quantized(server):
    """n_steps is a trace-time constant (each distinct value = one
    compiled sampler program): out-of-range values are rejected at parse
    time, in-range non-ladder values snap to the nearest allowed setting
    (echoed in the response), bounding the compiled-program space a
    client can induce. Fixture checkpoint has T=6, server default 3."""
    base, _ = server
    # beyond this checkpoint's timestep count -> 400, not a late failure
    code, body = _request(base, "/sample",
                          {"sizes": [4], "n_steps": 7, "seed": 5})
    assert code == 400 and "n_steps" in body["error"]
    # 4 is not on the ladder: snaps down to 3 (ties prefer the smaller)
    code, body = _request(base, "/sample",
                          {"sizes": [4], "n_steps": 4, "seed": 5})
    assert code == 200
    assert body["sampler"]["n_steps"] == 3
    # ladder values in range pass through unchanged
    code, body = _request(base, "/sample",
                          {"sizes": [4], "n_steps": 2, "seed": 5})
    assert code == 200
    assert body["sampler"]["n_steps"] == 2
    # T itself is always a rung even when off-ladder (T=6 here): a
    # dense-count request must not silently snap below the checkpoint's
    # own timestep count (round-4 advisor finding for T>1000 models)
    code, body = _request(base, "/sample",
                          {"sizes": [4], "n_steps": 6, "seed": 5})
    assert code == 200
    assert body["sampler"]["n_steps"] == 6


def test_validation_errors(server):
    base, _ = server
    code, body = _request(base, "/sample", {"sizes": []})
    assert code == 400 and "sizes" in body["error"]
    code, body = _request(base, "/sample", {"sizes": [99]})
    assert code == 400
    code, body = _request(base, "/sample", {"n_samples": 0})
    assert code == 400
    code, body = _request(base, "/nope", {})
    assert code == 404
    # malformed bodies must still get an HTTP reply, not a dropped socket
    code, body = _request(base, "/sample", [1, 2, 3])
    assert code == 400 and "JSON object" in body["error"]
    code, body = _request(base, "/sample", {"n_samples": [5]})
    assert code == 400
    code, body = _request(base, "/sample", {"sizes": "abc"})
    assert code == 400


@pytest.fixture(scope="module")
def cond_server(tmp_path_factory):
    """Conditional checkpoint + fabricated datadir behind the server."""
    from geoldm_tpu.cli import serve

    tmp = tmp_path_factory.mktemp("cond_serve")
    rng = np.random.default_rng(0)
    datadir = tmp / "data"
    (datadir / "qm9").mkdir(parents=True)
    for split, m in (("train", 64), ("valid", 16), ("test", 16)):
        num_atoms = rng.integers(4, 10, size=m)
        charges = np.zeros((m, 29), dtype=np.int64)
        pos = np.zeros((m, 29, 3), dtype=np.float32)
        for i, na in enumerate(num_atoms):
            charges[i, :na] = rng.choice([1, 6, 7, 8, 9], size=na)
            pos[i, :na] = rng.normal(size=(na, 3))
        np.savez(datadir / "qm9" / f"{split}.npz", num_atoms=num_atoms,
                 charges=charges, positions=pos,
                 alpha=rng.normal(70, 8, size=m).astype(np.float32),
                 mu=rng.normal(size=m).astype(np.float32),
                 U0=rng.normal(size=m).astype(np.float32),
                 U0_thermo=rng.normal(size=m).astype(np.float32))

    cfg = factory.make_latent_diffusion_config(
        INFO, nf=16, n_layers=1, latent_nf=1, diffusion_steps=6,
        context_node_nf=1, context_indicator=True,
    )
    params = factory.init_params(jax.random.key(0), cfg)
    path = str(tmp / "gen")
    ckpt.save_checkpoint(path, {"params": params, "ema_params": params}, cfg,
                         name="best")
    srv, service = serve.main(
        ["--model_path", path, "--port", "0", "--batch_max", "8",
         "--compute_dtype", "float32", "--n_steps", "3", "--no_warmup",
         "--datadir", str(datadir), "--conditioning", "alpha"],
        serve_forever=False,
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", service
    srv.shutdown()


def test_conditional_serving(cond_server):
    base, service = cond_server
    # Explicit property values in raw units, with guidance + guard knobs.
    code, body = _request(base, "/sample", {
        "n_samples": 2, "seed": 4, "properties": {"alpha": 75.0},
        "cfg_scale": 2.0, "clip_z": 15.0,
    })
    assert code == 200 and body["n"] == 2
    assert body["properties"] == {"alpha": 75.0}
    assert body["cfg_scale"] == 2.0
    # Omitted properties: drawn from the data distribution; sizes come
    # from the TRAINING split's histogram (4..9 atoms here), not the
    # canned QM9 table (up to 29).
    code, body = _request(base, "/sample", {"n_samples": 4, "seed": 4})
    assert code == 200
    assert body["properties"] == "sampled-from-data-distribution"
    assert max(len(m) for m in body["molecules"]) <= 9
    # Validation: wrong property name -> 400 with a readable message.
    code, body = _request(base, "/sample",
                          {"n_samples": 1, "properties": {"mu": 1.0}})
    assert code == 400 and "alpha" in body["error"]


def test_conditional_checkpoint_requires_datadir(tmp_path):
    from geoldm_tpu.cli import serve

    cfg = factory.make_latent_diffusion_config(
        INFO, nf=16, n_layers=1, latent_nf=1, diffusion_steps=6,
        context_node_nf=1,
    )
    params = factory.init_params(jax.random.key(0), cfg)
    path = str(tmp_path / "gen")
    ckpt.save_checkpoint(path, {"params": params, "ema_params": params}, cfg,
                         name="best")
    with pytest.raises(SystemExit, match="conditional checkpoint"):
        serve.main(["--model_path", path, "--port", "0", "--no_warmup"],
                   serve_forever=False)


def test_unconditional_rejects_properties(server):
    base, _ = server
    code, body = _request(base, "/sample",
                          {"n_samples": 1, "properties": {"alpha": 1.0}})
    assert code == 400 and "unconditional" in body["error"]


def test_request_coalescing(server):
    """Concurrent unseeded requests merge into shared device dispatches:
    deterministically via a slowed _generate (all queued requests land in
    ONE batch), and over real HTTP all succeed with correct slice sizes."""
    import time as time_mod

    base, service = server

    # Deterministic in-process check: block the worker mid-dispatch so the
    # next 3 submissions queue up, then verify they merge into one call.
    calls = []
    real_generate = service._generate
    gate = threading.Event()  # holds the FIRST dispatch until the test
    # has queued the other three requests — fully deterministic, no sleeps

    def slow_generate(sizes, *a, **kw):
        first = not calls
        calls.append(len(sizes))
        if first:
            assert gate.wait(timeout=30)
        return real_generate(sizes, *a, **kw)

    def _wait_for(pred, timeout=30.0):
        t_end = time_mod.time() + timeout
        while not pred():
            assert time_mod.time() < t_end, "condition never became true"
            time_mod.sleep(0.01)

    service._generate = slow_generate
    try:
        settings = (3, 1.0, "ddim", 1.0, 0.0)
        results = []

        def _submit(n):
            out, seed, group = service._coalescer.submit(
                np.full(n, 5, dtype=np.int64), None, 100 + n, settings)
            results.append((n, len(out[2]), group))

        # Occupy the worker (poll until it is INSIDE slow_generate), then
        # pile on 3 more and poll until all three are queued — no timing
        # assumptions, deterministic on a loaded host.
        t0 = threading.Thread(target=_submit, args=(1,))
        t0.start()
        _wait_for(lambda: len(calls) == 1)
        rest = [threading.Thread(target=_submit, args=(n,)) for n in (2, 3, 4)]
        for t in rest:
            t.start()
        _wait_for(lambda: len(service._coalescer._pending) == 3)
        gate.set()  # release the occupier; the 3 queued requests merge
        for t in [t0] + rest:
            t.join(timeout=60)
        assert calls[0] == 1  # first dispatch: the solo occupier
        assert sorted(calls)[-1] == 9  # 2+3+4 merged into one dispatch
        for n, got, group in results:
            assert got == n  # every request got exactly its slice
        assert {g for n, _, g in results if n > 1} == {3}
    finally:
        service._generate = real_generate

    # Dispatch failure fans out to every request in the merged group.
    def boom(sizes, *a, **kw):
        raise RuntimeError("device fell over")

    service._generate = boom
    try:
        errs = []

        def _submit_err():
            try:
                service._coalescer.submit(
                    np.full(2, 5, dtype=np.int64), None, 7,
                    (3, 1.0, "ddim", 1.0, 0.0))
            except RuntimeError as e:
                errs.append(str(e))

        ts = [threading.Thread(target=_submit_err) for _ in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=30)
        assert errs == ["device fell over"] * 3
    finally:
        service._generate = real_generate

    # Over real HTTP: concurrent unseeded requests all succeed.
    codes = []

    def _post():
        codes.append(_request(base, "/sample", {"n_samples": 2})[0])

    threads = [threading.Thread(target=_post) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert codes == [200, 200, 200, 200]
    code, m = _request(base, "/metrics")
    assert code == 200 and m["dispatches"] <= m["requests"]


def test_metrics_accumulate(server):
    base, service = server
    code, body = _request(base, "/metrics")
    assert code == 200
    assert body["requests"] >= 3
    assert body["molecules"] >= 8
    assert body["errors"] >= 3
    assert body["latency_s"]["p50"] > 0

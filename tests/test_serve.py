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


def test_metrics_accumulate(server):
    base, service = server
    code, body = _request(base, "/metrics")
    assert code == 200
    assert body["requests"] >= 3
    assert body["molecules"] >= 8
    assert body["errors"] >= 3
    assert body["latency_s"]["p50"] > 0

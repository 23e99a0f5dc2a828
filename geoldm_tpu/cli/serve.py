"""Molecule generation server: warm-compiled samplers behind a tiny HTTP API.

Production-serving path with no reference counterpart: loads a checkpoint,
pre-compiles the size-bucketed sampler for every bucket — chunks are padded
to the full batch so the warmed shapes are the complete set, and requests
at the launch-time sampler settings pay zero XLA compile (overriding
n_steps/eta/sampler re-traces once, warm thereafter) — and serves JSON over
stdlib http.server, no external dependencies, one process per accelerator.

Endpoints:
  GET  /health   -> {"status": "ok", "model": ..., "buckets": [...]}
  GET  /metrics  -> request/molecule counters + latency quantiles (JSON)
  POST /sample   -> {"n_samples": int} or {"sizes": [int, ...]}, optional
                    {"seed": int, "n_steps": int, "eta": float,
                     "sampler": "ddim"|"dpm2m", "format": "xyz"|"json"}
                    Returns generated molecules: "json" (default) gives
                    per-molecule atom lists [[element, x, y, z], ...] plus
                    stability verdicts; "xyz" gives xyz-format text blocks.

Conditional checkpoints (launch with --datadir + --conditioning): requests
may add {"properties": {"alpha": 75.0, ...}} in raw units (the server
normalizes with the training-split mean/MAD and steers every molecule to
those values) — omitted, properties are drawn from the data's
property-given-size distribution. Per-request {"cfg_scale": w,
"clip_z": R} select classifier-free guidance and the dynamic-range guard.

Device calls are serialized with a lock (one chip, one compiled program at
a time); request handling itself is threaded so health/metrics stay
responsive during generation.

Usage: python -m geoldm_tpu.cli.serve --model_path outputs/qm9_ldm
           [--port 8000] [--n_steps 50]
"""

from __future__ import annotations

import argparse
import json
import os
import threading
import time

# Allowed per-request few-step settings. n_steps is a trace-time constant
# (each value = one compiled sampler program); bounding requests to this
# ladder bounds the whole compiled-program space a client can induce.
_NSTEPS_LADDER = (1, 2, 3, 5, 8, 10, 15, 20, 25, 35, 50, 75, 100,
                  150, 250, 375, 500, 750, 1000, 1500, 2000, 3000, 4000)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="geoldm-tpu sampling server")
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--dataset", type=str, default="qm9")
    p.add_argument("--remove_h", action="store_true")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch_max", type=int, default=250,
                   help="max molecules per device dispatch; larger requests "
                        "are chunked")
    p.add_argument("--compute_dtype", type=str, default="bfloat16_mixed")
    p.add_argument("--n_steps", type=int, default=None,
                   help="default few-step setting for requests that don't "
                        "specify one (None = dense reference protocol)")
    p.add_argument("--eta", type=float, default=1.0)
    p.add_argument("--sampler", type=str, default="ddim",
                   choices=["ddim", "dpm2m"])
    p.add_argument("--use_ema", type=eval, default=True)
    p.add_argument("--datadir", type=str, default=None,
                   help="dataset dir (REQUIRED for conditional checkpoints: "
                        "property normalizers and the property-given-size "
                        "distribution come from the training split)")
    p.add_argument("--conditioning", nargs="+", default=[],
                   help="property names the checkpoint was conditioned on")
    p.add_argument("--cfg_scale", type=float, default=1.0,
                   help="default classifier-free guidance scale for "
                        "conditional requests")
    p.add_argument("--clip_z", type=float, default=0.0,
                   help="default per-step dynamic-range guard")
    p.add_argument("--no_warmup", action="store_true",
                   help="skip the startup warm-compile pass (first request "
                        "then pays the compile)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


class _Coalescer:
    """Adaptive request batching for unseeded requests.

    With chunk_pad='full' every dispatch pays a full (batch_max, bucket)
    program regardless of request size, so merging concurrent small
    requests into ONE dispatch is a direct N-fold throughput win under
    load. While the device runs one dispatch, newly arriving requests
    queue; the worker then merges ALL pending requests with the same
    compiled-sampler settings (n_steps/eta/method/cfg_scale/clip_z) into
    a single bucketed dispatch and slices the outputs back per request.
    No artificial wait is added — an idle server dispatches immediately
    (a solo group behaves exactly like the unbatched path, so echoed-seed
    replay still reproduces it; merged groups are marked "coalesced").
    Seeded requests bypass coalescing entirely for exact replay."""

    def __init__(self, service):
        self._service = service
        self._cond = threading.Condition()
        self._pending = []
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="geoldm-serve-batcher")
        self._thread.start()

    def submit(self, sizes, ctx, seed, settings):
        """Block until the merged dispatch containing this request is done;
        returns ((one_hot, charges, x, node_mask) slices, dispatch_seed,
        group_size). Raises the dispatch's exception if it failed."""
        item = {
            "sizes": sizes, "ctx": ctx, "seed": seed, "settings": settings,
            "event": threading.Event(), "result": None, "error": None,
            "dispatch_seed": None, "group": 0,
        }
        with self._cond:
            self._pending.append(item)
            self._cond.notify()
        item["event"].wait()
        if item["error"] is not None:
            raise item["error"]
        return item["result"], item["dispatch_seed"], item["group"]

    def _run(self):
        import numpy as np

        while True:
            with self._cond:
                while not self._pending:
                    self._cond.wait()
                settings = self._pending[0]["settings"]
                group = [it for it in self._pending
                         if it["settings"] == settings]
                self._pending = [it for it in self._pending
                                 if it["settings"] != settings]
            # The ENTIRE per-group body is guarded: an exception escaping
            # this worker would kill the only batcher thread and hang every
            # in-flight and future unseeded request (submit() waits on its
            # Event) — a silent partial outage. Errors fan out per request
            # instead.
            try:
                seed = group[0]["seed"]  # solo group == unbatched semantics
                sizes = np.concatenate([it["sizes"] for it in group])
                ctx = (np.concatenate([it["ctx"] for it in group])
                       if group[0]["ctx"] is not None else None)
                n_steps, eta, method, cfg_scale, clip_z = settings
                out = self._service._generate(
                    sizes, seed, n_steps, eta, method, context=ctx,
                    cfg_scale=cfg_scale, clip_z=clip_z)
                with self._service.metrics_lock:
                    self._service.dispatches += 1
                lo = 0
                for it in group:
                    hi = lo + len(it["sizes"])
                    it["result"] = tuple(a[lo:hi] for a in out)
                    it["dispatch_seed"] = seed
                    it["group"] = len(group)
                    lo = hi
            except Exception as e:  # noqa: BLE001 — delivered per-request
                for it in group:
                    it["error"] = e
            finally:
                for it in group:
                    it["event"].set()


class SamplerService:
    """Checkpoint + compiled samplers + metrics. Thread-safe via a device
    lock: jax dispatches are serialized, bookkeeping is per-call."""

    def __init__(self, args):
        import jax
        import numpy as np

        from geoldm_tpu.data.datasets_config import get_dataset_info
        from geoldm_tpu.models import factory
        from geoldm_tpu.models.distributions import DistributionNodes
        from geoldm_tpu.train import sampling as sampling_mod
        from geoldm_tpu.utils import checkpoint as ckpt

        self._np = np
        self._jax = jax
        self._sampling = sampling_mod
        self.args = args
        self.model_cfg = ckpt.load_config(args.model_path)
        self.timesteps = (self.model_cfg.diffusion.timesteps
                          if self.model_cfg.diffusion is not None else 1000)
        self.dataset_info = get_dataset_info(args.dataset, args.remove_h)
        self.nodes_dist = DistributionNodes(self.dataset_info.n_nodes)
        template = {"params": factory.init_params(jax.random.key(0), self.model_cfg)}
        template["ema_params"] = template["params"]
        state = ckpt.load_checkpoint(args.model_path, template=template,
                                     name="best")
        self.params = state["ema_params"] if args.use_ema else state["params"]

        from geoldm_tpu.utils.buckets import covering_buckets

        self.buckets = covering_buckets(
            sampling_mod.default_buckets(self.dataset_info),
            self.dataset_info["max_n_nodes"])

        # Conditional checkpoints: property normalizers + the
        # property-given-size distribution come from the training split
        # (same second-half convention as eval_conditional_qm9).
        ctx_nf = (self.model_cfg.dynamics.context_node_nf
                  if self.model_cfg.dynamics is not None
                  else self.model_cfg.vae.context_node_nf)
        n_props = ctx_nf - int(getattr(self.model_cfg, "context_indicator",
                                       False))
        self.prop_norms = self.prop_dist = None
        self.conditioning = list(args.conditioning)
        self.max_request_size = self.dataset_info["max_n_nodes"]
        if n_props > 0:
            if not (args.datadir and len(self.conditioning) == n_props):
                raise SystemExit(
                    f"conditional checkpoint ({n_props} property channel(s)):"
                    " pass --datadir and --conditioning with exactly"
                    f" {n_props} property name(s)")
            if "qm9" not in args.dataset:
                raise SystemExit(
                    "conditional serving currently implements the QM9 "
                    "second-half protocol only (--dataset qm9); other "
                    "datasets need their own normalizer convention")
            from geoldm_tpu.train.conditioning import load_conditional_protocol

            # Normalizers, property-given-size distribution, and the
            # molecule-size histogram all come from the TRAINING split —
            # the checkpoint only ever saw the split's sizes, and
            # out-of-range sizes generate garbage.
            _, self.prop_norms, self.prop_dist, self.nodes_dist, pad = (
                load_conditional_protocol(args.datadir, self.conditioning))
            self.max_request_size = pad

        self.device_lock = threading.Lock()
        self.metrics_lock = threading.Lock()
        self.requests = 0
        self.molecules = 0
        self.errors = 0
        self.dispatches = 0  # coalesced device dispatches (vs requests)
        self._auto_seed = 0  # per-request counter for unseeded requests
        # Fresh entropy per process: unseeded requests draw new streams
        # across restarts (48-bit keeps seed + counter inside int64).
        self._auto_seed_base = args.seed + int.from_bytes(
            os.urandom(6), "little")
        self.latencies = []  # seconds, capped window
        self.started = time.time()
        self._coalescer = _Coalescer(self)

    def warmup(self):
        """Compile the sampler at every bucket so serving latency never
        includes XLA compilation. Serving pads every chunk to the full
        batch_max (chunk_pad='full' below), so (batch_max, bucket) per
        bucket is the COMPLETE set of shapes requests can hit — at the
        cost of padded compute on remainder chunks, the right trade for
        predictable latency. Requests overriding n_steps/eta/sampler
        still trace on first use (warm thereafter; the persistent compile
        cache makes even that cheap across restarts)."""
        import numpy as np

        t0 = time.time()
        sizes = np.concatenate([
            np.full(self.args.batch_max, min(b, self.dataset_info["max_n_nodes"]))
            for b in self.buckets
        ])
        ctx = (self.prop_dist.sample_batch(sizes, np.random.default_rng(0))
               if self.prop_dist is not None else None)
        self._generate(sizes, seed=0, n_steps=self.args.n_steps,
                       eta=self.args.eta, method=self.args.sampler,
                       context=ctx, cfg_scale=self.args.cfg_scale,
                       clip_z=self.args.clip_z)
        return time.time() - t0

    def _generate(self, sizes, seed, n_steps, eta, method, context=None,
                  cfg_scale=1.0, clip_z=0.0):
        import jax
        import numpy as np

        with self.device_lock:
            one_hot, charges, x, node_mask = self._sampling.sample_bucketed(
                self.model_cfg, self.params, jax.random.key(seed),
                self.dataset_info, np.asarray(sizes, dtype=np.int64),
                batch_size=self.args.batch_max, buckets=self.buckets,
                context=context, compute_dtype=self.args.compute_dtype,
                rng=np.random.default_rng(seed), n_steps=n_steps, eta=eta,
                method=method, chunk_pad="full", guidance_scale=cfg_scale,
                clip_z=clip_z,
            )
        return one_hot, charges, x, node_mask

    def sample(self, body: dict) -> dict:
        """Handle one /sample request body; returns the response dict."""
        import numpy as np

        from geoldm_tpu.evalsuite.analyze import check_stability

        t0 = time.time()
        if "seed" in body:
            try:
                seed = int(body["seed"])
            except (TypeError, ValueError):
                raise ValueError("seed must be an integer") from None
        else:
            # Unseeded requests must not repeat: mix a monotonic counter
            # into the base seed so every request draws fresh molecules
            # (the response echoes the seed for reproducibility). The base
            # includes startup entropy so a restarted server doesn't
            # replay the exact same molecule sequence for the same
            # request sequence — replayability comes from the echoed
            # seed, not from process-lifetime determinism.
            with self.metrics_lock:
                self._auto_seed += 1
                seed = self._auto_seed_base + self._auto_seed

        def _num(name, default, cast, lo=None, hi=None):
            try:
                v = cast(body.get(name, default))
            except (TypeError, ValueError):
                raise ValueError(f"{name} must be a number") from None
            if (lo is not None and v < lo) or (hi is not None and v > hi):
                raise ValueError(f"{name} must be in [{lo}, {hi}]")
            return v

        if "sizes" in body:
            try:
                sizes = np.asarray(body["sizes"], dtype=np.int64)
            except (TypeError, ValueError):
                raise ValueError("sizes must be a list of ints") from None
            if sizes.ndim != 1 or len(sizes) == 0:
                raise ValueError("sizes must be a non-empty list of ints")
            # For conditional checkpoints the bound is the TRAINING
            # split's max size, not the canned dataset table — larger
            # molecules are out of the model's training range.
            max_n = self.max_request_size
            if sizes.min() < 1 or sizes.max() > max_n:
                raise ValueError(f"sizes must be in [1, {max_n}]")
        else:
            n = _num("n_samples", 1, int, 1, 100_000)
            sizes = self.nodes_dist.sample(n, np.random.default_rng(seed))

        n_steps = body.get("n_steps", self.args.n_steps)
        if n_steps in (None, 0):
            n_steps = None
        else:
            try:
                n_steps = int(n_steps)
            except (TypeError, ValueError):
                raise ValueError("n_steps must be an integer") from None
            T = self.timesteps
            if not 1 <= n_steps <= T:
                raise ValueError(
                    f"n_steps must be in [1, {T}] (this checkpoint's "
                    "timestep count; null/0 selects the dense sampler)")
            # Each distinct n_steps is a trace-time constant compiling a
            # distinct XLA program — snap to a fixed ladder (like
            # cfg_scale/clip_z quantization below) so a chatty client
            # can't thrash the compiled-sampler LRU with hundreds of
            # distinct values. Ties snap down; the response echoes the
            # effective value. The server's own --n_steps default is
            # always allowed un-snapped.
            # T itself is always a rung, so a dense-count request on a
            # checkpoint whose T is off-ladder (e.g. T=1800) never snaps
            # silently far below it.
            if n_steps != self.args.n_steps:
                n_steps = min(
                    (k for k in (*_NSTEPS_LADDER, T) if k <= T),
                    key=lambda k: (abs(k - n_steps), k),
                )
        eta = _num("eta", self.args.eta, float, 0.0, 1.0)
        method = str(body.get("sampler", self.args.sampler))
        if method not in ("ddim", "dpm2m"):
            raise ValueError("sampler must be 'ddim' or 'dpm2m'")
        # cfg_scale/clip_z are trace-time constants: each distinct value
        # compiles a distinct sampler. Quantize to 0.25 steps (bounds the
        # program space; a novel setting traces once, warm thereafter) and
        # normalize to the semantic no-ops for unconditional checkpoints.
        cfg_scale = round(_num("cfg_scale", self.args.cfg_scale,
                               float, 0.0, 10.0) * 4) / 4
        clip_z = round(_num("clip_z", self.args.clip_z,
                            float, 0.0, 1000.0) * 4) / 4
        if self.prop_dist is None:
            cfg_scale = 1.0  # guided_eps is a no-op without context

        ctx, props_used = None, None
        if self.prop_dist is not None:
            if "properties" in body:
                # Raw-unit values, one per conditioned property; the
                # server normalizes with the training-split mean/MAD.
                props = body["properties"]
                if not isinstance(props, dict):
                    raise ValueError(
                        "properties must be an object of "
                        f"{{{', '.join(self.conditioning)}}} -> value")
                cols = []
                for name in self.conditioning:
                    if name not in props:
                        raise ValueError(f"properties is missing {name!r}")
                    try:
                        v = float(props[name])
                    except (TypeError, ValueError):
                        raise ValueError(
                            f"properties[{name!r}] must be a number") from None
                    n0 = self.prop_norms[name]
                    cols.append((v - n0["mean"]) / n0["mad"])
                ctx = np.tile(np.asarray(cols, dtype=np.float32),
                              (len(sizes), 1))
                props_used = {k: float(props[k]) for k in self.conditioning}
            else:
                ctx = self.prop_dist.sample_batch(
                    sizes, np.random.default_rng(seed))
                props_used = "sampled-from-data-distribution"
        elif "properties" in body:
            raise ValueError("this checkpoint is unconditional — "
                             "'properties' is not accepted")

        settings = (n_steps, eta, method, cfg_scale, clip_z)
        group = 1
        if "seed" in body:
            # Explicit seed = exact-replay contract: run solo.
            one_hot, charges, x, node_mask = self._generate(
                sizes, seed, n_steps, eta, method, context=ctx,
                cfg_scale=cfg_scale, clip_z=clip_z)
            with self.metrics_lock:
                self.dispatches += 1
        else:
            (one_hot, charges, x, node_mask), seed, group = (
                self._coalescer.submit(sizes, ctx, seed, settings))

        decoder = self.dataset_info["atom_decoder"]
        fmt = body.get("format", "json")
        mols, stable = [], []
        for i in range(len(x)):
            n_i = int(node_mask[i, :, 0].sum())
            types = np.argmax(one_hot[i, :n_i], axis=1)
            stable.append(bool(
                check_stability(x[i, :n_i], types, self.dataset_info)[0]))
            if fmt == "xyz":
                lines = [f"{n_i}", ""]
                for a in range(n_i):
                    el = decoder[int(types[a])]
                    px, py, pz = x[i, a]
                    lines.append(f"{el} {px:.6f} {py:.6f} {pz:.6f}")
                mols.append("\n".join(lines))
            else:
                mols.append([
                    [decoder[int(types[a])], float(x[i, a, 0]),
                     float(x[i, a, 1]), float(x[i, a, 2])]
                    for a in range(n_i)
                ])
        elapsed = time.time() - t0
        with self.metrics_lock:
            self.requests += 1
            self.molecules += len(mols)
            self.latencies = (self.latencies + [elapsed])[-1000:]
        return {
            "molecules": mols,
            "format": fmt,
            "stable": stable,
            "n": len(mols),
            "sampler": {"n_steps": n_steps, "eta": eta, "method": method,
                        "protocol": "dense-T" if n_steps is None
                        else f"fewstep-{n_steps}"},
            # A merged group's dispatch seed cannot reproduce any single
            # member's molecules (batch composition differs on replay), so
            # only solo responses echo a replayable seed.
            "seed": seed if group == 1 else None,
            "seconds": round(elapsed, 4),
            **({"coalesced": group} if group > 1 else {}),
            **({"properties": props_used, "cfg_scale": cfg_scale}
               if self.prop_dist is not None else {}),
        }

    def health(self) -> dict:
        return {
            "status": "ok",
            "model": self.args.model_path,
            "kind": self.model_cfg.kind,
            "dataset": self.dataset_info["name"],
            "buckets": list(self.buckets),
            "device": str(self._jax.devices()[0].device_kind),
            "uptime_s": round(time.time() - self.started, 1),
        }

    def metrics(self) -> dict:
        import numpy as np

        with self.metrics_lock:
            lat = list(self.latencies)
            out = {
                "requests": self.requests,
                "molecules": self.molecules,
                "errors": self.errors,
                # merged generation calls (each spans one compiled program
                # per occupied size bucket/chunk); < requests when
                # concurrent unseeded requests were coalesced
                "dispatches": self.dispatches,
            }
        if lat:
            out["latency_s"] = {
                "p50": round(float(np.percentile(lat, 50)), 4),
                "p95": round(float(np.percentile(lat, 95)), 4),
                "max": round(max(lat), 4),
            }
        return out


def make_handler(service: SamplerService):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, service.health())
            elif self.path == "/metrics":
                self._send(200, service.metrics())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/sample":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(body, dict):
                    raise ValueError("request body must be a JSON object")
                self._send(200, service.sample(body))
            except (ValueError, KeyError) as e:
                # Request parsing/validation raises readable ValueErrors;
                # anything else is a server-side bug and must be a 500 so
                # monitoring doesn't misread bugs as client errors.
                with service.metrics_lock:
                    service.errors += 1
                self._send(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — client must get a reply
                with service.metrics_lock:
                    service.errors += 1
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *log_args):  # quiet by default
            pass

    return Handler


def main(argv=None, *, serve_forever: bool = True):
    args = parse_args(argv)
    from geoldm_tpu.utils.jaxcache import setup_compilation_cache

    setup_compilation_cache()

    from http.server import ThreadingHTTPServer

    service = SamplerService(args)
    if not args.no_warmup:
        dt = service.warmup()
        print(f"warm-compiled {len(service.buckets)} buckets in {dt:.1f}s")
    server = ThreadingHTTPServer((args.host, args.port), make_handler(service))
    print(f"serving {args.model_path} on http://{args.host}:"
          f"{server.server_address[1]} (buckets {service.buckets})")
    if serve_forever:
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            server.shutdown()
    return server, service


if __name__ == "__main__":
    main()

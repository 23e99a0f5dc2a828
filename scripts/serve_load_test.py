"""Serving load test: throughput + latency under concurrent clients.

Starts the sampling server in-process against a checkpoint, drives it
with N concurrent clients issuing unseeded requests for W seconds, and
reports requests/s, molecules/s, latency quantiles, and the coalescing
ratio (requests per device dispatch). Run twice to compare adaptive
batching against solo dispatches (--solo forces per-request seeds, which
bypass coalescing).

  python scripts/serve_load_test.py --model_path outputs/qm9_ldm \\
      [--clients 8] [--seconds 30] [--n_samples 4] [--n_steps 50] [--solo]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", type=str, required=True)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--n_samples", type=int, default=4)
    ap.add_argument("--n_steps", type=int, default=None)
    ap.add_argument("--batch_max", type=int, default=250)
    ap.add_argument("--compute_dtype", type=str, default="bfloat16_mixed")
    ap.add_argument("--solo", action="store_true",
                    help="send per-request seeds (bypasses coalescing) "
                         "to measure the unbatched baseline")
    ap.add_argument("--datadir", type=str, default=None)
    ap.add_argument("--conditioning", nargs="*", default=[])
    args = ap.parse_args(argv)

    from geoldm_tpu.cli import serve

    serve_args = ["--model_path", args.model_path, "--port", "0",
                  "--batch_max", str(args.batch_max),
                  "--compute_dtype", args.compute_dtype]
    if args.n_steps:
        serve_args += ["--n_steps", str(args.n_steps)]
    if args.datadir:
        serve_args += ["--datadir", args.datadir,
                       "--conditioning", *args.conditioning]
    srv, service = serve.main(serve_args, serve_forever=False)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    stop = time.time() + args.seconds
    counts, latencies, errors = [], [], []
    lock = threading.Lock()

    def client(cid):
        i = 0
        while time.time() < stop:
            body = {"n_samples": args.n_samples}
            if args.solo:
                body["seed"] = cid * 1_000_000 + i
            t0 = time.time()
            try:
                req = urllib.request.Request(
                    base + "/sample", data=json.dumps(body).encode())
                with urllib.request.urlopen(req, timeout=600) as r:
                    out = json.loads(r.read())
                with lock:
                    counts.append(out["n"])
                    latencies.append(time.time() - t0)
            except Exception as e:  # noqa: BLE001 — counted, not fatal
                with lock:
                    errors.append(str(e))
            i += 1

    t_start = time.time()
    threads = [threading.Thread(target=client, args=(c,))
               for c in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t_start

    import numpy as np

    m = json.loads(urllib.request.urlopen(base + "/metrics").read())
    lat = np.asarray(latencies) if latencies else None
    result = {
        "mode": "solo" if args.solo else "coalesced",
        "clients": args.clients,
        "wall_s": round(wall, 2),
        "requests": len(counts),
        "errors": len(errors),
        "req_per_s": round(len(counts) / wall, 2),
        "mol_per_s": round(sum(counts) / wall, 2),
        # null (not 0.0) when every request failed — a broken run must not
        # read as an infinitely fast one
        "latency_s": None if lat is None else {
            "p50": round(float(np.percentile(lat, 50)), 3),
            "p95": round(float(np.percentile(lat, 95)), 3)},
        "device_dispatches": m["dispatches"],
        "requests_per_dispatch": round(
            len(counts) / max(m["dispatches"], 1), 2),
    }
    print(json.dumps(result))
    srv.shutdown()
    return result


if __name__ == "__main__":
    main()

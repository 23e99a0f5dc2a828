"""Merge PARITY_TRAIN result JSONs (same protocol, disjoint seeds).

The post-fix v3 run landed in two batches — seeds 10-12 (round 4,
docs/parity_train_v3_3seed.json) and seeds 13-19 (round 5, same
protocol: clean copied init, seed-dependent eval keys, matched torch
AMSGrad, JAX_PLATFORMS=cpu) — and parity_train_ab_ldm.py's
``--report_only`` regenerates the full report from a results JSON, so
pooling is a pure list concatenation. Batch order within the JSON is
seed-sorted for stable column order.

Usage: python scripts/merge_parity_json.py A.json B.json -o merged.json
"""

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("-o", "--out", required=True)
    args = ap.parse_args(argv)

    merged = {"loss": [], "stab": [], "elapsed": 0.0}
    for path in args.inputs:
        with open(path) as f:
            d = json.load(f)
        merged["loss"] += d["loss"]
        merged["stab"] += d["stab"]
        merged["elapsed"] += d.get("elapsed", 0.0)

    seeds = [r["seed"] for r in merged["loss"]]
    if len(set(seeds)) != len(seeds):
        raise SystemExit(f"duplicate seeds across inputs: {sorted(seeds)}")
    merged["loss"].sort(key=lambda r: r["seed"])
    merged["stab"].sort(key=lambda r: (r["seed"], r["step"]))

    with open(args.out, "w") as f:
        json.dump(merged, f)
    print(f"merged {len(seeds)} seeds ({sorted(seeds)}) -> {args.out}")


if __name__ == "__main__":
    main()

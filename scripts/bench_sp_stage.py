"""Micro-benchmark: SP Pallas stage kernels under real Mosaic lowering.

VERDICT r4 task 4 wants measured ms for ops/pallas_egnn_sp.py on a real
chip, not just the correctness suite (tests/test_pallas_tpu.py). This
times both stage kernels (gcl + coord) at the two production shapes —
QM9-ish (N=32, slab 8) and the GEOM pad-184 recipe under sp=2 (N=192,
slab 96, real rows 184) — with the slab at a NONZERO global row offset,
exactly what SP device 1 would dispatch.

Timing defenses (same rationale as bench.py, commit 5ce7d38):
- the tunnel platform can memoize repeat executions of bitwise-identical
  (executable, inputs) — every dispatch here carries a distinct ``seed``
  scalar operand;
- ``block_until_ready`` is not reliably a fence through the tunnel — the
  timed region ends with a host fetch (np.asarray) of the result;
- host dispatch overhead (~tens of ms through the tunnel, worse under
  load) would swamp a single kernel launch — each dispatch runs ``iters``
  chained kernel invocations inside one lax.fori_loop (iteration i feeds
  its output back into the slab rows, so no launch can be elided), and
  per-iteration time = wall / iters. Best-of-``reps`` guards against
  host-side noise.

Run (tunnel env): timeout 1800 python scripts/bench_sp_stage.py
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
os.environ.setdefault("GEOLDM_TEST_PLATFORM", "tpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import test_pallas_tpu as tp  # noqa: E402  (input builders shared with the suite)
from geoldm_tpu.ops.pallas_egnn_sp import sp_stage_apply, sp_stage_tiles  # noqa: E402
from geoldm_tpu.utils.tpuflags import grad_compiler_options  # noqa: E402

# (kind, n, s, r0, hidden, n_real) — the correctness suite's production rows.
CASES = [
    ("gcl", 32, 8, 24, 64, None),
    ("coord", 32, 8, 24, 64, None),
    ("gcl", 192, 96, 96, 128, 184),
    ("coord", 192, 96, 96, 128, 184),
]


def bench_case(kind, n, s, r0, hidden, n_real, iters, reps):
    cfg, weights, full, rows, r0_base = tp._stage_inputs(
        kind, n, s, r0, hidden, n_real=n_real
    )
    tiles = sp_stage_tiles(s, n, hidden)
    stage = functools.partial(
        sp_stage_apply, cfg, kind, n, tiles, None, False, 0
    )
    out_idx = 0 if kind == "gcl" else 1  # stage output replaces h / x rows

    def chain(rows, out, seed, i):
        # 1 + (seed+i)*1e-12 == 1.0 exactly in f32: numerics stay fixed,
        # but the seed operand makes every dispatch's inputs distinct.
        scale = 1.0 + (seed + i).astype(jnp.float32) * 1e-12
        return tuple(
            out * scale if j == out_idx else r for j, r in enumerate(rows)
        )

    def fwd_loop(weights, full, rows, seed):
        def body(i, rows):
            out = stage(weights, full, rows, r0_base)
            return chain(rows, out, seed, i)

        return jax.lax.fori_loop(0, iters, body, rows)[out_idx]

    def loss(weights, full, rows):
        out = stage(weights, full, rows, r0_base)
        return jnp.sum(out * out)

    def bwd_loop(weights, full, rows, seed):
        def body(i, rows):
            g = jax.grad(loss, argnums=2)(weights, full, rows)
            scale = (seed + i).astype(jnp.float32) * 1e-12
            return tuple(r + scale * gr for r, gr in zip(rows, g))

        return jax.lax.fori_loop(0, iters, body, rows)[0]

    results = {}
    for name, fn, opts in (
        ("fwd", fwd_loop, {}),
        ("fwd+bwd", bwd_loop, {"compiler_options": grad_compiler_options()}),
    ):
        jfn = jax.jit(fn, **opts)
        t0 = time.perf_counter()
        np.asarray(jfn(weights, full, rows, jnp.int32(0)))  # compile+warm
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for rep in range(reps):
            t0 = time.perf_counter()
            np.asarray(jfn(weights, full, rows, jnp.int32(rep + 1)))
            best = min(best, (time.perf_counter() - t0) / iters)
        results[name] = (best * 1e3, compile_s)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    dev = jax.devices()[0].device_kind
    print(f"# SP stage kernels, Mosaic, {dev}; "
          f"{args.iters} chained iters/dispatch, best of {args.reps}")
    for kind, n, s, r0, hidden, n_real in CASES:
        r = bench_case(kind, n, s, r0, hidden, n_real, args.iters, args.reps)
        label = (f"{kind:5s} N={n} S={s} r0={r0} hidden={hidden} "
                 f"real={n_real or n}")
        print(f"{label}: fwd {r['fwd'][0]:.3f} ms  "
              f"fwd+bwd {r['fwd+bwd'][0]:.3f} ms  "
              f"(compile {r['fwd'][1]:.1f}s/{r['fwd+bwd'][1]:.1f}s)")


if __name__ == "__main__":
    main()

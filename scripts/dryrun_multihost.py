"""Multi-HOST (DCN) dryrun: a 2-process mesh training step, on one machine.

SURVEY §5.8 designates ICI+DCN meshes (``jax.distributed`` + GSPMD) as the
TPU-native replacement for the reference's single-process DataParallel
(main_qm9.py:234-239). Real multi-host TPU hardware is not available here,
but the multi-process machinery IS testable: this script spawns
``--n_hosts`` child interpreters on this machine, each with
``--devices_per_host`` virtual CPU devices and gloo cross-process
collectives, builds the process-spanning mesh, and runs

1. a data-parallel latent-diffusion TRAIN step where each process feeds
   only its local half of the global batch (``jax.make_array_from_
   process_local_data``) — the gradient all-reduce crosses the process
   boundary, exactly like a DCN mesh;
2. the same loss recomputed single-device inside process 0 on the full
   global batch, asserting the multi-host loss matches to f32 tolerance;
3. a cross-process sharded sampling batch (reverse diffusion scan) whose
   replicated statistic must be finite and identical on every process.

Everything exercised — multi-process mesh building, global-array
construction from per-process shards, the cross-host GSPMD program, the
host-side metric gather — is what single-process virtual meshes cannot
cover.

Run: python scripts/dryrun_multihost.py  (prints "multihost ok: ..." and
exits 0; each child writes a [pN] log line).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child_main(pid: int, n_hosts: int, devices_per_host: int, port: int,
               steps: int, skip_sample: bool = False) -> None:
    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=n_hosts,
        process_id=pid,
    )
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from geoldm_tpu.config import TrainConfig
    from geoldm_tpu.data.datasets_config import get_dataset_info
    from geoldm_tpu.data.synthetic import synthetic_batch
    from geoldm_tpu.models import factory
    from geoldm_tpu.models.distributions import DistributionNodes
    from geoldm_tpu.parallel.sharding import DATA_AXIS
    from geoldm_tpu.train.train_step import create_train_state, make_train_step

    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == n_hosts * devices_per_host, (n_global, n_hosts)
    assert n_local == devices_per_host

    # 1D data mesh spanning both processes (a DCN-crossing axis).
    mesh = Mesh(np.asarray(jax.devices()), (DATA_AXIS,))
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(DATA_AXIS))

    info = get_dataset_info("qm9")
    cfg = factory.make_latent_diffusion_config(
        info, nf=32, n_layers=2, latent_nf=1, diffusion_steps=24,
        trainable_ae=True,
    )
    tc = TrainConfig(lr=1e-3, ema_decay=0.999)
    # Same seed in every process -> identical host params; replicate.
    state, tx = create_train_state(jax.random.key(0), cfg, tc)
    state = state._replace(
        params=jax.device_put(state.params, repl),
        ema_params=jax.device_put(state.ema_params, repl),
        opt_state=jax.device_put(state.opt_state, repl),
        step=jax.device_put(state.step, repl),
    )

    # Global batch: 2 molecules per device; every process generates the
    # same full batch deterministically, then contributes only ITS slice
    # via make_array_from_process_local_data — real multi-host data
    # loading, not replicated feeding.
    b_global = 2 * n_global
    batch_np = synthetic_batch(info, b_global, pad_nodes=12,
                               rng=np.random.default_rng(0))
    nodes_dist = DistributionNodes(info.n_nodes)
    batch_np["log_pN"] = nodes_dist.log_prob(
        batch_np.pop("n_atoms")
    ).astype(np.float32)
    lo = pid * (b_global // n_hosts)
    hi = lo + b_global // n_hosts
    batch = {
        k: jax.make_array_from_process_local_data(bsh, v[lo:hi])
        for k, v in batch_np.items()
    }

    step_fn = jax.jit(make_train_step(cfg, tc, tx))
    key = jax.random.key(1)
    loss = None
    for i in range(steps):
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
        loss = float(metrics["loss"])  # replicated -> addressable everywhere
        assert np.isfinite(loss), f"non-finite multihost loss {loss}"

    # Single-device reference on the full batch (first step only): the
    # cross-process DP loss must equal it. Process 0 only — it is the one
    # that prints the verdict line, and compiling the same reference step
    # in every process doubles the wall-clock for no extra signal.
    loss1 = None
    if pid == 0:
        state1, tx1 = create_train_state(jax.random.key(0), cfg, tc)
        step1 = jax.jit(make_train_step(cfg, tc, tx1))
        with jax.default_device(jax.local_devices()[0]):
            b1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
            _, m1 = step1(state1, b1, jax.random.fold_in(key, 0))
        loss1 = float(m1["loss"])

    # Cross-process sharded sampling: one reverse-diffusion scan over a
    # batch sharded across hosts. (--skip_sample drops this one compile —
    # used when embedded in dryrun_multichip's time budget; the full run
    # stays covered by tests/test_multihost.py.)
    stat = float("nan")
    if not skip_sample:
        sample_fn = factory.model_sample_fn(cfg)
        nm_np = np.zeros((n_global, 12, 1), np.float32)
        nm_np[:, :9] = 1.0
        a = nm_np[:, :, 0]
        em_np = (a[:, :, None] * a[:, None, :]) * (
            1 - np.eye(12, dtype=np.float32)[None]
        )
        em_np = em_np[..., None]
        per = n_global // n_hosts
        nm = jax.make_array_from_process_local_data(bsh, nm_np[pid * per:(pid + 1) * per])
        em = jax.make_array_from_process_local_data(bsh, em_np[pid * per:(pid + 1) * per])

        @jax.jit
        def sample_stat(params, key, nm, em):
            x, h_cat, h_int = sample_fn(params, key, nm, em)
            return jnp.sum(x ** 2) + jnp.sum(h_cat ** 2)

        stat = float(sample_stat(state.ema_params, jax.random.key(2), nm, em))
        assert np.isfinite(stat), f"non-finite sampling stat {stat}"

    # Sequence parallelism ACROSS hosts: a (data, seq) mesh whose ``seq``
    # axis pairs device i of host 0 with device i of host 1, so every
    # EGNN all_gather/psum_scatter in the SP forward AND backward crosses
    # the process (DCN) boundary. One train step; its loss must match the
    # single-device loss on the same batch + key.
    from geoldm_tpu.nn.core import sp_spec
    from geoldm_tpu.parallel.sp import SEQ_AXIS

    sp_devices = np.asarray(jax.devices()).reshape(n_hosts, devices_per_host).T
    sp_mesh = Mesh(sp_devices, (DATA_AXIS, SEQ_AXIS))
    sp_bsh = NamedSharding(sp_mesh, P(DATA_AXIS))
    sp_repl = NamedSharding(sp_mesh, P())
    state_sp, tx_sp = create_train_state(jax.random.key(0), cfg, tc)
    state_sp = state_sp._replace(
        params=jax.device_put(state_sp.params, sp_repl),
        ema_params=jax.device_put(state_sp.ema_params, sp_repl),
        opt_state=jax.device_put(state_sp.opt_state, sp_repl),
        step=jax.device_put(state_sp.step, sp_repl),
    )
    # With the seq axis crossing processes, every data-shard has a device
    # in BOTH processes, so each process's local contribution is the full
    # batch (replicated over its seq coordinate).
    sp_batch = {
        k: jax.make_array_from_process_local_data(sp_bsh, v)
        for k, v in batch_np.items()
    }
    sp_step = jax.jit(make_train_step(cfg, tc, tx_sp, compute_dtype=sp_spec(sp_mesh)))
    _, sp_metrics = sp_step(state_sp, sp_batch, jax.random.fold_in(key, 0))
    sp_loss = float(sp_metrics["loss"])

    print(f"[p{pid}] mesh {n_hosts}x{devices_per_host} loss={loss:.4f} "
          f"single-device loss={loss1} sample_stat={stat:.2f} "
          f"cross-host-SP loss={sp_loss:.4f}", flush=True)
    if pid == 0:
        sp_err = abs(sp_loss - loss1)
        assert sp_err < 1e-3 * max(1.0, abs(loss1)), (sp_loss, loss1)
        err = abs(loss - loss1) if steps == 1 else 0.0
        assert err < 1e-3 * max(1.0, abs(loss1)), (loss, loss1)
        print(f"multihost ok: hosts={n_hosts} devices={n_global} "
              f"loss={loss:.4f} dp_vs_single_err={err:.2e} "
              f"sample_stat={stat:.2f} "
              f"sp_xhost(dp{devices_per_host}xsp{n_hosts})_err={sp_err:.2e}",
              flush=True)


def _scrubbed_env(devices_per_host: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                  if p and "axon" not in p]
    )
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                "AXON_LOOPBACK_RELAY", "AXON_POOL_SVC_OVERRIDE"):
        env.pop(var, None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={devices_per_host}")
    env["XLA_FLAGS"] = " ".join(flags)
    return env


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_hosts", type=int, default=2)
    ap.add_argument("--devices_per_host", type=int, default=4)
    ap.add_argument("--port", type=int, default=12731)
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--skip_sample", action="store_true",
                    help="skip the cross-process sampling stat (one fewer "
                         "compile; used when embedded in dryrun_multichip)")
    ap.add_argument("--child", type=int, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args(argv)

    if args.child is not None:
        child_main(args.child, args.n_hosts, args.devices_per_host,
                   args.port, args.steps, skip_sample=args.skip_sample)
        return 0

    env = _scrubbed_env(args.devices_per_host)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--child", str(pid), "--n_hosts", str(args.n_hosts),
             "--devices_per_host", str(args.devices_per_host),
             "--port", str(args.port), "--steps", str(args.steps)]
            + (["--skip_sample"] if args.skip_sample else []),
            env=env, cwd=REPO,
        )
        for pid in range(args.n_hosts)
    ]
    rcs = [p.wait() for p in procs]
    if any(rcs):
        print(f"multihost dryrun FAILED: child rcs {rcs}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

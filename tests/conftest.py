"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host-platform virtual devices instead (the "fake backend" for
data-parallel tests).

The ambient environment may inject an axon TPU-tunnel sitecustomize (via
PYTHONPATH) that hooks JAX's backend selection so that *all* computations —
even with JAX_PLATFORMS=cpu — are proxied to a remote TPU relay, stalling
each process by minutes when the tunnel is contended. Tests must never touch
that path, so in ``pytest_configure`` we re-exec the interpreter with a
cleaned environment (no axon PYTHONPATH entries, platform pinned to CPU),
after restoring pytest's captured stdio so the child writes to the real
terminal. Set GEOLDM_TEST_PLATFORM to override (e.g. to run the suite on a
real TPU).
"""

import os
import sys

_PLATFORM = os.environ.get("GEOLDM_TEST_PLATFORM", "cpu")


def _needs_reexec() -> bool:
    if os.environ.get("_GEOLDM_TEST_REEXEC") == "1":
        return False
    if _PLATFORM != "cpu":
        return False
    # Only re-exec if the axon tunnel sitecustomize is on PYTHONPATH.
    pp = os.environ.get("PYTHONPATH", "")
    return any("axon" in p for p in pp.split(os.pathsep) if p)


def pytest_configure(config):
    if not _needs_reexec():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.stop_global_capturing()
        except Exception:
            pass
    env = dict(os.environ)
    env["_GEOLDM_TEST_REEXEC"] = "1"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p and "axon" not in p
    )
    for var in (
        "PALLAS_AXON_POOL_IPS",
        "PALLAS_AXON_REMOTE_COMPILE",
        "AXON_LOOPBACK_RELAY",
        "AXON_POOL_SVC_OVERRIDE",
        "JAX_PLATFORMS",
    ):
        env.pop(var, None)
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)


# Environment for the (re-exec'd or already-clean) test process. Must be set
# before jax is imported anywhere.
if os.environ.get("_GEOLDM_TEST_REEXEC") == "1" or not _needs_reexec():
    os.environ["JAX_PLATFORMS"] = _PLATFORM
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables():
    """Drop jax's compiled-program caches after every test module.

    Each compiled XLA:CPU executable holds process memory mappings; a full
    267-test run accumulates ~65k maps and SEGFAULTS mid-compile when it
    hits the kernel's vm.max_map_count (measured: ~2.7k maps/min, crash at
    ~test 243 in two independent runs, maps bounded and no crash with this
    release). Cross-module recompiles are cheap next to that."""
    yield
    import jax

    jax.clear_caches()

"""TPU compile options the fused Pallas backward kernels depend on.

The fused EquivariantBlock kernels keep ``[G*N*N, H]`` pair buffers live in
VMEM. At flagship QM9 denoiser shapes (N=32, H=256) the *backward* kernel's
live set (~17.3 MB even at group=1) exceeds libtpu's default 16 MB
scoped-VMEM allocation, so **any jitted program containing a fused
backward** (a train step with the pallas compute backend) must be compiled
with :func:`grad_compiler_options`. A v5e core carries 128 MB of VMEM;
64 MB scoped leaves XLA plenty for its own buffers and measures 1.79x
faster train steps than the XLA+remat path (scripts/bench_pallas_bwd.py,
bench.py).

The limit is deliberately applied PER-COMPILE (``jax.jit(...,
compiler_options=...)``), never process-globally via LIBTPU_INIT_ARGS: a
globally raised limit changes XLA's own fusion choices and measured the
bfloat16_mixed sampler 25% slower (36.5 vs 48.9 mol/s on v5e). Forward-only
programs (samplers, NLL eval) therefore compile with the default limit, and
the forward kernels' group/tile heuristics budget for 16 MB; the backward
heuristics (ops/pallas_egnn.py:_auto_group_bwd,
ops/pallas_egnn_tiled.py:_auto_tile_bwd) budget for
``RAISED_SCOPED_VMEM_KIB`` on the contract that their enclosing jit passed
these options.
"""

from __future__ import annotations

RAISED_SCOPED_VMEM_KIB = 65536
LIBTPU_DEFAULT_SCOPED_VMEM_KIB = 16384  # libtpu default, forward-path budget


def grad_compiler_options(kib: int = RAISED_SCOPED_VMEM_KIB) -> dict:
    """``compiler_options`` for any jit whose backward runs a fused Pallas
    kernel: ``jax.jit(fn, compiler_options=grad_compiler_options())``."""
    return {"xla_tpu_scoped_vmem_limit_kib": str(kib)}


def train_step_compiler_options(compute_dtype) -> dict | None:
    """The options a train-step jit needs for the given compute mode
    (None when the XLA path is used and the default limit suffices, or
    when the backend is not a TPU — the scoped-VMEM option is TPU-only
    and XLA:CPU rejects unknown compile options, which matters for
    interpret-mode pallas runs on virtual CPU meshes)."""
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        return None
    name = getattr(compute_dtype, "backend", compute_dtype)
    if isinstance(name, str) and "pallas" in name:
        return grad_compiler_options()
    if getattr(compute_dtype, "sp_pallas", False):
        # SP slabs running the row-tiled fused kernels: same backward
        # live-set contract as the single-chip pallas path.
        return grad_compiler_options()
    return None

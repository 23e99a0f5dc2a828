"""Minimal functional NN primitives: explicit param pytrees, explicit RNG.

Initialization matches PyTorch ``nn.Linear`` defaults (kaiming_uniform with
a=sqrt(5), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias)
so that training dynamics are comparable with the reference, and xavier
uniform is available for the coordinate-MLP output layer
(reference: egnn/egnn_new.py:75-76 uses gain=0.001).

Weights are stored as ``[in_features, out_features]`` (row-vector
convention: ``y = x @ w + b``) — the natural layout for XLA matmuls.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


class ComputeSpec(NamedTuple):
    """How to execute the EGNN compute path.

    ``dtype``: matmul operand dtype (None = float32 params as-is;
    jnp.bfloat16 casts operands, accumulating in float32 on the MXU).
    ``backend``: 'xla' (dense masked einsum graph) or 'pallas' (fused
    per-block TPU kernel, ops/pallas_egnn.py).
    ``full``: run the entire EGNN (params + activations) in the compute
    dtype, casting back to f32 at the wrapper boundary — ~1.5x faster on
    v5e (the path is VPU-bound) at ~1e-2 relative output error; schedule
    algebra, CoM projections and noise stay f32 regardless.

    Every model-level function takes a ``compute_dtype`` argument that may
    be a raw dtype or a ComputeSpec; only ``linear`` and the EGNN wrappers
    interpret it.
    """

    dtype: Optional[object] = None
    backend: str = "xla"
    full: bool = False
    # Fraction of FINAL sampler steps forced to f32 under ``full`` (the
    # low-noise tail is where geometry crystallizes and precision matters
    # most); 0 = all steps in the compute dtype.
    mixed_tail: float = 0.0
    # Sequence parallelism: a jax.sharding.Mesh with a ``seq`` axis. When
    # set, every EGNN application runs through parallel.sp.egnn_apply_sp
    # with the atom (row) dimension sharded over ``seq`` (other mesh axes —
    # ``data`` — stay in GSPMD auto mode, so DPxSP composes). Forward AND
    # backward are sharded; grads match the single-device path
    # (tests/test_sp.py). Constructed via sp_spec(), not a string name.
    sp_mesh: Optional[object] = None
    # With sp_mesh set: execute each SP slab's math as the row-tiled fused
    # Pallas kernels (ops/pallas_egnn_sp.py) instead of plain XLA — the
    # single-chip fused-kernel training win inside each shard.
    sp_pallas: bool = False
    # Pallas interpret mode (CPU meshes: tests + the multichip dryrun).
    interpret: bool = False


def sp_spec(mesh, dtype=None, pallas: bool = False,
            interpret: bool = False) -> ComputeSpec:
    """ComputeSpec for sequence-parallel EGNN execution over ``mesh``'s
    ``seq`` axis (optionally with a matmul-operand compute dtype).
    ``pallas`` runs each slab's math as the row-tiled fused kernels;
    ``interpret`` selects Pallas interpret mode for CPU meshes."""
    return ComputeSpec(dtype=dtype, backend="sp", sp_mesh=mesh,
                       sp_pallas=pallas, interpret=interpret)


def resolve_compute(compute_dtype) -> ComputeSpec:
    if compute_dtype is None:
        return ComputeSpec()
    if isinstance(compute_dtype, ComputeSpec):
        return compute_dtype
    if isinstance(compute_dtype, str):
        if compute_dtype in ("pallas", "xla"):
            return ComputeSpec(None, compute_dtype)
        if compute_dtype == "bfloat16":
            return ComputeSpec(jnp.bfloat16, "xla")
        if compute_dtype == "float32":
            return ComputeSpec()
        if compute_dtype == "bfloat16_pallas":
            return ComputeSpec(jnp.bfloat16, "pallas")
        if compute_dtype == "bfloat16_full":
            return ComputeSpec(jnp.bfloat16, "xla", True)
        if compute_dtype == "bfloat16_mixed":
            return ComputeSpec(jnp.bfloat16, "xla", True, 0.1)
        raise ValueError(compute_dtype)
    return ComputeSpec(compute_dtype, "xla")


def linear_init(key: Array, in_f: int, out_f: int, bias: bool = True) -> dict:
    """Torch-default Linear init."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_f)
    p = {"w": jax.random.uniform(kw, (in_f, out_f), minval=-bound, maxval=bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_f,), minval=-bound, maxval=bound)
    return p


def linear_init_xavier(key: Array, in_f: int, out_f: int, gain: float = 1.0, bias: bool = True) -> dict:
    """Xavier-uniform weight init (optionally tiny gain), zero-init bias."""
    bound = gain * math.sqrt(6.0 / (in_f + out_f))
    p = {"w": jax.random.uniform(key, (in_f, out_f), minval=-bound, maxval=bound)}
    if bias:
        p["b"] = jnp.zeros((out_f,))
    return p


def linear(p: dict, x: Array, compute_dtype=None) -> Array:
    """y = x @ w (+ b), optionally casting the matmul inputs (MXU bf16 path)
    while accumulating in float32."""
    if isinstance(compute_dtype, ComputeSpec):
        compute_dtype = compute_dtype.dtype
    elif isinstance(compute_dtype, str):
        compute_dtype = resolve_compute(compute_dtype).dtype
    w = p["w"]
    if compute_dtype is not None and w.dtype != compute_dtype:
        y = jax.lax.dot_general(
            x.astype(compute_dtype),
            w.astype(compute_dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        y = x @ w
    if "b" in p:
        y = y + p["b"]
    return y


def silu(x: Array) -> Array:
    return jax.nn.silu(x)

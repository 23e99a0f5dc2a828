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
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


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


def linear(p: dict, x: Array, compute_dtype: Optional[jnp.dtype] = None) -> Array:
    """y = x @ w (+ b), optionally casting the matmul inputs (MXU bf16 path)
    while accumulating in float32."""
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

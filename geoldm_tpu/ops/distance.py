"""Dense pairwise-distance features for fully-connected molecular graphs.

The reference materializes an explicit fully-connected edge list and gathers
``x[row] - x[col]`` (egnn/egnn_new.py:249-255 ``coord2diff``; cached edge
index at egnn/models.py:115-134). On TPU we never build an edge list: node
tensors stay ``[B, N, D]`` and pairwise quantities are dense ``[B, N, N, D]``
broadcasts, which XLA fuses and tiles onto the VPU/MXU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array

# Sinusoidal distance-embedding constants (reference: egnn/egnn_new.py:235-246,
# SinusoidsEmbeddingNew with max_res=15, min_res=15/2000, div_factor=4).
_MAX_RES = 15.0
_MIN_RES = 15.0 / 2000.0
_DIV_FACTOR = 4
_N_FREQUENCIES = int(math.log(_MAX_RES / _MIN_RES, _DIV_FACTOR)) + 1
SIN_EMBEDDING_DIM = 2 * _N_FREQUENCIES

_FREQUENCIES = tuple(
    2.0 * math.pi * _DIV_FACTOR**i / _MAX_RES for i in range(_N_FREQUENCIES)
)


def coord2diff(x: Array, norm_constant: float = 1.0) -> tuple[Array, Array]:
    """Pairwise squared distances and normalized difference vectors.

    x: [B, N, D] -> (radial [B, N, N, 1], coord_diff [B, N, N, D]) where
    radial[b, i, j] = ||x_i - x_j||^2 and
    coord_diff[b, i, j] = (x_i - x_j) / (||x_i - x_j|| + norm_constant).

    reference: egnn/egnn_new.py:249-255 (sparse edge-list form).
    """
    diff = x[:, :, None, :] - x[:, None, :, :]
    radial = jnp.sum(jnp.square(diff), axis=-1, keepdims=True)
    norm = jnp.sqrt(radial + 1e-8)
    coord_diff = diff / (norm + norm_constant)
    return radial, coord_diff


def sin_embedding(radial: Array) -> Array:
    """Fourier features of the distance (input is the squared distance).

    radial [..., 1] -> [..., SIN_EMBEDDING_DIM].
    reference: egnn/egnn_new.py:242-246.
    """
    d = jnp.sqrt(radial + 1e-8)
    freqs = jnp.asarray(_FREQUENCIES, dtype=radial.dtype)
    emb = d * freqs  # broadcast [..., 1] * [F] -> [..., F]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    return jax.lax.stop_gradient(emb)


def build_edge_mask(node_mask: Array) -> Array:
    """Dense edge mask: outer product of node masks with the diagonal removed.

    node_mask [B, N, 1] -> [B, N, N, 1].
    reference: qm9/data/collate.py:89-97 and qm9/sampling.py:124-127.
    """
    b, n, _ = node_mask.shape
    m = node_mask[:, :, None, :] * node_mask[:, None, :, :]
    eye = jnp.eye(n, dtype=node_mask.dtype)[None, :, :, None]
    return m * (1.0 - eye)

"""Sampling orchestration: build masks/context on host, run the jitted
scanned sampler, post-process.

TPU-native equivalent of qm9/sampling.py: masks are vectorized numpy (the
reference builds node masks in a Python loop — qm9/sampling.py:118-120),
the sampler is jit-cached per (batch, pad) shape, and the chain sampler
retries until a stable molecule is found (reference: qm9/sampling.py:54-107).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from geoldm_tpu.config import ModelConfig
from geoldm_tpu.data.collate import build_masks
from geoldm_tpu.diffusion import latent as ldm_mod
from geoldm_tpu.diffusion import vdm as vdm_mod
from geoldm_tpu.evalsuite.analyze import check_stability
from geoldm_tpu.models import factory


def rotate_chain(z: np.ndarray, n_steps: int = 30) -> np.ndarray:
    """Append n_steps rotated copies of a single frame's coordinates
    (visualization; reference: qm9/sampling.py:9-47)."""
    assert z.shape[0] == 1
    theta = 0.6 * np.pi / n_steps
    c, s = np.cos(theta), np.sin(theta)
    qz = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    qx = np.array([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]])
    qy = np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
    q = qz @ qx @ qy
    z_h = z[:, :, 3:]
    frames = [z]
    for _ in range(n_steps):
        x = frames[-1][:, :, :3]
        frames.append(np.concatenate([x @ q.T, z_h], axis=2))
    return np.concatenate(frames, axis=0)


@lru_cache(maxsize=32)  # sized so varied per-request few-step settings
# (serve.py) don't evict warm executables
def _jitted_sampler(model_cfg: ModelConfig, compute_dtype_name: Optional[str],
                    n_steps: Optional[int] = None, eta: float = 1.0,
                    method: str = "ddim", guidance_scale: float = 1.0,
                    clip_z: float = 0.0):
    from geoldm_tpu.nn.core import resolve_compute

    spec = resolve_compute(compute_dtype_name)
    fn = factory.model_sample_fn(model_cfg, compute_dtype=spec,
                                 n_steps=n_steps, eta=eta, method=method,
                                 guidance_scale=guidance_scale, clip_z=clip_z)
    return jax.jit(fn, static_argnames=("fix_noise",))


def append_indicator_if_needed(model_cfg: ModelConfig, context: np.ndarray) -> np.ndarray:
    """Property-only context -> model context: models built with
    context_indicator=True carry a trailing is-conditioned ones channel
    (conditioning.prepare_context); callers pass property values only, so
    append it when the width is one short of the model's context_node_nf."""
    want = (model_cfg.dynamics.context_node_nf
            if model_cfg.dynamics is not None
            else model_cfg.vae.context_node_nf)
    if (getattr(model_cfg, "context_indicator", False)
            and context.shape[-1] == want - 1):
        context = np.concatenate(
            [context, np.ones_like(context[..., :1])], axis=-1)
    return context


def sample(
    model_cfg: ModelConfig,
    params,
    key,
    dataset_info,
    nodesxsample: np.ndarray,
    prop_dist=None,
    context: Optional[np.ndarray] = None,
    fix_noise: bool = False,
    pad_nodes: Optional[int] = None,
    compute_dtype: Optional[str] = None,
    rng: Optional[np.random.Generator] = None,
    mesh=None,
    as_numpy: bool = True,
    n_steps: Optional[int] = None,
    eta: float = 1.0,
    method: str = "ddim",
    guidance_scale: float = 1.0,
    clip_z: float = 0.0,
):
    """Generate molecules with the requested atom counts.

    Returns (one_hot, charges, x, node_mask) as numpy arrays. With ``mesh``
    the batch is sharded over the mesh's data axis (generation fans out
    across chips; GSPMD partitions the scanned sampler).
    ``as_numpy=False`` skips the device->host sync and returns the first
    three as (still-computing) device arrays — callers dispatching many
    chunks use it to pipeline device work with transfers.
    reference: qm9/sampling.py:110-154."""
    max_n_nodes = pad_nodes or dataset_info["max_n_nodes"]
    nodesxsample = np.asarray(nodesxsample)
    assert int(nodesxsample.max()) <= max_n_nodes
    n_req = len(nodesxsample)
    if mesh is not None and mesh.size > 1 and n_req % mesh.size != 0:
        # Pad the batch up to a mesh multiple (repeat the last size) so the
        # fan-out never silently degrades to single-device; padded rows are
        # trimmed from every output below.
        pad_b = -(-n_req // mesh.size) * mesh.size - n_req
        nodesxsample = np.concatenate(
            [nodesxsample, np.repeat(nodesxsample[-1:], pad_b)]
        )
        if context is not None:
            context = np.asarray(context)
            context = np.concatenate(
                [context, np.repeat(context[-1:], pad_b, axis=0)]
            )
    node_mask_np, edge_mask_np = build_masks(nodesxsample, max_n_nodes)

    context_dev = None
    if context is not None or prop_dist is not None:
        if context is None:
            context = prop_dist.sample_batch(nodesxsample, rng)
        context = np.asarray(context, dtype=np.float32)
        if context.ndim == 2:  # [B, P] global property rows -> per node
            context = np.broadcast_to(
                context[:, None, :], (len(nodesxsample), max_n_nodes, context.shape[-1])
            )
        context = append_indicator_if_needed(model_cfg, context)
        context_dev = jnp.asarray(context * node_mask_np)

    node_mask_dev = jnp.asarray(node_mask_np)
    edge_mask_dev = jnp.asarray(edge_mask_np)
    if mesh is not None and mesh.size > 1:
        from geoldm_tpu.parallel import sharding as shd

        params = shd.shard_params(params, mesh)
        node_mask_dev = jax.device_put(node_mask_dev, shd.batch_sharding(mesh))
        edge_mask_dev = jax.device_put(edge_mask_dev, shd.batch_sharding(mesh))
        if context_dev is not None:
            context_dev = jax.device_put(context_dev, shd.batch_sharding(mesh))

    sampler = _jitted_sampler(model_cfg, compute_dtype, n_steps, eta, method,
                              guidance_scale, clip_z)
    x, h_cat, h_int = sampler(
        params, key, node_mask_dev, edge_mask_dev,
        context_dev, fix_noise=fix_noise,
    )
    if not as_numpy:
        return h_cat, h_int, x, node_mask_np[:n_req]
    return (
        np.asarray(h_cat)[:n_req],
        np.asarray(h_int)[:n_req],
        np.asarray(x)[:n_req],
        node_mask_np[:n_req],
    )


DEFAULT_SAMPLE_BUCKETS = (16, 24, 32)
# GEOM-Drugs size histogram (mean 46.6, max 181): finer buckets than the
# round-2 (48, 88, 184) set cut the expected O(pad^2) edge work 1.5x
# (E[pad^2] 4548 -> ~2950) at the cost of a few more compiled shapes —
# amortized by the persistent compile cache.
GEOM_SAMPLE_BUCKETS = (32, 48, 64, 96, 136, 184)


def default_buckets(dataset_info) -> tuple:
    """Per-dataset sampling buckets matched to the size histogram."""
    name = dataset_info["name"] if not hasattr(dataset_info, "name") else dataset_info.name
    if "geom" in name:
        return GEOM_SAMPLE_BUCKETS
    return DEFAULT_SAMPLE_BUCKETS


def sample_bucketed(
    model_cfg: ModelConfig,
    params,
    key,
    dataset_info,
    nodesxsample: np.ndarray,
    batch_size: int = 128,
    buckets=DEFAULT_SAMPLE_BUCKETS,
    prop_dist=None,
    context: Optional[np.ndarray] = None,
    fix_noise: bool = False,
    compute_dtype: Optional[str] = None,
    rng: Optional[np.random.Generator] = None,
    mesh=None,
    n_steps: Optional[int] = None,
    eta: float = 1.0,
    method: str = "ddim",
    chunk_pad: str = "pow2",
    guidance_scale: float = 1.0,
    clip_z: float = 0.0,
):
    """Size-bucketed generation: molecules are grouped by atom count and each
    group is padded only to its bucket boundary, cutting the O(N^2) edge work
    on the (dominant) small molecules. QM9's size distribution makes this
    ~2x faster than padding everything to max_n_nodes.

    ``chunk_pad`` controls remainder-chunk batch padding: "pow2" (default)
    rounds the last chunk of each bucket up to the next power of two —
    bounded waste, a few compiled shapes; "full" pads every chunk to
    ``batch_size`` so exactly ONE batch shape per bucket ever compiles
    (what the serving path warms).

    Only a few (bucket, batch_size) shapes ever compile: each bucket is
    processed in fixed-size chunks, the last chunk padded by repeating sizes
    and trimmed afterwards. Returns arrays padded to the largest bucket, in
    the original molecule order.
    """
    nodesxsample = np.asarray(nodesxsample)
    if context is not None:
        # Explicit per-molecule [B, P] property rows (e.g. the serving
        # path): sliced/padded alongside the sizes per chunk below.
        context = np.asarray(context, dtype=np.float32)
        assert context.ndim == 2 and len(context) == len(nodesxsample)
    # Bucket boundaries are rounded up to multiples of 8 (TPU sublane
    # alignment): unaligned N makes the kernel's [G*N*N, H] reshapes
    # layout-violating relayouts that blow up VMEM. Padding beyond the
    # dataset max is harmless — masks carry the real size.
    buckets = tuple(sorted(set(-(-int(b) // 8) * 8 for b in buckets)))
    need = -(-int(nodesxsample.max()) // 8) * 8
    if buckets[-1] < need:
        buckets = buckets + (need,)
    max_pad = buckets[-1]

    m = len(nodesxsample)
    # Outputs in original molecule order, padded to the largest bucket.
    # Allocated lazily (the charges width comes from the first chunk) and
    # filled with ONE vectorized device->host transfer + scatter per chunk —
    # no per-molecule Python work (this was a measurable tail at 10k).
    s = len(dataset_info["atom_decoder"])
    out = None
    pending = []
    for pad in buckets:
        lo = 0 if pad == buckets[0] else buckets[buckets.index(pad) - 1]
        idxs = np.where((nodesxsample > lo) & (nodesxsample <= pad))[0]
        if len(idxs) == 0:
            continue
        for start in range(0, len(idxs), batch_size):
            chunk = idxs[start : start + batch_size]
            sizes = nodesxsample[chunk]
            n_real = len(sizes)
            if n_real < batch_size:
                if chunk_pad == "full":
                    bsz = batch_size
                else:
                    # Pad the remainder chunk up to the next power of two
                    # (not the full batch) — bounds padding waste at <2x on
                    # the last chunk while keeping compiled shapes few.
                    bsz = 1 << (n_real - 1).bit_length() if n_real > 1 else 1
                    bsz = min(bsz, batch_size)
                sizes = np.concatenate(
                    [sizes, np.full(bsz - n_real, sizes[-1], dtype=sizes.dtype)]
                )
            ctx_chunk = None
            if context is not None:
                ctx_chunk = context[chunk]
                if len(ctx_chunk) < len(sizes):  # pad like the sizes
                    ctx_chunk = np.concatenate([
                        ctx_chunk,
                        np.repeat(ctx_chunk[-1:], len(sizes) - len(ctx_chunk),
                                  axis=0),
                    ])
            key, sub = jax.random.split(key)
            res = sample(
                model_cfg, params, sub, dataset_info, sizes, prop_dist=prop_dist,
                context=ctx_chunk,
                fix_noise=fix_noise, pad_nodes=pad, compute_dtype=compute_dtype,
                rng=rng, mesh=mesh, as_numpy=False, n_steps=n_steps, eta=eta,
                method=method, guidance_scale=guidance_scale, clip_z=clip_z,
            )
            pending.append((chunk, pad, n_real, res))
    # All chunks are dispatched before any device->host sync: jax's async
    # dispatch keeps the device queue full, overlapping chunk k+1's
    # sampling with chunk k's transfer (at 10k molecules through a
    # high-RTT tunnel this recovers several seconds of dead time).
    for chunk, pad, n_real, (one_hot, charges, x, node_mask) in pending:
        if out is None:
            inc = charges.shape[-1]
            out = (
                np.zeros((m, max_pad, s), dtype=np.float32),
                np.zeros((m, max_pad, inc), dtype=np.float32),
                np.zeros((m, max_pad, 3), dtype=np.float32),
                np.zeros((m, max_pad, 1), dtype=np.float32),
            )
        for dst, src in zip(out, (one_hot, charges, x, node_mask)):
            dst[chunk, :pad] = np.asarray(src)[:n_real]
    return out


def sample_chain(
    model_cfg: ModelConfig,
    params,
    key,
    dataset_info,
    n_tries: int = 1,
    prop_dist=None,
    keep_frames: int = 100,
    compute_dtype: Optional[str] = None,
    rng: Optional[np.random.Generator] = None,
):
    """Sample a visualization chain, retrying until the final molecule is
    stable. Returns (one_hot [F,N,S], charges [F,N,1], x [F,N,3]).
    reference: qm9/sampling.py:54-107."""
    name = dataset_info["name"]
    n_nodes = 19 if "qm9" in name else 44
    num_classes = len(dataset_info["atom_decoder"])

    node_mask_np, edge_mask_np = build_masks(np.array([n_nodes]), n_nodes)
    node_mask = jnp.asarray(node_mask_np)
    edge_mask = jnp.asarray(edge_mask_np)

    context = None
    if prop_dist is not None:
        ctx = prop_dist.sample(n_nodes, rng)  # [P]
        context = np.broadcast_to(
            ctx[None, None, :], (1, n_nodes, len(ctx))).copy()
        context = jnp.asarray(append_indicator_if_needed(model_cfg, context))

    from geoldm_tpu.nn.core import resolve_compute

    compute_dtype_ = resolve_compute(compute_dtype)

    @jax.jit
    def chain_fn(params, key):
        if model_cfg.kind == "latent_diffusion":
            return ldm_mod.ldm_sample_chain(
                params, model_cfg.diffusion, model_cfg.dynamics, model_cfg.vae,
                key, node_mask, edge_mask, context, keep_frames, compute_dtype_,
            )
        (x, h_cat, h_int), chain = vdm_mod.vdm_sample(
            params, model_cfg.diffusion, model_cfg.dynamics, key, node_mask,
            edge_mask, context, compute_dtype=compute_dtype_,
            keep_frames=keep_frames,
        )
        return chain

    for i in range(n_tries):
        key, sub = jax.random.split(key)
        chain = np.asarray(chain_fn(params, sub))  # [F, 1, N, 3+S(+1)]
        chain = chain[::-1, 0]  # reverse time: noise -> sample; drop batch
        # Repeat the final frame for a visible hold (reference :83).
        chain = np.concatenate([chain, np.repeat(chain[-1:], 10, axis=0)], axis=0)
        final = chain[-1]
        atom_types = np.argmax(final[:, 3 : 3 + num_classes], axis=1)
        stable = check_stability(final[:, :3], atom_types, dataset_info)[0]
        if stable or i == n_tries - 1:
            break

    x = chain[:, :, :3]
    one_hot_idx = np.argmax(chain[:, :, 3 : 3 + num_classes], axis=2)
    one_hot = np.eye(num_classes, dtype=np.float32)[one_hot_idx]
    charges = np.round(chain[:, :, -1:])
    return one_hot, charges, x


def sample_sweep_conditional(
    model_cfg: ModelConfig,
    params,
    key,
    dataset_info,
    prop_dist,
    n_nodes: int = 19,
    n_frames: int = 100,
    compute_dtype: Optional[str] = None,
):
    """Sweep each conditioning property over its observed range with fixed
    noise (reference: qm9/sampling.py:157-171)."""
    nodesxsample = np.full((n_frames,), n_nodes)
    rows = []
    for key_name in prop_dist.distributions:
        lo, hi = prop_dist.distributions[key_name][n_nodes]["params"]
        mean = prop_dist.normalizer[key_name]["mean"]
        mad = prop_dist.normalizer[key_name]["mad"]
        rows.append(np.linspace((lo - mean) / mad, (hi - mean) / mad, n_frames)[:, None])
    context = np.concatenate(rows, axis=1).astype(np.float32)
    return sample(
        model_cfg, params, key, dataset_info, nodesxsample,
        context=context, fix_noise=True, compute_dtype=compute_dtype,
    )

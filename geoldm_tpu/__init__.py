"""geoldm-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for geometric latent
diffusion over 3D molecules.

Re-designed from scratch with the capabilities of the GeoLDM reference
(mint258/GeoLDM, ICML 2023), built TPU-first:

- dense padded ``[B, N, ...]`` tensors end-to-end; the fully-connected EGNN
  message passing is a masked ``[B, N, N]`` einsum block (no gather/scatter),
  with an optional fused Pallas kernel for the hot path,
- pure-functional models (explicit param pytrees, explicit RNG keys),
- ``lax.scan`` reverse-diffusion samplers compiled as one XLA program,
- SPMD data/tensor parallelism over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

from geoldm_tpu import config as config

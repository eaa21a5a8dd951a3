"""FastPoseCNN-TPU: a TPU-native re-design of FastPoseCNN (edavalosanaya/FastPoseCNN).

Real-time monocular category-level 6D pose + size estimation on NOCS-format
data, rebuilt from scratch for TPU hardware:

- the compute path is pure JAX (flax models, jnp ops, Pallas kernels) traced
  into a single XLA program with static shapes end to end;
- the reference's CUDA RANSAC-voting extension and CuPy connected-component
  labeling are replaced by a Pallas voting kernel and an on-device
  label-propagation CC op (no host round trips);
- multi-device scaling uses `jax.sharding.Mesh` + collectives instead of
  NCCL/DDP;
- the host runtime (data loading, PNG decode, prefetch) has a native C++
  backend under `native/`.

Reference layer map: see SURVEY.md. Parity citations in docstrings point at
/root/reference/source_code/FastPoseCNN (abbreviated FPC).
"""

__version__ = "0.1.0"

from fastposecnn_tpu import constants  # noqa: F401

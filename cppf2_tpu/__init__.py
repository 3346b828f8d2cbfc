"""cppf2_tpu — a TPU-native JAX framework for sim-to-real category-level 9-DoF pose estimation.

Re-designed from scratch for TPU (JAX/XLA/Pallas/pjit) with the capability surface of
CPPF++ (qq456cvb/CPPF2, TPAMI 2024): point-tuple voting models over SHOT / DINOv2
features, Hough center voting, spherical orientation voting, noisy-pair filtering,
online SE(3) alignment, and the NOCS-protocol mAP evaluation harness.

Design stance (vs the CUDA/PyTorch reference):
  * Fixed shapes everywhere — point clouds padded to `n_max` with validity masks,
    tuples to `k_tuples`; boolean filtering becomes masking/top-k, never gather
    to dynamic shapes.
  * One jitted XLA graph per frame for inference (descriptors -> tuple MLP ->
    sampling -> voting -> filtering -> alignment -> ensemble).
  * PRNG keys threaded explicitly; category knowledge is a pytree constant.
  * Multi-chip scaling via jax.sharding.Mesh (+ shard_map): data-parallel training,
    tuple-sharded voting with psum'd vote grids.
"""

__version__ = "0.1.0"

from cppf2_tpu.config import CategoryConfig, CATEGORIES, get_category

__all__ = [
    "CategoryConfig",
    "CATEGORIES",
    "get_category",
    "__version__",
]

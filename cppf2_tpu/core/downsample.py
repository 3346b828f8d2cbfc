"""Fixed-shape voxel-grid downsampling.

Replaces the reference's Open3D `voxel_down_sample_and_trace` + random-point-per-
voxel loop (utils/util.py:39-46, dataset.py:108-115) with a jittable sort-based
implementation: points are keyed by their voxel cell, sorted with a random
tiebreak, and the first point of each run of equal keys is selected — i.e. a
uniformly random representative per occupied voxel, exactly the reference's
semantics but on-device and with a static output budget.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Per-axis cell budget. The reference's eval driver skips instances whose extent
# exceeds 1000 cells (eval.py:200-201); we clamp to the same order so the
# composite key fits in int32 (1024^3 = 2^30).
_GRID = 1024


class Downsampled(NamedTuple):
    indices: jax.Array   # (m_max,) int32 indices into the input cloud
    valid: jax.Array     # (m_max,) bool — True for real selections
    count: jax.Array     # () int32 — number of occupied voxels


def voxel_downsample(
    points: jax.Array,
    valid: jax.Array,
    res: float,
    m_max: int,
    key: jax.Array,
) -> Downsampled:
    """Select one random point per occupied `res`-sized voxel.

    Args:
        points: (N, 3).
        valid: (N,) bool input validity mask.
        res: voxel edge length (meters).
        m_max: static output budget; selections beyond it are dropped
            (count reports the true number of occupied voxels).
        key: PRNG key for the random per-voxel representative.
    Returns:
        Downsampled(indices, valid, count).
    """
    n = points.shape[0]
    origin = jnp.min(jnp.where(valid[:, None], points, jnp.inf), axis=0)
    origin = jnp.where(jnp.isfinite(origin), origin, 0.0)
    cell = jnp.clip(jnp.floor((points - origin) / res).astype(jnp.int32), 0, _GRID - 1)
    cell_key = (cell[:, 0] * _GRID + cell[:, 1]) * _GRID + cell[:, 2]
    # Invalid points sort last under the sentinel key.
    sentinel = jnp.int32(_GRID * _GRID * _GRID)
    cell_key = jnp.where(valid, cell_key, sentinel)

    # Random tiebreak: sort by (cell_key, random) using a stable argsort on the
    # random permutation first, then a stable sort on the key.
    perm = jax.random.permutation(key, n)
    keys_perm = cell_key[perm]
    order_within = jnp.argsort(keys_perm, stable=True)
    sorted_orig_idx = perm[order_within]
    sorted_keys = keys_perm[order_within]

    first = jnp.concatenate(
        [jnp.array([True]), sorted_keys[1:] != sorted_keys[:-1]]
    ) & (sorted_keys < sentinel)
    count = jnp.sum(first).astype(jnp.int32)
    # Budget overflow: when more voxels are occupied than m_max, take a
    # *uniform random* subset — selecting the first m_max in key order would
    # keep a spatial slab of the object (keys sort by x) and wreck downstream
    # geometry. Random priorities + top-k give an unbiased subset.
    prio = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    score = jnp.where(first, prio, -1.0)
    if n >= m_max:
        _, sel_pos = jax.lax.top_k(score, m_max)
    else:
        sel_pos = jnp.argsort(-score)
        sel_pos = jnp.pad(sel_pos, (0, m_max - n))
    out_valid = jnp.arange(m_max) < jnp.minimum(count, m_max)
    indices = jnp.where(out_valid, sorted_orig_idx[sel_pos], 0).astype(jnp.int32)
    return Downsampled(indices, out_valid, count)

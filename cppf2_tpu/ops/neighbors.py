"""Fixed-K radius-bounded nearest-neighbor search.

Replaces the reference's PCL KdTree radius search (src_shot/shot.cpp:28,70,139)
with a TPU-native formulation: blocked dense distance computation on the MXU
(|a-b|^2 = |a|^2 + |b|^2 - 2 a.b) followed by a per-row top-k. Irregular
radius neighborhoods become fixed-(N, K) index/validity tensors — the padded
form every downstream op (normals, SHOT) consumes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Neighbors(NamedTuple):
    idx: jax.Array    # (N, K) int32 neighbor indices (self included, sorted by distance)
    dist: jax.Array   # (N, K) float32 Euclidean distances
    valid: jax.Array  # (N, K) bool — within radius and both endpoints valid


def knn_radius_neighbors(
    points: jax.Array,
    valid: jax.Array,
    radius: float,
    k: int,
    query_chunk: int = 2048,
) -> Neighbors:
    """K nearest neighbors within `radius` for every point, fixed shape.

    PCL uses *all* neighbors within the radius; we keep the nearest `k` of them
    (a budgeted approximation whose fidelity is gated on end-metric parity, see
    SURVEY.md §7 hard-part 1).

    Args:
        points: (N, 3) cloud, padded.
        valid: (N,) bool validity of each point.
        radius: search radius (meters).
        k: static neighbor budget.
        query_chunk: queries per distance block (bounds the (chunk, N) buffer).
    """
    n = points.shape[0]
    k = min(k, n)
    pts = jnp.where(valid[:, None], points, 1e6)  # park invalid points far away
    sq = jnp.sum(pts * pts, axis=-1)

    def one_chunk(q):
        # q: (C, 3) query block
        qsq = jnp.sum(q * q, axis=-1)
        # MXU matmul in full precision: distances feed radius tests.
        cross = jax.lax.dot_general(
            q, pts, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d2 = qsq[:, None] + sq[None, :] - 2.0 * cross
        neg_d2, idx = jax.lax.top_k(-d2, k)
        return jnp.maximum(-neg_d2, 0.0), idx.astype(jnp.int32)

    num_chunks = -(-n // query_chunk)
    pad = num_chunks * query_chunk - n
    q_all = jnp.pad(pts, ((0, pad), (0, 0))).reshape(num_chunks, query_chunk, 3)
    d2_all, idx_all = jax.lax.map(one_chunk, q_all)
    d2_all = d2_all.reshape(-1, k)[:n]
    idx_all = idx_all.reshape(-1, k)[:n]

    dist = jnp.sqrt(d2_all)
    nb_valid = valid[idx_all] & (dist <= radius) & valid[:, None]
    return Neighbors(idx_all, dist, nb_valid)

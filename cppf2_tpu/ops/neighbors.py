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
    rel: jax.Array    # (N, K, 3) float32 neighbor - query offsets; computed
                      # once here (a (8192, 48, 3) gather measured 1.4 ms on
                      # v5e — consumers must NOT re-gather points[idx])


def knn_radius_neighbors(
    points: jax.Array,
    valid: jax.Array,
    radius: float,
    k: int,
    query_chunk: int = 8192,
    exact: bool = False,
) -> Neighbors:
    """K nearest neighbors within `radius` for every point, fixed shape.

    PCL uses *all* neighbors within the radius; we keep the nearest `k` of them
    (a budgeted approximation whose fidelity is gated on end-metric parity, see
    SURVEY.md §7 hard-part 1).

    Selection uses `lax.approx_min_k` — the TPU PartialReduce fast path — at
    recall_target=0.9 (measured within-radius recall 0.96 on dense surface
    shells at N=8192, K=48; exact on CPU where it lowers to a sort). Crucially, only the *values*
    output of the reduction is consumed: on this chip, materializing the
    custom call's index output costs ~33 ms at (8192, 8192), ~5x the entire
    rest of the search. Instead the column index is packed into the low
    mantissa bits of a radius-clipped, quantized d^2 (both exactly
    representable in f32), selected values-only, and decoded; exact distances
    are then recomputed elementwise for the selected pairs. The d^2
    quantization (radius^2 / levels) only reorders neighbors closer than
    ~radius/45 of each other — below the voxel-downsample spacing that feeds
    every call site. Pass `exact=True` to force `lax.top_k` selection
    (exact distances and tie order; slow index path).

    Args:
        points: (N, 3) cloud, padded.
        valid: (N,) bool validity of each point.
        radius: search radius (meters).
        k: static neighbor budget.
        query_chunk: queries per distance block (bounds the (chunk, N) buffer).
        exact: use exact top-k selection instead of the TPU approx fast path.
    """
    n = points.shape[0]
    k = min(k, n)
    # never pad a small cloud up to a full default-sized chunk (2x distance
    # work at n=4096): clamp to n rounded up to a lane multiple
    query_chunk = min(query_chunk, max(-(-n // 256) * 256, 256))
    pts = jnp.where(valid[:, None], points, 1e6)  # park invalid points far away
    sq = jnp.sum(pts * pts, axis=-1)
    r2 = radius * radius
    # index payload must keep q * n + col exact in f32: levels * n <= 2^24
    levels = max((1 << 24) // max(n, 1) - 1, 1)
    col = jnp.arange(n, dtype=jnp.float32)

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
        if exact:
            neg_d2, idx = jax.lax.top_k(-d2, k)
            diff = pts[idx] - q[:, None, :]
            return (
                jnp.sqrt(jnp.maximum(-neg_d2, 0.0)),
                idx.astype(jnp.int32),
                diff,
            )
        # pack the column index into the value; select values-only.
        # aggregate_to_topk=False keeps the PartialReduce fast path — the
        # default aggregation lowers to a FULL (C, N) sort on this backend
        # (traced: 5.4 ms of the 7.5 ms kNN loop); reducing to l<<N columns
        # and finishing with a small exact top_k measured ~20% faster per
        # chunk at (2048, 8192).
        qd2 = jnp.round(jnp.clip(d2, 0.0, r2) * (levels / r2))
        enc = qd2 * n + col[None, :]
        # recall_target 0.9 halves the reduced width (l=512 vs 1024 at
        # N=8192) and thus the final exact-top_k sort; measured within-radius
        # recall 0.96 on dense surface shells — a ~4% perturbation of a
        # 48-neighbor soft-binned histogram, validated end-metric
        red, _ = jax.lax.approx_min_k(
            enc, k, recall_target=0.9, aggregate_to_topk=False
        )
        enc_k = -jax.lax.top_k(-red, k)[0]
        idx = jnp.mod(enc_k, float(n)).astype(jnp.int32)
        # exact distances for the selected pairs, elementwise
        diff = pts[idx] - q[:, None, :]
        dist = jnp.linalg.norm(diff, axis=-1)
        return dist, idx, diff

    num_chunks = -(-n // query_chunk)
    pad = num_chunks * query_chunk - n
    q_all = jnp.pad(pts, ((0, pad), (0, 0))).reshape(num_chunks, query_chunk, 3)
    dist_all, idx_all, rel_all = jax.lax.map(one_chunk, q_all)
    dist = dist_all.reshape(-1, k)[:n]
    idx_all = idx_all.reshape(-1, k)[:n]
    rel = rel_all.reshape(-1, k, 3)[:n]

    # neighbor validity needs no gather of `valid`: invalid points are parked
    # at 1e6, so any such neighbor fails the radius test from a valid query
    # (a pred[N,K] gather measured 4.2 ms at 8192x64 on v5e — 20% of the whole
    # preprocess program); invalid queries are zeroed by the valid[:, None].
    nb_valid = (dist <= radius) & valid[:, None]
    return Neighbors(idx_all, dist, nb_valid, rel)

"""Radius-neighborhood surface normal estimation.

TPU-native equivalent of PCL's NormalEstimation as wrapped by the reference
(src_shot/shot.cpp:12-42 `estimate_normal`, :66-72 inside `compute`): covariance
of the neighbors within `radius` around each point, normal = eigenvector of the
smallest eigenvalue, oriented towards the viewpoint (origin by PCL default).

Points with fewer than 3 valid neighbors get a zero normal — the reference
NaN-scrubs PCL's NaNs to zero anyway (dataset.py:281-282, eval.py:215-216), so
we produce the scrubbed form directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cppf2_tpu.ops.eig3 import sym_eig3x3
from cppf2_tpu.ops.neighbors import Neighbors


def estimate_normals(
    points: jax.Array,
    neighbors: Neighbors,
    viewpoint: jax.Array | None = None,
) -> jax.Array:
    """Per-point unit normals from a fixed-K neighborhood tensor.

    Args:
        points: (N, 3).
        neighbors: output of knn_radius_neighbors (self-inclusive).
        viewpoint: (3,) sensor origin for sign disambiguation; defaults to 0.
    Returns:
        (N, 3) float32 normals; zero rows where under-determined.
    """
    if viewpoint is None:
        viewpoint = jnp.zeros((3,), dtype=points.dtype)

    rel = neighbors.rel                              # (N, K, 3) nb - point
    w = neighbors.valid.astype(points.dtype)         # (N, K)
    cnt = jnp.sum(w, axis=-1, keepdims=True)
    # centered offsets: (nb - centroid) == rel - weighted-mean(rel)
    rel_mean = jnp.sum(rel * w[..., None], axis=-2) / jnp.maximum(cnt, 1.0)
    d = (rel - rel_mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", d, d)
    _, vecs = sym_eig3x3(cov)
    normal = vecs[..., 2]                            # smallest-eigenvalue column

    # Orient towards the viewpoint (PCL flipNormalTowardsViewpoint).
    to_vp = viewpoint[None, :] - points
    flip = jnp.sum(normal * to_vp, axis=-1, keepdims=True) < 0
    normal = jnp.where(flip, -normal, normal)

    ok = (cnt[..., 0] >= 3)[:, None]
    return jnp.where(ok, normal, 0.0)

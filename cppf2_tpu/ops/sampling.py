"""Point sampling: farthest point sampling (FPS) and masked random choice.

FPS is the jittable analog of the reference's `farthest_point_sample`
(utils/util.py:2165-2186 region, torch loop) as a lax.fori_loop over a fixed
sample budget with validity masking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def farthest_point_sample(
    points: jax.Array,   # (N, 3)
    valid: jax.Array,    # (N,) bool
    m: int,              # static sample budget
    start: int = 0,
) -> jax.Array:
    """Indices of `m` farthest-point samples over the valid subset.

    Deterministic given `start`. Invalid points are never selected (distance
    forced to -inf); if `start` itself is invalid the seed moves to the first
    valid index (an all-invalid cloud degenerates to m copies of index 0);
    if fewer than m valid points exist, selections repeat.
    """
    n = points.shape[0]
    inf_mask = jnp.where(valid, 0.0, -jnp.inf)
    seed = jnp.where(valid[start], jnp.int32(start),
                     jnp.argmax(valid).astype(jnp.int32))

    def body(i, carry):
        dist, picks = carry
        last = picks[i - 1]
        d = jnp.sum((points - points[last]) ** 2, axis=-1)
        dist = jnp.minimum(dist, d)
        nxt = jnp.argmax(dist + inf_mask)
        picks = picks.at[i].set(nxt)
        return dist, picks

    picks0 = jnp.full((m,), seed, jnp.int32)
    dist0 = jnp.full((n,), jnp.inf)
    _, picks = jax.lax.fori_loop(1, m, body, (dist0, picks0))
    return picks


def masked_tuple_choice(
    key: jax.Array, count: jax.Array, m: int, k: int
) -> jax.Array:
    """(m, k) uniform indices over the valid prefix [0, count) of a padded
    cloud — the ONE tuple-sampling convention shared by training
    (train_shot.py:88 host randint) and inference (eval.py:207
    point_idxs_all). voxel_downsample packs valid points first, so uniform
    ints below `count` index only real points."""
    u = jax.random.uniform(key, (m, k))
    return jnp.floor(u * count).astype(jnp.int32)


def masked_choice(key: jax.Array, count: jax.Array, m: int) -> jax.Array:
    """m uniform indices over the valid prefix [0, count) (random choice over a
    padded cloud, the pattern behind dataset.py:397 / eval.py:196)."""
    u = jax.random.uniform(key, (m,))
    return jnp.floor(u * count).astype(jnp.int32)

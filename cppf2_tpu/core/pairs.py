"""Point-pair vote parameterization.

The heart of the CPPF++ mechanism: every (a, b) point pair is described, w.r.t. a
center and a set of canonical axes, by
  * proj_len — signed projection of (a - center) on the unit pair direction,
  * odist    — orthogonal distance of `center` from the pair's line,
  * angles   — angle of the unit pair direction vs each canonical axis.

TPU-native vmapped equivalent of the reference's numpy `generate_target_pairs`
(dataset.py:118-135) / `generate_target_noaux` (dataset.py:137-161). Note the
reference's eval driver passes axes in the order (up, front, right)
(eval.py:237-240 into dataset.py:118's (up, right, front) signature), so its
`target_rot[..., 2]` is the angle vs cfg.right — we name slots explicitly
instead of relying on that accident.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-7


class PairTargets(NamedTuple):
    tr: jax.Array      # (N, 2): [proj_len, odist]
    up_angle: jax.Array     # (N,) angle of pair direction vs canonical up
    right_angle: jax.Array  # (N,) angle of pair direction vs canonical right
    front_angle: jax.Array  # (N,) angle of pair direction vs canonical front


def pair_targets(
    a: jax.Array,
    b: jax.Array,
    up: jax.Array,
    right: jax.Array,
    front: jax.Array,
    center: jax.Array | None = None,
) -> PairTargets:
    """Compute vote targets for pairs (a, b), batched over the leading axis.

    Matches dataset.py:118-135 numerically (same epsilon regularization of the
    unit direction).

    Args:
        a, b: (N, 3) pair endpoints.
        up/right/front: (3,) canonical axes.
        center: (3,) reference center; origin if None.
    """
    if center is None:
        center = jnp.zeros((3,), dtype=a.dtype)
    pdist = a - b
    unit = pdist / (jnp.linalg.norm(pdist, axis=-1, keepdims=True) + _EPS)
    rel = a - center
    proj_len = jnp.sum(rel * unit, axis=-1)
    oc = rel - proj_len[..., None] * unit
    odist = jnp.linalg.norm(oc, axis=-1)
    tr = jnp.stack([proj_len, odist], axis=-1)

    def _angle(axis):
        return jnp.arccos(jnp.clip(jnp.sum(unit * axis, axis=-1), -1.0, 1.0))

    return PairTargets(tr, _angle(up), _angle(right), _angle(front))


def tuple_pairwise_diffs(points: jax.Array, tuple_idx: jax.Array) -> jax.Array:
    """All pairwise coordinate differences within each point tuple.

    Reference: train_shot.py:81 / train_dino.py:92 build C(k,2) differences via a
    Python loop of gathers; here a single gather + static index arithmetic.

    Args:
        points: (N, 3).
        tuple_idx: (T, k) int point indices.
    Returns:
        (T, C(k,2) * 3) concatenated differences, ordered as
        itertools.combinations(range(k), 2).
    """
    k = tuple_idx.shape[-1]
    gathered = points[tuple_idx]          # (T, k, 3)
    ii, jj = _comb_indices(k)
    diffs = gathered[:, ii, :] - gathered[:, jj, :]   # (T, C, 3)
    return diffs.reshape(diffs.shape[0], -1)


def _comb_indices(k: int):
    ii, jj = [], []
    for i in range(k):
        for j in range(i + 1, k):
            ii.append(i)
            jj.append(j)
    return tuple(ii), tuple(jj)

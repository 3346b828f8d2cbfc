"""Soft bin codecs: scalar value <-> probability over bins.

TPU-native re-implementation of the two-bin soft assignment used as the
classification target for canonical coordinates (reference: utils/util.py:215-252
`real2prob`, utils/util.py:254-272 `prob2real`). Written with one-hot matmuls and
broadcasts instead of scatter (`scatter_` in the reference) so XLA fuses them into
the surrounding graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def real2prob(val: jax.Array, max_val: float, num_bins: int, circular: bool = False) -> jax.Array:
    """Encode values in [0, max_val] as a soft two-bin distribution over `num_bins`.

    Non-circular: bins are placed at i * max_val/(num_bins-1); mass is split linearly
    between the two bracketing bins. Circular: bins tile [0, max_val) with wraparound.

    Args:
        val: any shape, values in [0, max_val].
    Returns:
        val.shape + (num_bins,) probabilities summing to 1 along the last axis.
    """
    if not circular:
        interval = max_val / (num_bins - 1)
        low = jnp.clip(jnp.floor(val / interval).astype(jnp.int32), 0, num_bins - 2)
        frac = val / interval - low.astype(val.dtype)
        w_low = 1.0 - frac
        onehot_low = jax.nn.one_hot(low, num_bins, dtype=val.dtype)
        onehot_high = jax.nn.one_hot(low + 1, num_bins, dtype=val.dtype)
        return onehot_low * w_low[..., None] + onehot_high * (1.0 - w_low)[..., None]
    else:
        interval = max_val / num_bins
        val_new = jnp.where(val < interval / 2, val + max_val, val)
        res = real2prob(val_new - interval / 2, max_val, num_bins + 1, circular=False)
        first = res[..., 0] + res[..., -1]
        return jnp.concatenate([first[..., None], res[..., 1:-1]], axis=-1)


def prob2real(prob: jax.Array, max_val: float, num_bins: int, circular: bool = False) -> jax.Array:
    """Decode a distribution over bins back to a scalar expectation.

    Non-circular: linear expectation over bin centers. Circular: vector-mean angle
    (atan2 of summed unit vectors), remapped to [0, 2*pi).
    """
    if not circular:
        centers = jnp.arange(num_bins, dtype=prob.dtype) * (max_val / (num_bins - 1))
        return jnp.sum(prob * centers, axis=-1)
    else:
        interval = max_val / num_bins
        ang = jnp.arange(num_bins, dtype=prob.dtype) * interval + interval / 2
        vec = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)
        res = jnp.sum(prob[..., None] * vec, axis=-2)
        theta = jnp.arctan2(res[..., 1], res[..., 0])
        return jnp.where(theta < 0, theta + 2 * jnp.pi, theta)

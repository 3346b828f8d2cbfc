"""Residual MLP building blocks.

Flax equivalents of the reference's `ResLayer` (train_shot.py:19-43, duplicated
train_dino.py:21-45) with the production configuration (no batch-norm, no
dropout — both disabled in every reference instantiation).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax


class ResLayer(nn.Module):
    """y = (W2 relu(W1 x) + skip), skip projected when widths differ."""

    dim_out: int
    dtype: str = "float32"   # compute dtype; params always float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dt = self.dtype
        skip = x if x.shape[-1] == self.dim_out else nn.Dense(
            self.dim_out, name="proj", dtype=dt
        )(x)
        h = nn.relu(nn.Dense(self.dim_out, name="fc1", dtype=dt)(x))
        h = nn.Dense(self.dim_out, name="fc2", dtype=dt)(h)
        return h + skip


class ResMLP(nn.Module):
    """Stack of ResLayers over a width schedule, e.g. (128,)*5 + (64,)."""

    dims: Sequence[int]
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, d in enumerate(self.dims):
            x = ResLayer(d, dtype=self.dtype, name=f"res{i}")(x)
        return x

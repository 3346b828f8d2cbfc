"""Point-tuple voting models: geometric (SHOT) and visual (DINO) branches.

Re-designed from the reference's `BeyondCPPF` LightningModules
(train_shot.py:46-130, train_dino.py:58-138) as stateless flax modules over
fixed-shape tuple tensors. Matching dimensions:

  SHOT branch — shot_encoder 352->[128]*5->64; tuple input
  C(k,2)*(3 coord-diff + 1 |normal cos|) + k*64 encoded SHOT (=360 for k=5);
  tuple_encoder ->[128]*5->256; logit head 256->256->256->6*num_bins;
  scale head 256->128->64->3  (train_shot.py:52-73).

  DINO branch — per-point desc 1024->256, concat k*256 ->256; tuple input
  C(k,2)*3 + 256 (=286 for k=5); same heads (train_dino.py:64-85).

Uncertainty is modeled as a distribution over canonical-coordinate bins
(2 primary points x 3 coords x num_bins), sampled at inference
(eval.py:227-230).
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cppf2_tpu.core.pairs import _comb_indices
from cppf2_tpu.models.layers import ResMLP


class TuplePredictions(NamedTuple):
    logits: jax.Array   # (T, 6, num_bins) — 2 points x 3 canonical coords
    scales: jax.Array   # (T, 3) — predicted object bound (bbox side lengths)


class _Heads(nn.Module):
    num_bins: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, feat: jax.Array) -> TuplePredictions:
        logits = ResMLP((256, 256, 6 * self.num_bins), dtype=self.dtype, name="logit_encoder")(feat)
        scales = ResMLP((128, 64, 3), dtype=self.dtype, name="scale_encoder")(feat)
        return TuplePredictions(
            logits.reshape(feat.shape[0], 6, self.num_bins).astype(jnp.float32),
            scales.astype(jnp.float32),
        )


class ShotBranch(nn.Module):
    """Geometric branch over SHOT descriptors + normals."""

    tuple_size: int = 5     # num_more + 2
    num_bins: int = 32
    shot_dim: int = 352
    dtype: str = "float32"  # compute dtype (use bfloat16 for inference speed)

    @nn.compact
    def __call__(
        self,
        points: jax.Array,      # (N, 3)
        shot: jax.Array,        # (N, shot_dim)
        normals: jax.Array,     # (N, 3)
        tuple_idx: jax.Array,   # (T, tuple_size) int
    ) -> TuplePredictions:
        k = self.tuple_size
        ii, jj = _comb_indices(k)
        enc = ResMLP((128,) * 5 + (64,), dtype=self.dtype, name="shot_encoder")(shot)   # (N, 64)

        g_pts = points[tuple_idx]        # (T, k, 3)
        g_enc = enc[tuple_idx]           # (T, k, 64)
        g_nrm = normals[tuple_idx]       # (T, k, 3)

        coord = (g_pts[:, ii, :] - g_pts[:, jj, :]).reshape(g_pts.shape[0], -1)
        # sign-invariant pairwise normal agreement (train_shot.py:77-78)
        ncos = jnp.abs(jnp.sum(g_nrm[:, ii, :] * g_nrm[:, jj, :], axis=-1))
        feats = jnp.concatenate([coord, ncos, g_enc.reshape(g_enc.shape[0], -1)], axis=-1)

        feat = ResMLP((128,) * 5 + (256,), dtype=self.dtype, name="tuple_encoder")(feats)
        return _Heads(self.num_bins, dtype=self.dtype, name="heads")(feat)


class DinoBranch(nn.Module):
    """Visual branch over (frozen) DINOv2 patch descriptors."""

    tuple_size: int = 5
    num_bins: int = 32
    desc_dim: int = 1024
    proj_dim: int = 256
    dtype: str = "float32"  # compute dtype (use bfloat16 for inference speed)

    @nn.compact
    def __call__(
        self,
        points: jax.Array,      # (N, 3)
        desc: jax.Array,        # (N, desc_dim)
        tuple_idx: jax.Array,   # (T, tuple_size)
    ) -> TuplePredictions:
        k = self.tuple_size
        ii, jj = _comb_indices(k)
        pdesc = nn.Dense(self.proj_dim, dtype=self.dtype, name="desc_transform")(desc)   # (N, 256)

        g_pts = points[tuple_idx]
        g_desc = pdesc[tuple_idx].reshape(tuple_idx.shape[0], -1)      # (T, k*256)
        pair_desc = nn.Dense(self.proj_dim, dtype=self.dtype, name="desc_pair_transform")(g_desc)

        coord = (g_pts[:, ii, :] - g_pts[:, jj, :]).reshape(g_pts.shape[0], -1)
        feats = jnp.concatenate([coord, pair_desc], axis=-1)

        feat = ResMLP((128,) * 5 + (256,), dtype=self.dtype, name="tuple_encoder")(feats)
        return _Heads(self.num_bins, dtype=self.dtype, name="heads")(feat)

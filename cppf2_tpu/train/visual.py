"""End-to-end trainable visual branch: compact ViT backbone + tuple head.

The reference's visual branch samples descriptors from a FROZEN pretrained
DINOv2 ViT-L (dataset.py:62-80, train_dino.py:142-161) — the weights are an
external asset it downloads via torch.hub. This module adds a capability the
reference lacks: training a compact ViT backbone *through the pose-tuple
loss* on synthetic renders, so the visual branch carries real signal even
when no pretrained checkpoint exists. Gradients flow
tuple_loss -> DinoBranch -> bilinear token interpolation -> ViT blocks ->
patch embed, and the whole thing compiles into ONE jitted data-parallel
step (scanned transformer blocks, static shapes).

Descriptor conventions match the frozen-backbone path exactly
(train/driver.py::_frame_descriptors and models/dinov2.py::
bbox_crop_descriptors): bbox-square crop rescaled to `out_size`, resized to
(out_size/stride*14)^2 for the ViT, tokens bilinearly sampled at cloud
pixels with L2 normalization — so a trained backbone drops into
`DinoFeatureExtractor` / the eval drivers unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from cppf2_tpu.config import TrainConfig
from cppf2_tpu.models.dinov2 import interpolate_features
from cppf2_tpu.train.loop import (
    TrainState,
    _sample_tuples,
    make_optimizer,
    tuple_loss,
)


def create_visual_train_state(
    vit_model,
    branch_model,
    cfg: TrainConfig,
    key,
    out_size: int = 256,
    stride: int = 8,
) -> TrainState:
    """Init a combined {'backbone', 'branch'} param tree + optimizer state."""
    k1, k2 = jax.random.split(key)
    ph = out_size // stride
    img0 = jnp.zeros((ph * 14, ph * 14, 3), jnp.float32)
    backbone = vit_model.init(k1, img0)
    d = vit_model.cfg.embed_dim
    i0 = jnp.zeros((8, branch_model.tuple_size), jnp.int32)
    branch = branch_model.init(k2, jnp.zeros((16, 3)), jnp.zeros((16, d)), i0)
    params = {"backbone": backbone, "branch": branch}
    tx = make_optimizer(cfg)
    return TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))


def make_visual_train_step(
    vit_model,
    branch_model,
    cfg: TrainConfig,
    out_size: int = 256,
    stride: int = 8,
    backbone_lr_scale: float = 1.0,
):
    """Jitted DP train step for the end-to-end visual branch.

    Batch pytree (leading axis = frames, shard over the mesh 'data' axis):
      crop (B, S, S, 3) f32 in [0,1] — bbox-square rescaled render crop,
      kp (B, N, 2) f32 — cloud-point pixel coords in crop space (x, y),
      pc (B, N, 3), pc_canon (B, N, 3), bound (B, 3), count (B,) int32.

    `backbone_lr_scale` scales backbone gradients relative to the head
    (1.0 trains from scratch; <1 for fine-tuning a ported checkpoint).
    """
    tx = make_optimizer(cfg)
    ph = out_size // stride

    def frame_loss(params, frame, key):
        resized = jax.image.resize(
            frame["crop"], (ph * 14, ph * 14, 3), method="bilinear"
        )
        grid = vit_model.apply(params["backbone"], resized)
        desc = interpolate_features(
            grid, frame["kp"], (out_size, out_size), stride
        )
        tuple_idx = _sample_tuples(
            key, frame["count"], cfg.tuples_per_step, branch_model.tuple_size
        )
        preds = branch_model.apply(
            params["branch"], frame["pc"], desc, tuple_idx
        )
        return tuple_loss(
            preds, frame["pc_canon"], tuple_idx, frame["bound"], cfg.num_bins
        )

    def batch_loss(params, batch, key):
        b = batch["pc"].shape[0]
        keys = jax.random.split(key, b)
        losses = jax.vmap(lambda f, k: frame_loss(params, f, k))(batch, keys)
        return jnp.mean(losses["total"]), jax.tree.map(jnp.mean, losses)

    @jax.jit
    def train_step(state: TrainState, batch, key):
        (_, metrics), grads = jax.value_and_grad(batch_loss, has_aux=True)(
            state.params, batch, key
        )
        if backbone_lr_scale != 1.0:
            grads = {
                "backbone": jax.tree.map(
                    lambda g: g * backbone_lr_scale, grads["backbone"]
                ),
                "branch": grads["branch"],
            }
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), metrics

    return train_step

"""Jitted training: tuple loss, optimizer, data-parallel train step.

Replaces the reference's PyTorch-Lightning harness (train_shot.py:85-150,
train_dino.py:99-161) with a single jitted step:

  * tuple indices are sampled on-device with jax PRNG each step (the reference
    draws fresh host-numpy indices per step, train_shot.py:88);
  * loss = KL(soft-binned canonical coords || predicted) + MSE(scale)
    (train_shot.py:97-104);
  * Adam(lr 1e-3, wd 0) with StepLR(25 epochs, x0.5) (train_shot.py:124-130);
  * batches of frames (the reference is locked to batch_size=1) vmapped per
    device and sharded over the mesh 'data' axis — gradients reduce over ICI
    via XLA's GSPMD partitioner, no hand-written collectives needed.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from cppf2_tpu.config import TrainConfig
from cppf2_tpu.core.binning import real2prob
from cppf2_tpu.ops.sampling import masked_tuple_choice

_KL_EPS = 1e-12


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def make_lr_schedule(cfg: TrainConfig) -> Callable[[jax.Array], jax.Array]:
    """StepLR: lr * gamma^(epoch // step_epochs) with steps_per_epoch granularity."""

    boundary = cfg.lr_step_epochs * cfg.steps_per_epoch

    def schedule(step):
        return cfg.lr * cfg.lr_gamma ** (step // boundary)

    return schedule


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adamw(
        learning_rate=make_lr_schedule(cfg), weight_decay=cfg.weight_decay
    )


def create_train_state(model, example_inputs: tuple, cfg: TrainConfig, key) -> TrainState:
    params = model.init(key, *example_inputs)
    tx = make_optimizer(cfg)
    return TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))


def tuple_loss(
    preds,
    pc_canon: jax.Array,     # (N, 3) canonical coordinates of the cloud
    tuple_idx: jax.Array,    # (T, k)
    bound: jax.Array,        # (3,) gt object bound
    num_bins: int,
) -> Dict[str, jax.Array]:
    """Classification + scale loss for one frame (train_shot.py:96-104).

    target: canonical coords of the two primary tuple points, clamped to
    [-0.5, 0.5], shifted to [0, 1], soft-binned; KL divergence with
    'batchmean' normalization (sum over bins and the 6 coords, mean over
    tuples). Scale: MSE of the 3-vector bound, broadcast over tuples.
    """
    t = tuple_idx.shape[0]
    target = real2prob(
        jnp.clip(pc_canon[tuple_idx[:, :2]], -0.5, 0.5) + 0.5, 1.0, num_bins
    ).reshape(t, 6, num_bins)
    logprob = jax.nn.log_softmax(preds.logits, axis=-1)
    kl = target * (jnp.log(target + _KL_EPS) - logprob)
    loss_cls = jnp.sum(kl) / t
    loss_scale = jnp.mean((preds.scales - bound[None, :]) ** 2)
    return {"cls": loss_cls, "scale": loss_scale, "total": loss_cls + loss_scale}


def _sample_tuples(key, count: jax.Array, num_tuples: int, tuple_size: int) -> jax.Array:
    """Uniform tuple indices over the valid prefix (the shared
    `ops/sampling.py::masked_tuple_choice` convention — training and
    inference MUST sample identically, train_shot.py:88 / eval.py:207)."""
    return masked_tuple_choice(key, count, num_tuples, tuple_size)


def make_train_step(
    model,
    cfg: TrainConfig,
    branch: str = "shot",
):
    """Build the jitted data-parallel train step for a branch.

    Batch pytree (leading axis = frames, shard it over the mesh 'data' axis):
      pc (B, N, 3), pc_canon (B, N, 3), bound (B, 3), count (B,) int,
      plus per-branch features: shot (B, N, 352) + normal (B, N, 3), or
      desc (B, N, 1024).
    """
    tx = make_optimizer(cfg)

    def frame_loss(params, frame, key):
        tuple_idx = _sample_tuples(
            key, frame["count"], cfg.tuples_per_step, model.tuple_size
        )
        if branch == "shot":
            preds = model.apply(
                params, frame["pc"], frame["shot"], frame["normal"], tuple_idx
            )
        else:
            preds = model.apply(params, frame["pc"], frame["desc"], tuple_idx)
        return tuple_loss(preds, frame["pc_canon"], tuple_idx, frame["bound"], cfg.num_bins)

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
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), metrics

    return train_step


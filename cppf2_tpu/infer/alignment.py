"""Online SE(3) alignment refinement, fully on-device.

Replaces the reference's lietorch-based host loop (eval.py:319-355): Adam over
(translation, delta-quaternion) minimizing the L1 consistency between the
observed cloud brought into canonical space and the model-predicted canonical
pair coordinates. jax autodiff through the quaternion-to-matrix map replaces
lietorch's CUDA jacobians; the 100-step loop is a lax.fori_loop inside jit.

Matches the reference's details: delta quaternion initialized to identity
(eval.py:323), rotation gradient rescaled by pi/180 before the Adam step
(eval.py:338), and the loss restricted to the canonical y (up) coordinate for
rotation-symmetric categories (eval.py:333-334).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from cppf2_tpu.core.geometry import quat_to_matrix


class AlignResult(NamedTuple):
    rotation: jax.Array     # (3, 3) refined rotation
    translation: jax.Array  # (3,) refined translation
    loss: jax.Array         # final alignment loss


def align_pose(
    points: jax.Array,            # (N, 3) padded cloud
    pair_idx: jax.Array,          # (K, 2) kept pair indices (static shape)
    pair_weight: jax.Array,       # (K,) >0 for real kept pairs, 0 for padding
    pred_pairs_scaled: jax.Array, # (K, 2, 3) predicted canonical pairs * metric scale
    rotation: jax.Array,          # (3, 3) initial rotation estimate
    translation: jax.Array,       # (3,) initial translation estimate
    up_sym: bool,
    steps: int = 100,
    lr: float = 1e-2,
) -> AlignResult:
    """Refine (R, T) by minimizing |canon(pc)[pairs] - pred_pairs_scaled|."""

    w = (pair_weight > 0).astype(points.dtype)
    w_pairs = w[:, None, None]
    denom = jnp.maximum(jnp.sum(w), 1.0)
    # gather once outside the loop: each optimization step then transforms only
    # the (K, 2, 3) pair points instead of the full cloud + a gather per step
    pair_pts = points[pair_idx]                            # (K, 2, 3)

    def loss_fn(params):
        trans, quat = params
        rot = quat_to_matrix(quat) @ rotation
        canon = (pair_pts - trans) @ rot                   # (K, 2, 3)
        diff = jnp.abs(canon - pred_pairs_scaled)
        if up_sym:
            # only the canonical up coordinate is well-defined under symmetry
            per = diff[..., 1] * w_pairs[..., 0]
            return jnp.sum(per) / (denom * 2.0)
        per = diff * w_pairs
        return jnp.sum(per) / (denom * 6.0)

    tx = optax.adam(lr)
    init_params = (translation, jnp.array([0.0, 0.0, 0.0, 1.0], points.dtype))
    opt_state = tx.init(init_params)

    def body(_, carry):
        params, opt_state = carry
        grads = jax.grad(loss_fn)(params)
        grads = (grads[0], grads[1] * (jnp.pi / 180.0))   # eval.py:338
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state

    params, _ = jax.lax.fori_loop(0, steps, body, (init_params, opt_state))
    trans, quat = params
    rot = quat_to_matrix(quat) @ rotation
    return AlignResult(rot, trans, loss_fn(params))

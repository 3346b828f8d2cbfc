"""Single-frame pose estimation as one jitted XLA graph.

The reference's eval loop (eval.py:219-372) hops between host numpy, CUDA
tensors and two extensions per instance; here descriptors -> tuple MLP ->
bin sampling -> pair targets -> center vote -> backvoting -> rotation votes ->
axis assembly -> alignment optimization -> ensemble selection is a single
compiled function over fixed shapes.

Conventions carried over from the reference:
  * bins decode to canonical coords bin/(num_bins-1) - 0.5 (eval.py:229-230);
  * per-pair metric scale = |observed pair| / |predicted canonical pair|
    (eval.py:233-235);
  * object scale = median of the scale head over kept pairs (eval.py:308-310),
    taken from the visual branch when both run (model_idx == 0);
  * branch selection by clipped canonical reconstruction loss (eval.py:358-372).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cppf2_tpu.config import CategoryConfig, PipelineConfig
from cppf2_tpu.core.geometry import fibonacci_sphere
from cppf2_tpu.core.pairs import pair_targets
from cppf2_tpu.infer.alignment import align_pose
from cppf2_tpu.ops.voting import (
    backvote_filter,
    sphere_vote,
    vote_center,
    vote_rotation,
)

_EPS = 1e-7


class PoseEstimate(NamedTuple):
    rotation: jax.Array      # (3, 3)
    translation: jax.Array   # (3,)
    scale: jax.Array         # (3,) anisotropic bound (metric)
    scale_norm: jax.Array    # () |scale|
    loss: jax.Array          # () reconstruction loss used for ensembling


def _axis_const(v) -> jnp.ndarray:
    return jnp.asarray(np.asarray(v, np.float32))


def estimate_pose_branch(
    apply_fn,
    params,
    points: jax.Array,       # (N, 3) padded
    point_valid: jax.Array,  # (N,)
    count: jax.Array,        # () int — number of valid points (prefix)
    tuple_idx: jax.Array,    # (P, k) pre-sampled tuple indices
    key: jax.Array,
    cat: CategoryConfig,
    pipe: PipelineConfig,
    sphere_pts: jax.Array,
    run_opt: bool = True,
    override_scale_norm: Optional[jax.Array] = None,
    override_scale: Optional[jax.Array] = None,
) -> PoseEstimate:
    """Run one branch's full vote + optimize pipeline.

    `apply_fn(params, points, tuple_idx) -> TuplePredictions` closes over the
    branch's feature tensors.
    """
    up = _axis_const(cat.up)
    right = _axis_const(cat.right)
    front = _axis_const(cat.front)
    num_bins = pipe.num_bins

    preds = apply_fn(params, points, tuple_idx)
    p = tuple_idx.shape[0]

    # --- bin sampling (eval.py:227-230): treat logits as a distribution and
    # sample, rather than taking the expectation.
    flat_logits = preds.logits.reshape(p * 6, num_bins)
    samples = jax.random.categorical(key, flat_logits, axis=-1)
    pred_pairs = samples.reshape(p, 2, 3).astype(points.dtype) / (num_bins - 1) - 0.5

    a_obs = points[tuple_idx[:, 0]]
    b_obs = points[tuple_idx[:, 1]]
    obs_len = jnp.linalg.norm(a_obs - b_obs, axis=-1)
    pred_len = jnp.linalg.norm(pred_pairs[:, 0] - pred_pairs[:, 1], axis=-1)
    pair_scale = obs_len / jnp.maximum(pred_len, _EPS)
    pred_pairs_scaled = pred_pairs * pair_scale[:, None, None]

    pair_valid = (
        (tuple_idx[:, 0] < count) & (tuple_idx[:, 1] < count) & (pred_len > _EPS)
    )

    # --- vote targets from the *predicted canonical* pairs (eval.py:237-240)
    t = pair_targets(pred_pairs_scaled[:, 0], pred_pairs_scaled[:, 1], up, right, front)

    # --- center vote
    cv = vote_center(
        points, point_valid, t.tr, tuple_idx[:, :2], pair_valid,
        cat.res, grid=pipe.fine_grid,
    )
    t_est = cv.center

    # --- backvoting / noisy-pair filter on observed geometry (eval.py:252-275)
    bv = backvote_filter(
        points, t.tr, tuple_idx[:, :2], pair_valid, t_est,
        pipe.num_kept_pairs, pipe.imp_wt_margin,
    )
    ki = bv.kept_idx
    kept_pairs = tuple_idx[ki, :2]
    kept_w = bv.pair_weight[ki]
    inv_w = jnp.where(kept_w > 0, 1.0 / jnp.maximum(kept_w, _EPS), 0.0)

    # --- rotation votes: up axis then right axis (eval.py:277-293)
    def vote_axis(angles):
        dirs, wm = vote_rotation(
            points, angles[ki], kept_pairs, kept_w > 0, pipe.num_rots
        )
        w = jnp.repeat(inv_w, pipe.num_rots) * wm
        top, _ = sphere_vote(dirs, w, sphere_pts, pipe.angle_tol_deg, topk=1)
        return top[0]

    pred_up = vote_axis(t.up_angle)
    pred_right = vote_axis(t.right_angle)

    # Gram-Schmidt right against up (eval.py:295-296)
    pred_right = pred_right - jnp.dot(pred_up, pred_right) * pred_up
    pred_right = pred_right / (jnp.linalg.norm(pred_right) + 1e-9)

    up_loc = cat.up_axis_index
    right_loc = cat.right_axis_index
    other_loc = ({0, 1, 2} - {up_loc, right_loc}).pop()
    r_est = jnp.eye(3, dtype=points.dtype)
    r_est = r_est.at[:, up_loc].set(pred_up)
    r_est = r_est.at[:, right_loc].set(pred_right)
    third = jnp.cross(
        r_est[:, (other_loc + 1) % 3], r_est[:, (other_loc + 2) % 3]
    )
    r_est = r_est.at[:, other_loc].set(third)

    # --- object scale: median of the scale head over kept pairs (eval.py:308-310)
    kept_scales = preds.scales[ki]
    pred_scale = jnp.median(kept_scales, axis=0)
    if override_scale is not None:
        pred_scale = override_scale
    scale_norm = jnp.linalg.norm(pred_scale)
    if override_scale_norm is not None:
        scale_norm = override_scale_norm

    # --- online alignment optimization (eval.py:319-355)
    if run_opt:
        ar = align_pose(
            points, kept_pairs, kept_w, pred_pairs_scaled[ki],
            r_est, t_est, cat.up_sym, pipe.opt_steps, pipe.opt_lr,
        )
        r_est, t_est = ar.rotation, ar.translation

    # --- reconstruction loss for branch selection (eval.py:358-363)
    canon = (points - t_est) @ r_est / jnp.maximum(scale_norm, _EPS)
    diff = jnp.abs(canon[kept_pairs] - pred_pairs[ki])
    if cat.up_sym:
        diff = diff[..., 1:2]
    diff = jnp.clip(diff, 0.0, 0.1)
    wmask = (kept_w > 0).astype(points.dtype)[:, None, None]
    loss = jnp.sum(diff * wmask) / jnp.maximum(
        jnp.sum(wmask) * 2 * diff.shape[-1], 1.0
    )

    return PoseEstimate(r_est, t_est, pred_scale, scale_norm, loss)


def estimate_pose_ensemble(
    dino_apply,
    dino_params,
    shot_apply,
    shot_params,
    points: jax.Array,
    point_valid: jax.Array,
    count: jax.Array,
    key: jax.Array,
    cat: CategoryConfig,
    pipe: PipelineConfig,
    run_opt: bool = True,
    use_visual: bool = True,
    use_geo: bool = True,
) -> PoseEstimate:
    """Run both branches and keep the better by reconstruction loss
    (eval.py:219, 358-372). Shared tuple sample across branches, like the
    reference's single `point_idxs_all` (eval.py:207).
    """
    sphere_pts = jnp.asarray(fibonacci_sphere(pipe.sphere_samples))
    k_tuple, k_dino, k_shot = jax.random.split(key, 3)
    u = jax.random.uniform(k_tuple, (pipe.num_pairs, 5))
    tuple_idx = jnp.floor(u * count).astype(jnp.int32)

    est_d = estimate_pose_branch(
        dino_apply, dino_params, points, point_valid, count, tuple_idx,
        k_dino, cat, pipe, sphere_pts, run_opt,
    )
    # the geo branch reuses the visual branch's scale estimate (eval.py:308-316)
    est_s = estimate_pose_branch(
        shot_apply, shot_params, points, point_valid, count, tuple_idx,
        k_shot, cat, pipe, sphere_pts, run_opt,
        override_scale_norm=est_d.scale_norm, override_scale=est_d.scale,
    )

    loss_d = jnp.where(use_visual, est_d.loss, jnp.inf)
    loss_s = jnp.where(use_geo, est_s.loss, jnp.inf)
    pick_d = loss_d <= loss_s

    def sel(a, b):
        return jnp.where(pick_d, a, b)

    return PoseEstimate(
        sel(est_d.rotation, est_s.rotation),
        sel(est_d.translation, est_s.translation),
        est_d.scale,
        est_d.scale_norm,
        jnp.minimum(loss_d, loss_s),
    )

"""Single-frame pose estimation as one jitted XLA graph.

The reference's eval loop (eval.py:219-372) hops between host numpy, CUDA
tensors and two extensions per instance, running the two ensemble branches
sequentially; here descriptors -> tuple MLP -> bin sampling -> pair targets ->
center vote -> backvoting -> rotation votes -> axis assembly -> alignment
optimization -> ensemble selection is a single compiled function over fixed
shapes, and everything downstream of the branch MLPs is *vmapped over the
branch axis* — both branches' votes, sorts and 100-step alignment loops run as
one batched computation instead of back-to-back (measured ~2x wall win on
v5e: the alignment loop is latency- not FLOP-bound).

Conventions carried over from the reference:
  * bins decode to canonical coords bin/(num_bins-1) - 0.5 (eval.py:229-230);
  * per-pair metric scale = |observed pair| / |predicted canonical pair|
    (eval.py:233-235);
  * object scale = median of the scale head over kept pairs (eval.py:308-310),
    taken from the visual branch when both run (model_idx == 0);
  * branch selection by clipped canonical reconstruction loss (eval.py:358-372).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cppf2_tpu.config import CategoryConfig, PipelineConfig
from cppf2_tpu.core.geometry import fibonacci_sphere
from cppf2_tpu.core.pairs import pair_targets
from cppf2_tpu.infer.alignment import align_pose
from cppf2_tpu.ops.sampling import masked_tuple_choice
from cppf2_tpu.ops.voting import (
    backvote_filter,
    sphere_vote_cone,
    vote_center,
)

_EPS = 1e-7


class PoseEstimate(NamedTuple):
    rotation: jax.Array      # (3, 3)
    translation: jax.Array   # (3,)
    scale: jax.Array         # (3,) anisotropic bound (metric)
    scale_norm: jax.Array    # () |scale|
    loss: jax.Array          # () reconstruction loss used for ensembling
    # () int32 winning-branch id from the ensemble arbiter (0 = visual,
    # 1 = geometric), for pick-rate diagnostics; None on single-branch paths
    pick: Optional[jax.Array] = None


class _BranchPose(NamedTuple):
    rotation: jax.Array       # (3, 3)
    translation: jax.Array    # (3,)
    scale: jax.Array          # (3,) this branch's own median scale
    kept_pairs: jax.Array     # (K, 2) point indices of kept pairs
    kept_mask: jax.Array      # (K,) bool real-pair mask
    pred_pairs_kept: jax.Array  # (K, 2, 3) unscaled canonical predictions


def _axis_const(v) -> jnp.ndarray:
    return jnp.asarray(np.asarray(v, np.float32))


def _pose_from_preds(
    logits: jax.Array,       # (P, 6, num_bins)
    scales: jax.Array,       # (P, 3)
    points: jax.Array,
    point_valid: jax.Array,
    count: jax.Array,
    tuple_idx: jax.Array,
    key: jax.Array,
    cat: CategoryConfig,
    pipe: PipelineConfig,
    sphere_pts: jax.Array,
    run_opt: bool,
) -> _BranchPose:
    """Everything downstream of a branch's tuple MLP (vmapped over branches)."""
    up = _axis_const(cat.up)
    right = _axis_const(cat.right)
    front = _axis_const(cat.front)
    num_bins = pipe.num_bins
    p = tuple_idx.shape[0]

    # --- bin sampling (eval.py:227-230)
    samples = jax.random.categorical(key, logits.reshape(p * 6, num_bins), axis=-1)
    pred_pairs = samples.reshape(p, 2, 3).astype(points.dtype) / (num_bins - 1) - 0.5

    a_obs = points[tuple_idx[:, 0]]
    b_obs = points[tuple_idx[:, 1]]
    obs_len = jnp.linalg.norm(a_obs - b_obs, axis=-1)
    pred_len = jnp.linalg.norm(pred_pairs[:, 0] - pred_pairs[:, 1], axis=-1)

    pair_valid = (
        (tuple_idx[:, 0] < count) & (tuple_idx[:, 1] < count) & (pred_len > _EPS)
    )

    scale_mode = pipe.scale_mode or cat.scale_mode
    if scale_mode in ("head", "split"):
        # Canonical->metric factor from the scale head instead of per-pair
        # |obs|/|pred| ratios (eval.py:233-235). When part of the object is
        # occluded (mug with hidden handle), canonical predictions collapse
        # toward the visible-geometry marginal mean, shrinking |pred| ~0.7x
        # and biasing every per-pair ratio ~1.4x high — a systematic ~5 cm
        # center overshoot along the view ray. The scale head's median bound
        # stays calibrated on the same frames (measured: pred |bound| 0.260
        # vs gt 0.258); its max component is exactly the bound.max() that
        # normalizes the canonical frame.
        head_bound = jnp.nanmedian(
            jnp.where(pair_valid[:, None], scales, jnp.nan).astype(jnp.float32),
            axis=0,
        )
        factor = jnp.max(jnp.abs(head_bound)).astype(points.dtype)
        pred_pairs_scaled = pred_pairs * factor
        tr_pairs = pred_pairs_scaled
        if scale_mode == "split":
            # "split": additionally re-solve the xz components per pair so
            # the rescaled pair length matches the observed length exactly:
            # obs^2 = f^2 dy^2 + fxz^2 dxz^2. If predictions collapse xz
            # toward the axis by any per-pair factor g (dy calibrated,
            # dxz = g * dxz_true), then fxz = factor / g and the rescaled xz
            # offsets equal the TRUE metric offsets — the collapse cancels
            # out of the center vote entirely. The corrected pairs feed ONLY
            # the translation targets (tr): the rescale is anisotropic, so
            # it would distort the pair *directions* the rotation-vote
            # angles are computed from (angles are invariant under the
            # isotropic modes); rotation votes and alignment keep the
            # head-scaled pairs.
            up_loc = cat.up_axis_index
            d = pred_pairs[:, 0] - pred_pairs[:, 1]
            dy2 = jnp.square(d[:, up_loc])
            dxz2 = jnp.maximum(jnp.sum(d * d, axis=-1) - dy2, 0.0)
            fxz2 = jnp.maximum(jnp.square(obs_len) - jnp.square(factor) * dy2, 0.0)
            fxz = jnp.sqrt(fxz2 / jnp.maximum(dxz2, _EPS))
            # robustness: bound the correction, and near-vertical pairs carry
            # no xz information -> fall back to the head factor
            fxz = jnp.clip(fxz, 0.25 * factor, 4.0 * factor)
            fxz = jnp.where(dxz2 > 1e-6, fxz, factor)
            axis_scale = jnp.where(
                jnp.arange(3) == up_loc, factor, fxz[:, None]
            ).astype(points.dtype)
            tr_pairs = pred_pairs * axis_scale[:, None, :]
    else:
        pair_scale = obs_len / jnp.maximum(pred_len, _EPS)
        pred_pairs_scaled = pred_pairs * pair_scale[:, None, None]
        tr_pairs = pred_pairs_scaled

    # --- vote targets from the *predicted canonical* pairs (eval.py:237-240)
    t = pair_targets(pred_pairs_scaled[:, 0], pred_pairs_scaled[:, 1], up, right, front)
    if tr_pairs is not pred_pairs_scaled:
        t_tr = pair_targets(tr_pairs[:, 0], tr_pairs[:, 1], up, right, front)
        t = t._replace(tr=t_tr.tr)

    # --- center vote
    cv = vote_center(
        points, point_valid, t.tr, tuple_idx[:, :2], pair_valid, cat.res,
        levels=pipe.vote_levels, fine_samples=pipe.vote_fine_samples,
    )
    t_est = cv.center

    # --- backvoting / noisy-pair filter (eval.py:252-275)
    bv = backvote_filter(
        points, t.tr, tuple_idx[:, :2], pair_valid, t_est,
        pipe.num_kept_pairs, pipe.imp_wt_margin,
    )
    ki = bv.kept_idx
    kept_pairs = tuple_idx[ki, :2]
    kept_w = bv.pair_weight[ki]
    inv_w = jnp.where(kept_w > 0, 1.0 / jnp.maximum(kept_w, _EPS), 0.0)

    # --- rotation votes: up and right axes (eval.py:277-293) in ONE fused
    # cone-arc accumulation — both axes share the kept pairs, so the pair
    # frames and geometry-vs-sphere matmuls are computed once
    axis_angles = jnp.stack([t.up_angle[ki], t.right_angle[ki]])
    top_dirs, _ = sphere_vote_cone(
        points, axis_angles, kept_pairs, inv_w, sphere_pts,
        pipe.angle_tol_deg, topk=1,
    )
    pred_up = top_dirs[0, 0]
    pred_right = top_dirs[1, 0]

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
    pred_scale = jnp.median(scales[ki], axis=0)

    # --- online alignment optimization (eval.py:319-355)
    if run_opt:
        ar = align_pose(
            points, kept_pairs, kept_w, pred_pairs_scaled[ki],
            r_est, t_est, cat.up_sym, cat.up_axis_index,
            pipe.opt_steps, pipe.opt_lr,
        )
        r_est, t_est = ar.rotation, ar.translation

    # --- feature-weighted yaw micro-sweep (no reference counterpart: the
    # geometry-side answer to the visible-handle yaw near-misses the
    # reference papers over with its pretrained visual branch)
    do_sweep = cat.yaw_sweep if pipe.yaw_sweep is None else pipe.yaw_sweep
    if do_sweep and not cat.up_sym:
        from cppf2_tpu.infer.alignment import yaw_sweep

        r_est = yaw_sweep(
            points, kept_pairs, kept_w, pred_pairs_scaled[ki], pred_pairs[ki],
            r_est, t_est, cat.up_axis_index,
        )

    return _BranchPose(
        r_est, t_est, pred_scale, kept_pairs, kept_w > 0, pred_pairs[ki]
    )


def _recon_loss_rt(
    points, rotation, translation, yard: _BranchPose, scale_norm, up_sym: bool,
    up_axis: int = 1,
) -> jax.Array:
    """Clipped canonical reconstruction loss of an (R, T) hypothesis measured
    against one branch's kept pairs + canonical predictions (the 'yardstick');
    eval.py:358-363 with the pose and the yardstick decoupled so poses can be
    cross-scored for ensemble arbitration. Under `up_sym` only the canonical
    `up_axis` coordinate is rotation-invariant (the reference hardcodes y)."""
    canon = (points - translation) @ rotation / jnp.maximum(scale_norm, _EPS)
    diff = jnp.abs(canon[yard.kept_pairs] - yard.pred_pairs_kept)
    if up_sym:
        diff = diff[..., up_axis:up_axis + 1]
    diff = jnp.clip(diff, 0.0, 0.1)
    wmask = yard.kept_mask.astype(points.dtype)[:, None, None]
    return jnp.sum(diff * wmask) / jnp.maximum(
        jnp.sum(wmask) * 2 * diff.shape[-1], 1.0
    )


def _recon_loss(
    points, pose: _BranchPose, scale_norm, up_sym: bool, up_axis: int = 1
) -> jax.Array:
    """Clipped canonical reconstruction loss (eval.py:358-363): the pose
    measured against its own branch's predictions."""
    return _recon_loss_rt(
        points, pose.rotation, pose.translation, pose, scale_norm, up_sym,
        up_axis,
    )


def _arbitrate(points, poses: _BranchPose, scale_norm, up_sym: bool,
               arbiter: str, margin: float, up_axis: int = 1):
    """Pick the winning branch among the vmapped poses.

    Returns (pick, reported_loss). `arbiter`:
      * "recon"  — argmin of each branch's own loss, ties to the visual
        branch (index 0), the reference's rule (eval.py:358-372);
      * "cross"  — argmin of the mean loss over BOTH branches' yardsticks:
        L[i, j] = loss of pose i on branch j's kept pairs/predictions. A
        branch with self-consistently-wrong predictions scores well on its
        own yardstick but not on the other's; a genuinely better pose wins
        on both. Reduces to "recon" when one branch runs;
      * "margin" — reference rule, but the visual branch (index 0) only
        overrides geo when it wins by `margin` (the conservative gate).
    The reported loss is the picked candidate's score under the SAME rule,
    so restart selection optimizes one consistent objective.
    """
    if arbiter not in ("recon", "cross", "margin"):
        raise ValueError(f"unknown arbiter {arbiter!r} "
                         "(expected 'recon', 'cross' or 'margin')")
    n_branch = poses.rotation.shape[0]
    own = jax.vmap(
        functools.partial(_recon_loss, up_sym=up_sym, up_axis=up_axis),
        in_axes=(None, 0, None),
    )(points, poses, scale_norm)
    if arbiter == "cross" and n_branch > 1:
        # L[i, j]: pose i measured on yardstick j
        def pose_row(rot, tr):
            return jax.vmap(
                lambda yard: _recon_loss_rt(
                    points, rot, tr, yard, scale_norm, up_sym, up_axis
                )
            )(poses)

        lmat = jax.vmap(pose_row)(poses.rotation, poses.translation)
        score = jnp.mean(lmat, axis=1)
        pick = jnp.argmin(score)
        return pick, score[pick]
    if arbiter == "margin" and n_branch > 1:
        # visual (0) must beat geo (1) by `margin` to override it
        pick = jnp.where(own[0] <= own[1] - margin, 0, 1)
        return pick, own[pick]
    pick = jnp.argmin(own)  # "recon": ties go to visual, like the
    return pick, own[pick]  # reference's `<=` arbitration


def estimate_pose_branch(
    apply_fn,
    params,
    points: jax.Array,
    point_valid: jax.Array,
    count: jax.Array,
    tuple_idx: jax.Array,
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
    preds = apply_fn(params, points, tuple_idx)
    pose = _pose_from_preds(
        preds.logits, preds.scales, points, point_valid, count, tuple_idx,
        key, cat, pipe, sphere_pts, run_opt,
    )
    scale = pose.scale if override_scale is None else override_scale
    scale_norm = (
        jnp.linalg.norm(scale) if override_scale_norm is None else override_scale_norm
    )
    loss = _recon_loss(points, pose, scale_norm, cat.up_sym,
                       cat.up_axis_index)
    return PoseEstimate(pose.rotation, pose.translation, scale, scale_norm, loss)


def estimate_pose_branch_restarts(
    apply_fn,
    params,
    points: jax.Array,
    point_valid: jax.Array,
    count: jax.Array,
    key: jax.Array,
    cat: CategoryConfig,
    pipe: PipelineConfig,
    sphere_pts: jax.Array,
    restarts: int = 3,
    run_opt: bool = True,
) -> PoseEstimate:
    """Best-of-N restarts of one branch's pipeline (inference-time scaling).

    The vote pipeline is stochastic (tuple sampling eval.py:207, multinomial
    bin sampling eval.py:227-229); each restart draws an independent sample
    and the winner is picked by the same clipped reconstruction loss the
    reference uses for ensemble selection (eval.py:358-372). Kills both
    near-miss axis errors and gross yaw flips at linear extra on-chip cost —
    the restart axis is vmapped, so it batches like the branch axis.

    Memory note: vmapping the restart axis scales peak HBM linearly with
    `restarts` at full `num_pairs` (the ensemble path's `pipe.restarts`
    deliberately uses sequential `lax.map` instead — same memory as one
    pass). At the production config (3 restarts x 50k pairs) the transient
    is ~100 MB — fine on a 16 GB chip; for large restart counts prefer
    `estimate_pose_ensemble` with `pipe.restarts`.
    """

    def one(k):
        k1, k2 = jax.random.split(k)
        ti = masked_tuple_choice(k1, count, pipe.num_pairs, cat.tuple_size)
        return estimate_pose_branch(
            apply_fn, params, points, point_valid, count, ti, k2,
            cat, pipe, sphere_pts, run_opt=run_opt,
        )

    ests = jax.vmap(one)(jax.random.split(key, restarts))
    i = jnp.argmin(ests.loss)
    return jax.tree.map(lambda x: x[i], ests)


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
    (eval.py:219, 358-372). The branch MLPs run separately (different
    architectures); everything after the logits runs once, vmapped over a
    leading branch axis [dino, shot]. Shared tuple sample across branches,
    like the reference's single `point_idxs_all` (eval.py:207).

    With `pipe.restarts > 1` the whole ensemble reruns on N independent
    tuple/bin draws via `lax.map` (sequential — same memory as one pass)
    and the lowest-loss candidate wins; see
    `estimate_pose_branch_restarts` for the rationale.
    """
    if pipe.restarts > 1:
        single = dataclasses.replace(pipe, restarts=1)

        def _one(k):
            return estimate_pose_ensemble(
                dino_apply, dino_params, shot_apply, shot_params,
                points, point_valid, count, k, cat, single,
                run_opt=run_opt, use_visual=use_visual, use_geo=use_geo,
            )

        ests = jax.lax.map(_one, jax.random.split(key, pipe.restarts))
        i = jnp.argmin(ests.loss)
        return jax.tree.map(lambda x: x[i], ests)

    assert use_visual or use_geo, "at least one branch must be enabled"
    sphere_pts = jnp.asarray(fibonacci_sphere(pipe.sphere_samples))
    k_tuple, k_dino, k_shot = jax.random.split(key, 3)
    tuple_idx = masked_tuple_choice(
        k_tuple, count, pipe.num_pairs, cat.tuple_size)

    # only the *enabled* branches' MLPs run (use_visual/use_geo are static
    # under jit): a disabled branch contributes no MXU work. The visual
    # branch, when enabled, is always index 0 — so index 0's scale is the
    # reference's precedence (visual first, eval.py:308-316) in every mode.
    branches = []
    if use_visual:
        branches.append((dino_apply(dino_params, points, tuple_idx), k_dino))
    if use_geo:
        branches.append((shot_apply(shot_params, points, tuple_idx), k_shot))
    logits = jnp.stack([p.logits for p, _ in branches])
    scales = jnp.stack([p.scales for p, _ in branches])
    keys = jnp.stack([k for _, k in branches])

    poses = jax.vmap(
        functools.partial(
            _pose_from_preds,
            cat=cat, pipe=pipe, sphere_pts=sphere_pts, run_opt=run_opt,
        ),
        in_axes=(0, 0, None, None, None, None, 0),
    )(logits, scales, points, point_valid, count, tuple_idx, keys)

    scale = poses.scale[0]
    scale_norm = jnp.linalg.norm(scale)
    pick, loss = _arbitrate(
        points, poses, scale_norm, cat.up_sym, pipe.arbiter,
        pipe.arbiter_margin, cat.up_axis_index,
    )
    # report the branch id in the fixed [visual=0, geo=1] convention even
    # when only the geo branch ran
    branch_id = pick if use_visual else pick + 1
    return PoseEstimate(
        poses.rotation[pick],
        poses.translation[pick],
        scale,
        scale_norm,
        loss,
        branch_id.astype(jnp.int32),
    )

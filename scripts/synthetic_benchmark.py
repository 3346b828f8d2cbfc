"""Synthetic-data accuracy benchmark: train -> eval -> NOCS mAP per category.

Self-contained accuracy evaluation of the full framework loop without any
external assets: for each category, train the geometric (SHOT) branch on
procedurally rendered frames, then pose held-out frames through the *inference*
path (depth -> cloud -> SHOT -> vote -> backvote -> rotation -> alignment) and
score with the NOCS-protocol mAP harness (IoU@25/50, 5°5cm / 10°10cm ...).

This is the in-sandbox stand-in for REAL275 parity runs (BASELINE.md path (b):
retraining with the fully-specified recipe); with real data mounted, use
cppf2_tpu.eval.driver instead.

    python scripts/synthetic_benchmark.py --categories can bowl --steps 20000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from cppf2_tpu.config import CATEGORIES, PipelineConfig, SYNSET_NAMES, TrainConfig
from cppf2_tpu.core.geometry import fibonacci_sphere
from cppf2_tpu.data.synthetic import SyntheticFrameGenerator
from cppf2_tpu.eval.nocs_map import compute_degree_cm_map
from cppf2_tpu.eval.pose_errors import fetch_rt_pair, pose_error_degree_cm
from cppf2_tpu.infer.frontend import preprocess_frame
from cppf2_tpu.infer.pipeline import (
    estimate_pose_branch,
    estimate_pose_branch_restarts,
)
from cppf2_tpu.models import DinoBranch, ShotBranch
from cppf2_tpu.train import create_train_state
from cppf2_tpu.train.loop import make_train_step


def _make_extractor(seed):
    from cppf2_tpu.models.dinov2 import DinoFeatureExtractor

    ext = DinoFeatureExtractor()
    ext.init_random(hw=(256, 256), seed=seed)
    return ext


class _FramePool:
    """Frames (+ visual descriptors for the dino branch) with streaming
    refresh. The dino branch trains on textured/lit renders through the ViT
    extractor — the end-to-end visual path (train/driver.py analog)."""

    def __init__(self, gen, size, branch, extractor=None):
        self.gen, self.branch, self.ext = gen, branch, extractor
        self.frames = [self._one() for _ in range(size)]

    def _one(self):
        f = self.gen.next_frame()
        if self.branch == "dino":
            from cppf2_tpu.train.driver import _frame_descriptors

            return f, jnp.asarray(_frame_descriptors(f, self.ext))
        return f, None

    def refresh_one(self, rng):
        self.frames[int(rng.integers(0, len(self.frames)))] = self._one()

    def sample(self, rng):
        return self.frames[int(rng.integers(0, len(self.frames)))]


def train_one(cat_name, steps, n_points, tuples, pool_frames, seed, progress,
              refresh_every=0, branch="shot", extractor=None,
              handle_visible=False):
    cat = CATEGORIES[cat_name]
    # default steps_per_epoch=200 keeps the reference's StepLR cadence: decay
    # x0.5 every 25 virtual epochs = 5000 steps (train_shot.py:124-130 with
    # dataset.py:364's virtual length; a larger value silently disables
    # annealing and cost ~1-2 deg of final precision in round-1 runs)
    cfg = TrainConfig(tuples_per_step=tuples, n_points=n_points, seed=seed)
    gen = SyntheticFrameGenerator(cat, n_max=n_points, shot_k=48, seed=seed,
                                  require_handle_visible=handle_visible)
    t0 = time.time()
    pool = _FramePool(gen, pool_frames, branch, extractor)
    progress(f"[{cat_name}] rendered {pool_frames} frames in {time.time()-t0:.0f}s")

    f0 = pool.frames[0][0]
    i0 = jnp.zeros((8, cat.tuple_size), jnp.int32)
    if branch == "shot":
        model = ShotBranch(tuple_size=cat.tuple_size)
        init_args = (f0.pc, f0.shot, f0.normal, i0)
    else:
        model = DinoBranch(tuple_size=cat.tuple_size)
        init_args = (f0.pc, pool.frames[0][1], i0)
    state = create_train_state(model, init_args, cfg, jax.random.key(seed))
    step = make_train_step(model, cfg, branch=branch)

    def to_batch(f, desc):
        b = {"pc": f.pc[None], "pc_canon": f.pc_canon[None],
             "bound": f.bound[None], "count": jnp.int32(f.count)[None]}
        if branch == "shot":
            b["shot"], b["normal"] = f.shot[None], f.normal[None]
        else:
            b["desc"] = desc[None]
        return b

    rng = np.random.default_rng(seed)
    t0 = time.time()
    for i in range(steps):
        if refresh_every and i % refresh_every == 0:
            # stream fresh frames through the pool (avoids the pool-overfit
            # cliff found in round 1 on asymmetric categories)
            pool.refresh_one(rng)
        f, desc = pool.sample(rng)
        state, metrics = step(state, to_batch(f, desc), jax.random.key(i))
    progress(f"[{cat_name}] {steps} steps in {time.time()-t0:.0f}s, "
             f"loss {float(metrics['total']):.3f}")
    return model, state


def eval_one(cat_name, model, state, n_frames, pipe, n_points, seed, progress,
             branch="shot", extractor=None, restarts=1):
    cat = CATEGORIES[cat_name]
    gen = SyntheticFrameGenerator(cat, n_max=n_points, shot_k=48, seed=seed + 77)
    sphere = jnp.asarray(fibonacci_sphere(pipe.sphere_samples))
    cls_id = cat.category_id

    # branch params enter as a jit ARGUMENT: closure pytrees are inlined as
    # module constants (CLAUDE.md), which bloats the compile request and
    # defeats the compile cache across categories/checkpoints
    @jax.jit
    def pose_frame(branch_params, depth, key):
        fi = preprocess_frame(depth, depth > 0, gen.intrinsics, key,
                              res=cat.res, n_max=n_points, shot_k=48)
        k1, k2 = jax.random.split(jax.random.fold_in(key, 1))

        def shot_apply(params, points, tidx):
            return model.apply(params, points, fi.shot, fi.normal, tidx)

        if restarts > 1:
            return estimate_pose_branch_restarts(
                shot_apply, branch_params, fi.pc, fi.valid, fi.count,
                jax.random.fold_in(key, 1), cat, pipe, sphere,
                restarts=restarts, run_opt=True,
            )
        u = jax.random.uniform(k1, (pipe.num_pairs, cat.tuple_size))
        ti = jnp.floor(u * fi.count).astype(jnp.int32)
        return estimate_pose_branch(
            shot_apply, branch_params, fi.pc, fi.valid, fi.count, ti, k2,
            cat, pipe, sphere, run_opt=True,
        )

    @jax.jit
    def preprocess_only(depth, key):
        return preprocess_frame(depth, depth > 0, gen.intrinsics, key,
                                res=cat.res, n_max=n_points, shot_k=48)

    @jax.jit
    def pose_dino(branch_params, fi, desc, key):
        k1, k2 = jax.random.split(key)
        u = jax.random.uniform(k1, (pipe.num_pairs, cat.tuple_size))
        ti = jnp.floor(u * fi.count).astype(jnp.int32)

        def dino_apply(params, points, tidx):
            return model.apply(params, points, desc, tidx)

        return estimate_pose_branch(
            dino_apply, branch_params, fi.pc, fi.valid, fi.count, ti, k2,
            cat, pipe, sphere, run_opt=True,
        )

    def _dino_frame(f, key):
        # eval-path visual descriptors: crop the rendered gray image and
        # sample the ViT grid at the *preprocessed* cloud's pixels
        from cppf2_tpu.train.driver import _frame_descriptors

        fi = preprocess_only(f.depth, key)
        fd = f._replace(pixel_yx=fi.pixel_yx)
        desc = jnp.asarray(_frame_descriptors(fd, extractor))
        return pose_dino(state.params, fi, desc, jax.random.fold_in(key, 1))

    results = []
    errs = []
    vis = []
    t0 = time.time()
    for i in range(n_frames):
        f = gen.next_frame()
        handle_vis = getattr(gen, "last_handle_visible", 1)
        vis.append(handle_vis)
        if branch == "dino":
            est = _dino_frame(f, jax.random.key(1000 + i))
        else:
            est = pose_frame(state.params, f.depth, jax.random.key(1000 + i))
        rt, scales, gt_rt, gt_scales = fetch_rt_pair(est, f)
        results.append({
            "image_path": f"synth_{i}",
            "gt_class_ids": np.array([cls_id]),
            "gt_RTs": gt_rt[None],
            "gt_scales": gt_scales[None],
            "gt_handle_visibility": np.array([handle_vis]),
            "pred_class_ids": np.array([cls_id]),
            "pred_RTs": rt[None],
            "pred_scales": scales[None],
            "pred_scores": np.array([1.0]),
        })

        e = pose_error_degree_cm(rt, gt_rt, cat_name, handle_visibility=handle_vis)
        errs.append(e)
    errs = np.asarray(errs)
    progress(
        f"[{cat_name}] eval {n_frames} frames in {time.time()-t0:.0f}s: "
        f"median {np.median(errs[:, 0]):.1f} deg / {np.median(errs[:, 1]):.2f} cm"
    )
    return results, errs, np.asarray(vis)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--categories", nargs="+", default=list(CATEGORIES))
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--n-points", type=int, default=4096)
    ap.add_argument("--tuples", type=int, default=8192)
    ap.add_argument("--pool", type=int, default=100)
    ap.add_argument("--refresh-every", type=int, default=0,
                    help="replace one pool frame every N steps (0 = static pool)")
    ap.add_argument("--train-handle-visible", action="store_true",
                    help="train only on frames whose mug handle is visible "
                         "(yaw is unobservable otherwise; eval still sees all "
                         "frames and gates via gt_handle_visibility)")
    ap.add_argument("--branch", default="shot", choices=["shot", "dino"],
                    help="geometric (SHOT) or visual (DINO over textured renders)")
    ap.add_argument("--num-pairs", type=int, default=20000)
    ap.add_argument("--restarts", type=int, default=1,
                    help="best-of-N eval restarts, picked by recon loss")
    ap.add_argument("--out", default="benchmarks/synthetic_latest")
    ap.add_argument("--save-ckpts", default=None,
                    help="save trained params under {dir}/shot/{category}")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    pipe = PipelineConfig(n_points=args.n_points, num_pairs=args.num_pairs)
    extractor = _make_extractor(args.seed) if args.branch == "dino" else None
    all_results = []
    summary = {}
    for cat_name in args.categories:
        model, state = train_one(
            cat_name, args.steps, args.n_points, args.tuples, args.pool,
            args.seed, print, refresh_every=args.refresh_every,
            branch=args.branch, extractor=extractor,
            handle_visible=args.train_handle_visible,
        )
        if args.save_ckpts:
            from cppf2_tpu.train.checkpoints import export_params_msgpack

            path = export_params_msgpack(
                os.path.join(args.save_ckpts, args.branch, cat_name,
                             "params.msgpack"),
                jax.device_get(state.params),
            )
            print(f"[{cat_name}] saved params {path}")
        results, errs, vis = eval_one(
            cat_name, model, state, args.frames, pipe, args.n_points,
            args.seed, print, branch=args.branch, extractor=extractor,
            restarts=args.restarts,
        )
        all_results += results
        os.makedirs(args.out, exist_ok=True)
        np.savez(os.path.join(args.out, f"errors_{cat_name}.npz"),
                 errs=errs, handle_visible=vis)
        summary[cat_name] = {
            "median_deg": float(np.median(errs[:, 0])),
            "median_cm": float(np.median(errs[:, 1])),
            "deg5cm5": float(np.mean((errs[:, 0] < 5) & (errs[:, 1] < 5))),
        }

    os.makedirs(args.out, exist_ok=True)
    iou_aps, pose_aps = compute_degree_cm_map(
        all_results, SYNSET_NAMES, args.out,
        degree_thresholds=(5, 10, 15), shift_thresholds=(5, 10, 15),
        iou_3d_thresholds=tuple(np.linspace(0, 1, 101)),
        iou_pose_thres=0.1, use_matches_for_pose=True,
    )
    # mean over *present* classes (the harness's index -1 averages all real
    # classes, reference-style, which is NaN when a category wasn't run)
    out = {
        "per_category": summary,
        "mean_iou25": float(np.nanmean(iou_aps[1:-1, 25])),
        "mean_iou50": float(np.nanmean(iou_aps[1:-1, 50])),
        "mean_5deg5cm": float(np.nanmean(pose_aps[1:-1, 0, 0])),
        "mean_10deg10cm": float(np.nanmean(pose_aps[1:-1, 1, 1])),
        "steps": args.steps,
        "frames_per_cat": args.frames,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

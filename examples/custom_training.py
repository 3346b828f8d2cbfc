"""End-to-end example: train on synthetic renders, then pose a held-out frame.

The framework analog of the reference's train_custom.ipynb (render 1000 views
-> dump -> train both branches -> infer on a real frame): here rendering,
feature extraction and training run online on-device, and inference reuses the
same synthetic pipeline to produce a held-out RGB-D frame that is pushed
through the *inference* path (depth -> cloud -> SHOT -> ensemble vote) and
scored against the ground-truth pose.

    python examples/custom_training.py --category can --steps 600

With --quick it runs a reduced-size smoke (used by tests/test_e2e.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from cppf2_tpu.config import CATEGORIES, PipelineConfig, TrainConfig
from cppf2_tpu.core.geometry import fibonacci_sphere
from cppf2_tpu.data.synthetic import SyntheticFrameGenerator
from cppf2_tpu.eval.pose_errors import pose_error_degree_cm
from cppf2_tpu.infer.frontend import preprocess_frame
from cppf2_tpu.infer.pipeline import estimate_pose_branch
from cppf2_tpu.models import ShotBranch
from cppf2_tpu.train import create_train_state
from cppf2_tpu.train.loop import make_train_step


def run(
    category="can",
    steps=600,
    n_points=1024,
    tuples_per_step=4096,
    num_pairs=8192,
    pool_frames=24,
    render_hw=(240, 320),
    seed=0,
    progress=print,
):
    cat = CATEGORIES[category]
    # default steps_per_epoch=200 keeps the reference's StepLR cadence
    # (decay x0.5 every 5000 steps, train_shot.py:124-130)
    cfg = TrainConfig(
        tuples_per_step=tuples_per_step, n_points=n_points, seed=seed,
    )
    gen = SyntheticFrameGenerator(
        cat, n_max=n_points, height=render_hw[0], width=render_hw[1],
        shot_k=32, seed=seed,
    )
    progress(f"[e2e] generating {pool_frames} training frames...")
    t0 = time.time()
    pool = [gen.next_frame() for _ in range(pool_frames)]
    progress(f"[e2e] rendered in {time.time() - t0:.1f}s")

    model = ShotBranch(tuple_size=cat.tuple_size)
    f0 = pool[0]
    i0 = jnp.zeros((8, cat.tuple_size), jnp.int32)
    state = create_train_state(
        model, (f0.pc, f0.shot, f0.normal, i0), cfg, jax.random.key(seed)
    )
    step = make_train_step(model, cfg, branch="shot")

    def to_batch(f):
        return {
            "pc": f.pc[None], "pc_canon": f.pc_canon[None],
            "shot": f.shot[None], "normal": f.normal[None],
            "bound": f.bound[None], "count": jnp.int32(f.count)[None],
        }

    rng = np.random.default_rng(seed)
    t0 = time.time()
    first = last = None
    for i in range(steps):
        f = pool[int(rng.integers(0, pool_frames))]
        state, metrics = step(state, to_batch(f), jax.random.key(i))
        if i == 0:
            first = float(metrics["total"])
        if i % max(1, steps // 10) == 0:
            progress(f"[e2e] step {i}: loss={float(metrics['total']):.3f}")
    last = float(metrics["total"])
    progress(
        f"[e2e] trained {steps} steps in {time.time() - t0:.1f}s: "
        f"loss {first:.3f} -> {last:.3f}"
    )

    # --- held-out frame through the *inference* path
    gen_test = SyntheticFrameGenerator(
        cat, n_max=n_points, height=render_hw[0], width=render_hw[1],
        shot_k=32, seed=seed + 1000,
    )
    test = gen_test.next_frame()
    fi = preprocess_frame(
        test.depth, test.depth > 0, gen_test.intrinsics, jax.random.key(7),
        res=cat.res, n_max=n_points, shot_k=32,
    )
    pipe = PipelineConfig(
        n_points=n_points, num_pairs=num_pairs, opt_steps=100,
    )
    sphere = jnp.asarray(fibonacci_sphere(pipe.sphere_samples))
    u = jax.random.uniform(jax.random.key(8), (pipe.num_pairs, cat.tuple_size))
    tuple_idx = jnp.floor(u * fi.count).astype(jnp.int32)

    shot_j, normal_j = fi.shot, fi.normal

    def shot_apply(params, points, ti):
        return model.apply(params, points, shot_j, normal_j, ti)

    est = estimate_pose_branch(
        shot_apply, state.params, fi.pc, fi.valid, fi.count, tuple_idx,
        jax.random.key(9), cat, pipe, sphere, run_opt=True,
    )

    rt_est = np.eye(4)
    rt_est[:3, :3] = np.asarray(est.rotation)
    rt_est[:3, 3] = np.asarray(est.translation)
    rt_gt = np.eye(4)
    rt_gt[:3, :3] = np.asarray(test.rotation)
    rt_gt[:3, 3] = np.asarray(test.translation)
    err = pose_error_degree_cm(rt_est, rt_gt, category)
    # compare the predicted anisotropic bound against the gt bound vector
    scale_err = float(np.abs(np.asarray(est.scale) - np.asarray(test.bound)).max())
    progress(
        f"[e2e] held-out pose error: {err[0]:.1f} deg, {err[1]:.2f} cm; "
        f"scale err {scale_err * 100:.1f} cm; loss first/last {first:.2f}/{last:.2f}"
    )
    return {
        "rot_err_deg": float(err[0]),
        "trans_err_cm": float(err[1]),
        "scale_err_cm": float(scale_err * 100),
        "loss_first": first,
        "loss_last": last,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--category", default="can")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.quick:
        run(args.category, steps=150, n_points=512, tuples_per_step=2048,
            num_pairs=4096, pool_frames=8)
    else:
        run(args.category, steps=args.steps)

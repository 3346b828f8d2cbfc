"""Point-budget sensitivity study (VERDICT r1 weak #5).

The reference caps eval clouds at 50k points after 2 mm voxel downsampling
(eval.py:196-198); this framework uses a fixed `n_points` budget with uniform
random overflow dropping (core/downsample.py). A close-range instance easily
occupies more than 8192 voxels — this script measures what that overflow
actually costs: per-frame occupied-voxel counts and pose error at several
budgets, on close-range (z in 0.6-0.9 m) frames of one category, using the
pretrained in-repo checkpoint.

    python scripts/budget_study.py --category can --frames 15
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from cppf2_tpu.config import CATEGORIES, PipelineConfig
from cppf2_tpu.core.geometry import fibonacci_sphere
from cppf2_tpu.data.synthetic import SyntheticFrameGenerator
from cppf2_tpu.eval.pose_errors import fetch_rt_pair, pose_error_degree_cm
from cppf2_tpu.infer.frontend import preprocess_frame
from cppf2_tpu.infer.pipeline import estimate_pose_branch
from cppf2_tpu.models import ShotBranch
from cppf2_tpu.train.checkpoints import load_params_msgpack


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--category", default="can")
    ap.add_argument("--frames", type=int, default=15)
    ap.add_argument("--budgets", type=int, nargs="+",
                    default=[4096, 8192, 16384])
    ap.add_argument("--num-pairs", type=int, default=20000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="benchmarks/budget_study.json")
    args = ap.parse_args()

    cat = CATEGORIES[args.category]
    model = ShotBranch(tuple_size=cat.tuple_size)
    packed = os.path.join("ckpts", "shot", args.category, "params.msgpack")
    i0 = jnp.zeros((8, cat.tuple_size), jnp.int32)
    pc0 = jnp.zeros((16, 3))
    template = model.init(
        jax.random.key(0), pc0, jnp.zeros((16, 352)), jnp.zeros((16, 3)), i0
    )
    params = load_params_msgpack(packed, template)
    print(f"loaded {packed}")

    # close-range frames: z in (0.6, 0.9) maximizes occupied 2 mm voxels
    gen = SyntheticFrameGenerator(
        cat, n_max=max(args.budgets), shot_k=48, seed=args.seed + 77,
        z_range=(0.6, 0.9),
    )
    frames = [gen.next_frame() for _ in range(args.frames)]
    print(f"rendered {len(frames)} close-range frames")

    # raw occupied-voxel counts (uncapped): downsample with a huge budget
    from cppf2_tpu.core.downsample import voxel_downsample
    from cppf2_tpu.core.geometry import backproject_masked

    @jax.jit
    def occupancy(depth):
        pts, _, valid = backproject_masked(depth, gen.intrinsics, depth > 0)
        ds = voxel_downsample(pts, valid, cat.res, 65536, jax.random.key(0))
        return ds.count

    occ = np.asarray([int(occupancy(f.depth)) for f in frames])
    print(f"occupied 2mm voxels: median {int(np.median(occ))}, "
          f"max {occ.max()}, min {occ.min()}")
    report_occ = occ

    report = {
        "category": args.category,
        "frames": args.frames,
        "median_occupied_voxels": int(np.median(report_occ)),
        "max_occupied_voxels": int(report_occ.max()),
        "budgets": {},
    }
    for budget in args.budgets:
        pipe = PipelineConfig(n_points=budget, num_pairs=args.num_pairs)
        sphere = jnp.asarray(fibonacci_sphere(pipe.sphere_samples))

        @jax.jit
        def pose_frame(depth, key, budget=budget, pipe=pipe, sphere=sphere):
            fi = preprocess_frame(depth, depth > 0, gen.intrinsics, key,
                                  res=cat.res, n_max=budget, shot_k=48)
            k1, k2 = jax.random.split(jax.random.fold_in(key, 1))
            u = jax.random.uniform(k1, (pipe.num_pairs, cat.tuple_size))
            ti = jnp.floor(u * fi.count).astype(jnp.int32)

            def apply(p, points, tidx):
                return model.apply(p, points, fi.shot, fi.normal, tidx)

            return estimate_pose_branch(
                apply, params, fi.pc, fi.valid, fi.count, ti, k2,
                cat, pipe, sphere, run_opt=True,
            )

        errs = []
        t0 = time.time()
        for i, f in enumerate(frames):
            est = pose_frame(f.depth, jax.random.key(1000 + i))
            rt, _, gt, _ = fetch_rt_pair(est, f)
            errs.append(pose_error_degree_cm(rt, gt, args.category))
        errs = np.asarray(errs)
        kept = np.minimum(report_occ, budget) / np.maximum(report_occ, 1)
        row = {
            "median_deg": float(np.median(errs[:, 0])),
            "median_cm": float(np.median(errs[:, 1])),
            "deg5cm5": float(np.mean((errs[:, 0] < 5) & (errs[:, 1] < 5))),
            "mean_kept_fraction": float(kept.mean()),
            "sec": round(time.time() - t0, 1),
        }
        report["budgets"][str(budget)] = row
        print(f"budget {budget}: {row}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

"""Validate bf16 inference against f32 on a trained checkpoint.

Loads a round-2 msgpack checkpoint into f32 and bf16 ShotBranch models and
poses the same held-out frames through the full inference path with both;
reports per-frame (deg, cm) errors side by side. Gate for making bf16 the
production inference dtype.

    python scripts/dtype_check.py --category can --frames 15
"""

from __future__ import annotations

import argparse
import os
import sys

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
    ap.add_argument("--ckpts", default="ckpts_r2")
    ap.add_argument("--num-pairs", type=int, default=50000)
    args = ap.parse_args()

    cat = CATEGORIES[args.category]
    pipe = PipelineConfig(num_pairs=args.num_pairs)
    n = pipe.n_points
    sphere = jnp.asarray(fibonacci_sphere(pipe.sphere_samples))
    packed = os.path.join(args.ckpts, "shot", args.category, "params.msgpack")

    gen = SyntheticFrameGenerator(cat, n_max=n, shot_k=48, seed=123)
    frames = [gen.next_frame() for _ in range(args.frames)]

    results = {}
    for dt in ("float32", "bfloat16"):
        model = ShotBranch(tuple_size=cat.tuple_size, dtype=dt)
        i0 = jnp.zeros((8, cat.tuple_size), jnp.int32)
        tmpl = model.init(jax.random.key(0), jnp.zeros((16, 3)),
                          jnp.zeros((16, 352)), jnp.zeros((16, 3)), i0)
        params = load_params_msgpack(packed, tmpl)

        @jax.jit
        def pose(depth, key, model=model, params=params):
            fi = preprocess_frame(depth, depth > 0, gen.intrinsics, key,
                                  res=cat.res, n_max=n, shot_k=48)
            k1, k2 = jax.random.split(jax.random.fold_in(key, 1))
            u = jax.random.uniform(k1, (pipe.num_pairs, cat.tuple_size))
            ti = jnp.floor(u * fi.count).astype(jnp.int32)

            def apply(p, pts, t):
                return model.apply(p, pts, fi.shot, fi.normal, t)

            return estimate_pose_branch(apply, params, fi.pc, fi.valid,
                                        fi.count, ti, k2, cat, pipe, sphere,
                                        run_opt=True)

        errs = []
        for i, f in enumerate(frames):
            est = pose(f.depth, jax.random.key(500 + i))
            rt, _, gt, _ = fetch_rt_pair(est, f)
            errs.append(pose_error_degree_cm(rt, gt, args.category))
        errs = np.asarray(errs)
        results[dt] = errs
        print(f"{dt}: median {np.median(errs[:,0]):.2f} deg / "
              f"{np.median(errs[:,1]):.2f} cm, "
              f"5d5cm {np.mean((errs[:,0]<5)&(errs[:,1]<5)):.2f}")

    d = results["bfloat16"][:, 0] - results["float32"][:, 0]
    print(f"per-frame deg delta (bf16 - f32): median {np.median(d):+.2f}, "
          f"max {np.abs(d).max():.2f}")


if __name__ == "__main__":
    main()

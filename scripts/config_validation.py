"""Production-config validation table: category x {exact,approx-kNN} x {f32,bf16}.

Round-2 adopted two throughput shortcuts — the recall-0.9 `approx_min_k` kNN
(ops/neighbors.py) and bf16 branch-MLP inference — validated only on a can
checkpoint. This script re-validates both across ALL categories on fixed eval
seeds with the round-2 trained SHOT checkpoints: for each (category, config)
it poses the same held-out frames and reports median rotation/translation
error and the 5°5cm rate.

    python scripts/config_validation.py --frames 30 --out benchmarks/config_validation.json
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


def eval_config(cat_name, params_f32, frames, pipe, n_points, seed,
                exact_knn, dtype):
    cat = CATEGORIES[cat_name]
    gen = SyntheticFrameGenerator(cat, n_max=n_points, shot_k=48, seed=seed + 77)
    sphere = jnp.asarray(fibonacci_sphere(pipe.sphere_samples))
    model = ShotBranch(tuple_size=cat.tuple_size, dtype=dtype)

    # params as a jit ARGUMENT (not a closure): closure pytrees are inlined
    # as module constants, which defeats the compile cache across the
    # 6 categories x 4 configs this script sweeps (CLAUDE.md)
    @jax.jit
    def pose_frame(branch_params, depth, key):
        fi = preprocess_frame(depth, depth > 0, gen.intrinsics, key,
                              res=cat.res, n_max=n_points, shot_k=48,
                              exact_knn=exact_knn)
        k1, k2 = jax.random.split(jax.random.fold_in(key, 1))

        def shot_apply(p, points, tidx):
            return model.apply(p, points, fi.shot, fi.normal, tidx)

        u = jax.random.uniform(k1, (pipe.num_pairs, cat.tuple_size))
        ti = jnp.floor(u * fi.count).astype(jnp.int32)
        return estimate_pose_branch(
            shot_apply, branch_params, fi.pc, fi.valid, fi.count, ti, k2,
            cat, pipe, sphere, run_opt=True,
        )

    errs = []
    for i, f in enumerate(frames):
        est = pose_frame(params_f32, f.depth, jax.random.key(1000 + i))
        rt, _, gt, _ = fetch_rt_pair(est, f)
        errs.append(pose_error_degree_cm(rt, gt, cat_name))
    errs = np.asarray(errs)
    return {
        "median_deg": float(np.median(errs[:, 0])),
        "median_cm": float(np.median(errs[:, 1])),
        "deg5cm5": float(np.mean((errs[:, 0] < 5) & (errs[:, 1] < 5))),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--categories", nargs="+", default=list(CATEGORIES))
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--n-points", type=int, default=4096)
    ap.add_argument("--num-pairs", type=int, default=20000)
    ap.add_argument("--ckpts", default="ckpts_r2")
    ap.add_argument("--out", default="benchmarks/config_validation.json")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    pipe = PipelineConfig(n_points=args.n_points, num_pairs=args.num_pairs)
    table = {}
    for cat_name in args.categories:
        cat = CATEGORIES[cat_name]
        ref_model = ShotBranch(tuple_size=cat.tuple_size)
        i0 = jnp.zeros((8, cat.tuple_size), jnp.int32)
        ref = ref_model.init(jax.random.key(0), jnp.zeros((16, 3)),
                             jnp.zeros((16, 352)), jnp.zeros((16, 3)), i0)
        params = load_params_msgpack(
            os.path.join(args.ckpts, "shot", cat_name, "params.msgpack"), ref)
        # fixed frame set shared by all four configs
        gen = SyntheticFrameGenerator(cat, n_max=args.n_points, shot_k=48,
                                      seed=args.seed + 77)
        frames = [gen.next_frame() for _ in range(args.frames)]
        table[cat_name] = {}
        for exact in (False, True):
            for dtype in ("bfloat16", "float32"):
                t0 = time.time()
                r = eval_config(cat_name, params, frames, pipe, args.n_points,
                                args.seed, exact, dtype)
                key = f"{'exact' if exact else 'approx'}_{dtype}"
                table[cat_name][key] = r
                print(f"[{cat_name}] {key}: {json.dumps(r)} "
                      f"({time.time() - t0:.0f}s)")
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(table, f, indent=2)
    print(json.dumps(table, indent=2))


if __name__ == "__main__":
    main()

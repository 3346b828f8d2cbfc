"""Headline benchmark: REAL275-path end-to-end pose throughput on one chip.

Times the full per-instance eval path the reference runs in eval.py:185-372
(minus the DINO ViT forward, whose weights cannot exist in this sandbox):

    depth + mask -> dense backprojection -> voxel downsample -> normals +
    SHOT-352 -> both branch tuple MLPs -> bin sampling -> center vote ->
    backvote filter -> rotation votes -> 100-step alignment opt -> ensemble
    selection

as ONE jitted graph at eval-scale shapes (480x640 depth, 8192-point budget,
50k tuples, 1-deg sphere accumulator — eval.py:54-64 defaults). A second,
graph-only timing (pre-computed features, the round-1 headline) is reported
as `pose_graph_fps` in the same JSON line.

Prints ONE JSON line; vs_baseline is e2e fps / 30 (the >30 fps/chip north
star from BASELINE.md — the reference publishes no throughput numbers).
Timing is chained-dependency with a single final host sync, the only honest
methodology through the axon relay (see CLAUDE.md).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

# REAL275 camera intrinsics (reference: eval.py:175-177)
REAL275_K = np.array(
    [[591.0125, 0.0, 322.525], [0.0, 590.16775, 244.11084], [0.0, 0.0, 1.0]],
    np.float32,
)


def make_frame(rng, h=480, w=640, radius=0.11, center=(0.05, -0.02, 0.82)):
    """Synthetic sphere-cap depth + mask at REAL275 resolution: a ~20 cm object
    at 0.8 m, ~25k mask pixels -> overflows the 8192-voxel budget like a real
    close-range instance does."""
    cx, cy, cz = center
    fx, fy = REAL275_K[0, 0], REAL275_K[1, 1]
    u0, v0 = REAL275_K[0, 2], REAL275_K[1, 2]
    # reference backprojection flips x/y sign; project with the same convention
    uu = u0 - fx * cx / cz
    vv = v0 - fy * cy / cz
    ys, xs = np.mgrid[0:h, 0:w]
    rpix = radius * fx / cz
    d2 = (xs - uu) ** 2 + (ys - vv) ** 2
    mask = d2 < rpix**2
    bump = np.sqrt(np.maximum(radius**2 - d2 * (cz / fx) ** 2, 0.0))
    depth = np.where(mask, cz - bump, 0.0).astype(np.float32)
    depth += np.where(mask, rng.normal(0, 3e-4, (h, w)), 0.0).astype(np.float32)
    return depth, mask


def chained_fps(run_once, k=32):
    """Chained-dependency timing: each iteration's input depends on the previous
    output, one host sync at the end (defeats relay-level dedup/async lies).
    Warm with 4 chained calls + a sync first — the relay stalls on cold
    streams — then amortize over k=32 calls."""
    import jax

    carry = 0.0
    for i in range(4):
        carry = run_once(jax.random.key(100 + i), carry)
    float(carry)
    t0 = time.time()
    for i in range(k):
        carry = run_once(jax.random.key(i), carry)
    float(carry)  # single final sync
    dt = (time.time() - t0) / k
    return 1.0 / dt


def main():
    import jax
    import jax.numpy as jnp

    from cppf2_tpu.config import CATEGORIES, PipelineConfig
    from cppf2_tpu.infer import estimate_pose_ensemble
    from cppf2_tpu.infer.frontend import preprocess_frame
    from cppf2_tpu.models import DinoBranch, ShotBranch

    rng = np.random.default_rng(0)
    cat = CATEGORIES["mug"]
    # production inference config: bf16 branch MLPs (validated: +0.06 deg
    # median vs f32 on a trained checkpoint — scripts/dtype_check.py) and
    # the k=48 neighbor budget every accuracy result uses. BENCH_* env vars
    # override for experiments.
    dt = os.environ.get("BENCH_DTYPE", "bfloat16")
    k_nb = int(os.environ.get("BENCH_K", "0")) or None
    pipe = PipelineConfig(**({"neighbor_k": k_nb} if k_nb else {}))
    n = pipe.n_points

    depth_np, mask_np = make_frame(rng)
    depth0 = jnp.asarray(depth_np)
    mask_j = jnp.asarray(mask_np)
    k_j = jnp.asarray(REAL275_K)
    desc_j = jnp.asarray(rng.normal(size=(n, 1024)).astype(np.float32))

    shot_m, dino_m = ShotBranch(dtype=dt), DinoBranch(dtype=dt)
    i0 = jnp.zeros((8, 5), jnp.int32)
    pc0 = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    shot0 = jnp.asarray(rng.normal(size=(n, 352)).astype(np.float32))
    nrm0 = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    sp = shot_m.init(jax.random.key(0), pc0, shot0, nrm0, i0)
    dp = dino_m.init(jax.random.key(1), pc0, desc_j, i0)

    def dino_apply(params, points, ti):
        return dino_m.apply(params, points, desc_j, ti)

    # ---- end-to-end: depth+mask -> cloud+SHOT -> ensemble pose (eval.py:185-372)
    @jax.jit
    def e2e(depth, key):
        k_pre, k_pose = jax.random.split(key)
        fi = preprocess_frame(
            depth, mask_j, k_j, k_pre,
            res=cat.res, n_max=n, shot_k=pipe.neighbor_k, crop=256,
        )

        def shot_apply(params, points, ti):
            return shot_m.apply(params, points, fi.shot, fi.normal, ti)

        return estimate_pose_ensemble(
            dino_apply, dp, shot_apply, sp,
            fi.pc, fi.valid, fi.count, k_pose, cat, pipe, run_opt=True,
        )

    def e2e_once(key, carry):
        est = e2e(depth0 + carry * 1e-12, key)
        return est.translation[0]

    # ---- pose graph only (round-1 headline; features precomputed)
    @jax.jit
    def graph(pc, key):
        def shot_apply(params, points, ti):
            return shot_m.apply(params, points, shot0, nrm0, ti)

        return estimate_pose_ensemble(
            dino_apply, dp, shot_apply, sp,
            pc, jnp.ones(n, bool), jnp.int32(n), key, cat, pipe, run_opt=True,
        )

    def graph_once(key, carry):
        est = graph(pc0 + carry * 1e-12, key)
        return est.translation[0]

    # compile both
    float(e2e_once(jax.random.key(0), 0.0))
    float(graph_once(jax.random.key(0), 0.0))

    e2e_fps = chained_fps(e2e_once)
    graph_fps = chained_fps(graph_once)

    print(
        json.dumps(
            {
                "metric": "real275_e2e_fps_per_chip",
                "value": round(e2e_fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(e2e_fps / 30.0, 3),
                "pose_graph_fps": round(graph_fps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

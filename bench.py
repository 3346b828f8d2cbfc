"""Headline benchmark: REAL275-path pose-inference throughput on one chip.

Times the full single-frame ensemble graph (tuple MLPs for both branches ->
bin sampling -> center vote -> backvote -> rotation votes -> alignment opt ->
branch selection) at eval-scale shapes (8192 points, 50k tuples, 180 rots,
100 opt steps — eval.py:54-64 defaults), the path behind the reference's
eval.py. Prints ONE JSON line; vs_baseline is fps / 30 (the >30 fps/chip
north star from BASELINE.md — the reference publishes no numbers).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cppf2_tpu.config import CATEGORIES, PipelineConfig
    from cppf2_tpu.infer import estimate_pose_ensemble
    from cppf2_tpu.models import DinoBranch, ShotBranch

    rng = np.random.default_rng(0)
    cat = CATEGORIES["mug"]
    pipe = PipelineConfig()
    n = pipe.n_points

    bound = np.array([0.12, 0.2, 0.12], np.float32)
    pc_canon = (rng.uniform(-0.5, 0.5, (n, 3)) * bound / bound.max()).astype(np.float32)
    from scipy.stats import special_ortho_group

    rot = special_ortho_group.rvs(3, random_state=rng).astype(np.float32)
    trans = np.array([0.15, -0.1, 0.8], np.float32)
    pc = ((pc_canon * bound.max()) @ rot.T + trans).astype(np.float32)
    shot = rng.normal(size=(n, 352)).astype(np.float32)
    normal = rng.normal(size=(n, 3)).astype(np.float32)
    desc = rng.normal(size=(n, 1024)).astype(np.float32)

    shot_m, dino_m = ShotBranch(), DinoBranch()
    i0 = jnp.zeros((8, 5), jnp.int32)
    sp = shot_m.init(jax.random.key(0), jnp.asarray(pc), jnp.asarray(shot), jnp.asarray(normal), i0)
    dp = dino_m.init(jax.random.key(1), jnp.asarray(pc), jnp.asarray(desc), i0)
    shot_j, normal_j, desc_j = jnp.asarray(shot), jnp.asarray(normal), jnp.asarray(desc)

    def dino_apply(params, points, ti):
        return dino_m.apply(params, points, desc_j, ti)

    def shot_apply(params, points, ti):
        return shot_m.apply(params, points, shot_j, normal_j, ti)

    @jax.jit
    def frame(pc, key):
        return estimate_pose_ensemble(
            dino_apply, dp, shot_apply, sp,
            pc, jnp.ones(n, bool), jnp.int32(n), key, cat, pipe, run_opt=True,
        )

    # compile + warmup (chained to defeat any relay-level dedup)
    x = jnp.asarray(pc)
    est = frame(x, jax.random.key(0))
    np.asarray(est.translation)
    for i in range(4):
        est = frame(x, jax.random.key(i))
        x = x + est.translation[None, :] * 1e-12
    np.asarray(est.translation)

    k = 32
    t0 = time.time()
    x = jnp.asarray(pc)
    for i in range(k):
        est = frame(x, jax.random.key(i))
        x = x + est.translation[None, :] * 1e-12
    np.asarray(est.translation)
    dt = (time.time() - t0) / k
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "real275_pose_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

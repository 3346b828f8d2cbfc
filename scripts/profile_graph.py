"""Sub-stage profile of the pose graph (companion to profile_e2e.py).

Times the ensemble graph under ablations (no alignment, fewer opt steps,
single branch) and the individual vote kernels at eval shapes, to locate
where the 27 ms goes.

    python scripts/profile_graph.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from cppf2_tpu.config import CATEGORIES, PipelineConfig
    from cppf2_tpu.core.geometry import fibonacci_sphere
    from cppf2_tpu.core.pairs import pair_targets
    from cppf2_tpu.infer import estimate_pose_branch, estimate_pose_ensemble
    from cppf2_tpu.models import DinoBranch, ShotBranch
    from cppf2_tpu.ops.voting import backvote_filter, sphere_vote_cone, vote_center
    from cppf2_tpu.utils.profiling import chained_timer

    rng = np.random.default_rng(0)
    cat = CATEGORIES["mug"]
    pipe = PipelineConfig()
    n, p = pipe.n_points, pipe.num_pairs

    pc = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.05)
    desc = jnp.asarray(rng.normal(size=(n, 1024)).astype(np.float32))
    shotf = jnp.asarray(rng.normal(size=(n, 352)).astype(np.float32))
    nrmf = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    valid = jnp.ones(n, bool)
    count = jnp.int32(n)
    ti = jnp.asarray(rng.integers(0, n, size=(p, 5)).astype(np.int32))
    sphere = jnp.asarray(fibonacci_sphere(pipe.sphere_samples))

    shot_m, dino_m = ShotBranch(), DinoBranch()
    i0 = jnp.zeros((8, 5), jnp.int32)
    sp = shot_m.init(jax.random.key(0), pc, shotf, nrmf, i0)
    dp = dino_m.init(jax.random.key(1), pc, desc, i0)

    def dino_apply(params, points, t):
        return dino_m.apply(params, points, desc, t)

    def shot_apply(params, points, t):
        return shot_m.apply(params, points, shotf, nrmf, t)

    def chain(args, out):
        bump = jax.tree.leaves(out)[0].ravel()[0] * 1e-12
        return (args[0] + bump.astype(args[0].dtype),) + tuple(args[1:])

    def ens(pipe_v, run_opt=True, label=None):
        @jax.jit
        def fn(points, key):
            return estimate_pose_ensemble(
                dino_apply, dp, shot_apply, sp, points, valid, count, key,
                cat, pipe_v, run_opt=run_opt,
            ).translation

        return chained_timer(fn, chain, (pc, jax.random.key(0)))

    # vote-kernel inputs (representative): targets from random canonical pairs
    pred_pairs = jnp.asarray(rng.uniform(-0.5, 0.5, (p, 2, 3)).astype(np.float32))
    t = pair_targets(
        pred_pairs[:, 0], pred_pairs[:, 1],
        jnp.asarray([0.0, 1, 0]), jnp.asarray([1.0, 0, 0]), jnp.asarray([0.0, 0, 1]),
    )
    pv = jnp.ones(p, bool)
    kidx = jnp.asarray(rng.integers(0, p, size=(pipe.num_kept_pairs,)).astype(np.int32))
    kw = jnp.ones(pipe.num_kept_pairs)

    @jax.jit
    def f_mlps(points, key):
        a = shot_apply(sp, points, ti)
        b = dino_apply(dp, points, ti)
        return a.logits.sum() + b.logits.sum()

    @jax.jit
    def f_vote(points, key):
        return vote_center(points, valid, t.tr, ti[:, :2], pv, cat.res).center

    @jax.jit
    def f_backvote(points, key):
        bv = backvote_filter(points, t.tr, ti[:, :2], pv,
                             jnp.zeros(3), pipe.num_kept_pairs, pipe.imp_wt_margin)
        return bv.pair_weight.sum()

    @jax.jit
    def f_sphere(points, key):
        top, cnt = sphere_vote_cone(points, t.up_angle[kidx], ti[kidx, :2], kw,
                                    sphere, pipe.angle_tol_deg, topk=1)
        return top[0]

    rows = [
        ("branch MLPs only (50k tuples, both)", chained_timer(f_mlps, chain, (pc, jax.random.key(0)))),
        ("vote_center (50k pairs)", chained_timer(f_vote, chain, (pc, jax.random.key(0)))),
        ("backvote_filter (50k)", chained_timer(f_backvote, chain, (pc, jax.random.key(0)))),
        ("sphere_vote_cone (5k kept)", chained_timer(f_sphere, chain, (pc, jax.random.key(0)))),
        ("ensemble run_opt=False", ens(pipe, run_opt=False)),
        ("ensemble opt_steps=25", ens(dataclasses.replace(pipe, opt_steps=25))),
        ("ensemble full (opt 100)", ens(pipe)),
    ]
    for name, ms in rows:
        print(f"{name:42s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()

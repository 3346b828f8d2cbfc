"""Incremental profile of preprocess_frame: one program per prefix.

Times cumulative prefixes of the preprocess pipeline (each as ONE jitted
program, chained-dependency methodology), so in-context stage costs come from
*differences* — isolated per-stage timings are distorted by per-dispatch
overhead and different fusion choices.

    python scripts/profile_pre.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import REAL275_K, make_frame
    from cppf2_tpu.config import CATEGORIES, PipelineConfig
    from cppf2_tpu.core.downsample import voxel_downsample
    from cppf2_tpu.core.geometry import backproject_masked
    from cppf2_tpu.ops.neighbors import knn_radius_neighbors
    from cppf2_tpu.ops.normals import estimate_normals
    from cppf2_tpu.ops.shot import compute_shot
    from cppf2_tpu.utils.profiling import chained_timer

    rng = np.random.default_rng(0)
    cat = CATEGORIES["mug"]
    pipe = PipelineConfig()
    n, k = pipe.n_points, int(os.environ.get("BENCH_K", "0")) or pipe.neighbor_k
    radius = cat.res * 10
    c = 320

    depth_np, mask_np = make_frame(rng)
    depth = jnp.asarray(depth_np)
    mask = jnp.asarray(mask_np)
    kmat = jnp.asarray(REAL275_K)

    def cropped(d):
        h, w = d.shape
        mf = mask.astype(jnp.float32)
        total = jnp.maximum(jnp.sum(mf), 1.0)
        cy = jnp.sum(jnp.arange(h, dtype=jnp.float32) * jnp.sum(mf, 1)) / total
        cx = jnp.sum(jnp.arange(w, dtype=jnp.float32) * jnp.sum(mf, 0)) / total
        y0 = jnp.clip(cy.astype(jnp.int32) - c // 2, 0, h - c)
        x0 = jnp.clip(cx.astype(jnp.int32) - c // 2, 0, w - c)
        dc = jax.lax.dynamic_slice(d, (y0, x0), (c, c))
        mc = jax.lax.dynamic_slice(mask, (y0, x0), (c, c))
        kk = kmat.at[:2, 2].add(-jnp.stack([x0, y0]).astype(kmat.dtype))
        return dc, mc, kk

    def stage_fns():
        @jax.jit
        def p0(d):  # crop + backproject
            dc, mc, kk = cropped(d)
            pts, pix, valid = backproject_masked(dc, kk, mc)
            return pts.sum()

        @jax.jit
        def p1(d):  # + voxel downsample
            dc, mc, kk = cropped(d)
            pts, pix, valid = backproject_masked(dc, kk, mc)
            ds = voxel_downsample(pts, valid, cat.res, n, jax.random.key(0))
            return ds.indices.sum()

        @jax.jit
        def p2(d):  # + gather cloud
            dc, mc, kk = cropped(d)
            pts, pix, valid = backproject_masked(dc, kk, mc)
            ds = voxel_downsample(pts, valid, cat.res, n, jax.random.key(0))
            pc = jnp.where(ds.valid[:, None], pts[ds.indices], 0.0)
            return pc.sum()

        @jax.jit
        def p3(d):  # + kNN
            dc, mc, kk = cropped(d)
            pts, pix, valid = backproject_masked(dc, kk, mc)
            ds = voxel_downsample(pts, valid, cat.res, n, jax.random.key(0))
            pc = jnp.where(ds.valid[:, None], pts[ds.indices], 0.0)
            nbrs = knn_radius_neighbors(pc, ds.valid, radius, k)
            return nbrs.dist.sum()

        @jax.jit
        def p4(d):  # + normals
            dc, mc, kk = cropped(d)
            pts, pix, valid = backproject_masked(dc, kk, mc)
            ds = voxel_downsample(pts, valid, cat.res, n, jax.random.key(0))
            pc = jnp.where(ds.valid[:, None], pts[ds.indices], 0.0)
            nbrs = knn_radius_neighbors(pc, ds.valid, radius, k)
            nrm = estimate_normals(pc, nbrs)
            return nrm.sum()

        @jax.jit
        def p5(d):  # + SHOT (== full preprocess)
            dc, mc, kk = cropped(d)
            pts, pix, valid = backproject_masked(dc, kk, mc)
            ds = voxel_downsample(pts, valid, cat.res, n, jax.random.key(0))
            pc = jnp.where(ds.valid[:, None], pts[ds.indices], 0.0)
            nbrs = knn_radius_neighbors(pc, ds.valid, radius, k)
            nrm = estimate_normals(pc, nbrs)
            desc = compute_shot(pc, nrm, nbrs, radius)
            return desc.sum()

        return [
            ("crop+backproject", p0),
            ("+voxel_downsample", p1),
            ("+cloud gather", p2),
            (f"+kNN (k={k})", p3),
            ("+normals", p4),
            ("+SHOT", p5),
        ]

    def chain(args, out):
        leaf = jax.tree.leaves(out)[0]
        return (args[0] + (leaf.ravel()[0] * 1e-12).astype(args[0].dtype),)

    prev = 0.0
    for name, fn in stage_fns():
        ms = chained_timer(fn, chain, (depth,))
        print(f"{name:24s} {ms:8.2f} ms   (+{ms - prev:6.2f})")
        prev = ms


if __name__ == "__main__":
    main()

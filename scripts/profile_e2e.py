"""Stage-level profile of the e2e eval path on the chip.

Breaks bench.py's end-to-end graph into stages and times each with the
chained-dependency methodology (utils/profiling.py::chained_timer):

    dense pass (backproject + voxel downsample)   [crop and full-frame]
    kNN radius neighbors
    normals
    SHOT binning
    pose graph (two-branch ensemble)
    full e2e

Use this to decide where the next kernel optimization goes.

    python scripts/profile_e2e.py
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
    from cppf2_tpu.infer import estimate_pose_ensemble
    from cppf2_tpu.infer.frontend import preprocess_frame
    from cppf2_tpu.models import DinoBranch, ShotBranch
    from cppf2_tpu.ops.neighbors import knn_radius_neighbors
    from cppf2_tpu.ops.normals import estimate_normals
    from cppf2_tpu.ops.shot import compute_shot
    from cppf2_tpu.utils.profiling import chained_timer

    rng = np.random.default_rng(0)
    cat = CATEGORIES["mug"]
    pipe = PipelineConfig()
    n, k = pipe.n_points, pipe.neighbor_k
    radius = cat.res * 10

    depth_np, mask_np = make_frame(rng)
    depth = jnp.asarray(depth_np)
    mask = jnp.asarray(mask_np)
    kmat = jnp.asarray(REAL275_K)

    def chain_d(args, out):
        leaf = jax.tree.leaves(out)[0]
        bump = (leaf.ravel()[0] * 1e-12).astype(depth.dtype)
        return (args[0] + bump,) + args[1:]

    # --- dense pass: backproject + downsample (full frame and crop) ---------
    @jax.jit
    def dense_full(d):
        pts, pix, valid = backproject_masked(d, kmat, mask)
        return voxel_downsample(pts, valid, cat.res, n, jax.random.key(0)).count

    @jax.jit
    def dense_and_shot(d):
        fi = preprocess_frame(d, mask, kmat, jax.random.key(0),
                              res=cat.res, n_max=n, shot_k=k, crop=320)
        return fi.shot.sum()

    # --- isolated feature stages on a fixed cloud ---------------------------
    fi0 = preprocess_frame(depth, mask, kmat, jax.random.key(0),
                           res=cat.res, n_max=n, shot_k=k, crop=320)
    pc0, valid0 = fi0.pc, fi0.valid
    nbrs0 = knn_radius_neighbors(pc0, valid0, radius, k)
    normals0 = estimate_normals(pc0, nbrs0)

    knn = jax.jit(lambda p: knn_radius_neighbors(p, valid0, radius, k).dist.sum())
    nrm = jax.jit(lambda p: estimate_normals(p, nbrs0).sum())
    shot_only = jax.jit(lambda p: compute_shot(p, normals0, nbrs0, radius).sum())

    def chain_p(args, out):
        return (args[0] + jax.tree.leaves(out)[0].ravel()[0] * 1e-12,) + args[1:]

    # --- pose graph + e2e (bench.py's graphs) -------------------------------
    shot_m, dino_m = ShotBranch(), DinoBranch()
    i0 = jnp.zeros((8, 5), jnp.int32)
    desc0 = jnp.asarray(rng.normal(size=(n, 1024)).astype(np.float32))
    shotf0 = jnp.asarray(rng.normal(size=(n, 352)).astype(np.float32))
    nrmf0 = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    pcr = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    sp = shot_m.init(jax.random.key(0), pcr, shotf0, nrmf0, i0)
    dp = dino_m.init(jax.random.key(1), pcr, desc0, i0)

    def dino_apply(params, points, ti):
        return dino_m.apply(params, points, desc0, ti)

    @jax.jit
    def graph(pc, key):
        def shot_apply(params, points, ti):
            return shot_m.apply(params, points, shotf0, nrmf0, ti)

        est = estimate_pose_ensemble(
            dino_apply, dp, shot_apply, sp,
            pc, jnp.ones(n, bool), jnp.int32(n), key, cat, pipe, run_opt=True,
        )
        return est.translation

    @jax.jit
    def e2e(d, key):
        k_pre, k_pose = jax.random.split(key)
        fi = preprocess_frame(d, mask, kmat, k_pre,
                              res=cat.res, n_max=n, shot_k=k, crop=320)

        def shot_apply(params, points, ti):
            return shot_m.apply(params, points, fi.shot, fi.normal, ti)

        est = estimate_pose_ensemble(
            dino_apply, dp, shot_apply, sp,
            fi.pc, fi.valid, fi.count, k_pose, cat, pipe, run_opt=True,
        )
        return est.translation

    def chain_key(args, out):
        bump = jax.tree.leaves(out)[0].ravel()[0] * 1e-12
        return (args[0] + bump.astype(args[0].dtype), args[1])

    # --- visual-inclusive cumulative prefixes (bench.py's headline graph) ---
    # Stage attribution through the relay needs cumulative single-program
    # prefixes (isolated stages carry a ~4-5 ms dispatch floor; CLAUDE.md):
    # pre | pre+ViT descriptors | full ensemble. Params are jit ARGUMENTS
    # (a closed-over ViT param tree inlines ~600 MB of constants).
    import dataclasses as _dc

    from cppf2_tpu.models.dinov2 import (
        VIT_L14,
        DinoFeatureExtractor,
        bbox_crop_descriptors,
    )

    crop = 256
    stride = int(os.environ.get("BENCH_VIT_STRIDE", "8"))
    ext = DinoFeatureExtractor(
        cfg=_dc.replace(VIT_L14, attn_impl="pallas")
    )
    ext.init_random(hw=(crop, crop))
    vit_model, vit_params = ext.model, ext.params
    rgb0 = jnp.asarray(rng.uniform(0, 1, (480, 640, 3)).astype(np.float32))

    @jax.jit
    def pre_256(d, key):
        fi = preprocess_frame(d, mask, kmat, key,
                              res=cat.res, n_max=n, shot_k=k, crop=crop)
        return fi.shot.sum()

    @jax.jit
    def pre_desc(vp, d, rgb, key):
        fi = preprocess_frame(d, mask, kmat, key,
                              res=cat.res, n_max=n, shot_k=k, crop=crop)
        desc = bbox_crop_descriptors(
            vit_model, vp, rgb, mask, fi.pixel_yx, stride=stride,
        )
        return desc.sum() + fi.shot.sum()

    @jax.jit
    def e2e_visual(vp, d, rgb, key):
        k_pre, k_pose = jax.random.split(key)
        fi = preprocess_frame(d, mask, kmat, k_pre,
                              res=cat.res, n_max=n, shot_k=k, crop=crop)
        desc = bbox_crop_descriptors(
            vit_model, vp, rgb, mask, fi.pixel_yx, stride=stride,
        )

        def dino_apply_d(params, points, ti):
            return dino_m.apply(params, points, desc, ti)

        def shot_apply(params, points, ti):
            return shot_m.apply(params, points, fi.shot, fi.normal, ti)

        est = estimate_pose_ensemble(
            dino_apply_d, dp, shot_apply, sp,
            fi.pc, fi.valid, fi.count, k_pose, cat, pipe, run_opt=True,
        )
        return est.translation

    def chain_vkey(args, out):
        bump = jax.tree.leaves(out)[0].ravel()[0] * 1e-12
        return (args[0], args[1] + bump.astype(args[1].dtype)) + args[2:]

    rows = [
        ("dense full-frame (480x640)", chained_timer(dense_full, chain_d, (depth,))),
        ("preprocess crop=320 (dense+kNN+normals+SHOT)",
         chained_timer(dense_and_shot, chain_d, (depth,))),
        (f"kNN radius ({n}x{k})", chained_timer(knn, chain_p, (pc0,))),
        ("normals", chained_timer(nrm, chain_p, (pc0,))),
        ("SHOT binning", chained_timer(shot_only, chain_p, (pc0,))),
        ("pose graph (2-branch ensemble)",
         chained_timer(graph, chain_key, (pcr, jax.random.key(0)))),
        ("e2e (preprocess + ensemble)",
         chained_timer(e2e, chain_key, (depth, jax.random.key(0)))),
        ("[visual] preprocess crop=256",
         chained_timer(pre_256, chain_key, (depth, jax.random.key(0)))),
        (f"[visual] + ViT stride-{stride} descriptors",
         chained_timer(pre_desc, chain_vkey,
                       (vit_params, depth, rgb0, jax.random.key(0)))),
        ("[visual] full (pre + ViT + 2-branch ensemble)",
         chained_timer(e2e_visual, chain_vkey,
                       (vit_params, depth, rgb0, jax.random.key(0)))),
    ]
    for name, ms in rows:
        print(f"{name:48s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()

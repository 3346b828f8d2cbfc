"""Image-parallel REAL275 evaluation over a device mesh.

The reference evaluates strictly serially — one instance at a time through
CUDA extensions (eval.py:185-372). Inference here is a pure function of
(depth, mask, key), so evaluation scales over the third parallelism axis the
framework exposes (see parallel/mesh.py): instances are grouped by category,
batched, and the full depth -> preprocess -> ensemble-pose graph runs
vmapped with its batch axis sharded over the mesh (GSPMD inserts the
all-gathers; per-instance work is independent so none are needed beyond
layout). An 8-chip mesh poses 8 instances per dispatch at the single-chip
latency.

Geometry-branch path (the production configuration in this environment; the
DINO extractor is a per-crop host round-trip and stays in the serial driver).
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cppf2_tpu.config import CATEGORIES, PipelineConfig, SYNSET_NAMES, get_category
from cppf2_tpu.eval.driver import (
    REAL275_INTRINSICS,
    CategoryModels,
    load_category_models,
)
from cppf2_tpu.eval.nocs_map import compute_degree_cm_map
from cppf2_tpu.eval.pose_errors import _assemble_rt
from cppf2_tpu.infer.frontend import auto_crop, preprocess_frame
from cppf2_tpu.infer.pipeline import estimate_pose_ensemble
from cppf2_tpu.parallel import make_mesh


def make_batched_instance_fn(
    models: CategoryModels,
    cat_name: str,
    pipe: PipelineConfig,
    mesh,
    run_opt: bool = True,
    use_visual: bool = False,
    use_geo: bool = True,
    intrinsics: np.ndarray = REAL275_INTRINSICS,
    crop=None,
    axis: str = "data",
):
    """Jitted (depths, masks, keys) -> batched pose outputs, batch axis
    sharded over the mesh. Each element runs the same graph as
    `estimate_instance`: preprocess (backproject -> voxel downsample ->
    SHOT) then the two-branch ensemble (with zero descriptors when the
    visual branch is off)."""
    cat = get_category(cat_name)
    k_mat = jnp.asarray(intrinsics.astype(np.float32))
    dino_m, shot_m = models.dino_model, models.shot_model

    def one(dino_params, shot_params, depth, mask, key):
        k1, k2 = jax.random.split(key)
        fi = preprocess_frame(
            depth, mask, k_mat, k1,
            res=cat.res, n_max=pipe.n_points, shot_k=pipe.neighbor_k, crop=crop,
        )
        desc = jnp.zeros((pipe.n_points, 1024), jnp.float32)

        def dino_apply(p, pts, ti):
            return dino_m.apply(p, pts, desc, ti)

        def shot_apply(p, pts, ti):
            return shot_m.apply(p, pts, fi.shot, fi.normal, ti)

        est = estimate_pose_ensemble(
            dino_apply, dino_params, shot_apply, shot_params,
            fi.pc, fi.valid, fi.count, k2, cat, pipe, run_opt=run_opt,
            use_visual=use_visual, use_geo=use_geo,
        )
        # extent over valid points only (valid-prefix layout; padding is zeros
        # at the origin and must not inflate the degenerate-extent guard)
        ref = fi.pc[0]
        pts = jnp.where(fi.valid[:, None], fi.pc, ref)
        ext = jnp.max(pts, 0) - jnp.min(pts, 0)
        return (
            est.rotation, est.translation, est.scale, est.scale_norm,
            est.loss, fi.count, jnp.max(ext),
        )

    # on a two-level (dcn, data) slice mesh pass axis="dcn": images shard
    # across slices (no cross-slice collectives exist in this graph) and the
    # per-instance program replicates over the slice's ICI axis
    data = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    # param trees enter as jit ARGUMENTS (replicated), never closures — a
    # closed-over flax tree is inlined into the serialized module as literal
    # constants and the relay's compile endpoint rejects the request
    # (CLAUDE.md; the serial driver's pose_fn does the same)
    batched = jax.vmap(one, in_axes=(None, None, 0, 0, 0))
    jitted = jax.jit(
        batched,
        in_shardings=(repl, repl, data, data, data),
        out_shardings=data,
    )

    def fn(depths, masks, keys):
        return jitted(models.dino_params, models.shot_params,
                      depths, masks, keys)

    return fn


def evaluate_real275_parallel(
    detections_dir: str,
    image_root: str,
    out_dir: str,
    ckpt_root: str = "ckpts",
    pipe: Optional[PipelineConfig] = None,
    limit: Optional[int] = None,
    run_opt: bool = True,
    seed: int = 0,
    n_devices: Optional[int] = None,
    flush_multiple: int = 4,
):
    """Mesh-parallel REAL275 evaluation (geometry branch).

    Produces the same result pkls and AP tables as `evaluate_real275`
    (keys are assigned in the serial instance order, so per-instance
    randomness matches the serial driver)."""
    import cv2

    pipe = pipe or PipelineConfig()
    pkls = sorted(glob.glob(os.path.join(detections_dir, "results_*.pkl")))
    assert pkls, f"no detection pkls under {detections_dir}"
    if limit:
        pkls = pkls[:limit]

    mesh = make_mesh(n_devices)
    n_dev = mesh.devices.size
    models = load_category_models(ckpt_root)

    # pass 1: load results, assign serial-order keys, group work by category
    key = jax.random.key(seed)
    results: List[Dict] = []
    paths: List[str] = []
    depth_paths: List[str] = []
    work: Dict = {
        (c, cr): [] for c in CATEGORIES for cr in (256, 320, None)
    }
    for pkl_path in pkls:
        with open(pkl_path, "rb") as f:
            res = pickle.load(f)
        if "gt_handle_visibility" not in res:
            res["gt_handle_visibility"] = np.ones_like(res["gt_class_ids"])
        image_path = os.path.join(
            image_root, os.path.relpath(res["image_path"], "data/real/test")
        )
        n_inst = len(res["pred_class_ids"])
        res["pred_RTs"] = np.stack([np.eye(4) for _ in range(n_inst)])
        res["pred_scales"] = np.ones((n_inst, 3))
        img_idx = len(results)
        results.append(res)
        paths.append(pkl_path)
        depth_paths.append(image_path + "_depth.png")
        for i in range(n_inst):
            cat_name = SYNSET_NAMES[int(res["pred_class_ids"][i])]
            if cat_name not in CATEGORIES:
                continue
            key, sub = jax.random.split(key)
            mask = res["pred_masks"][:, :, i].astype(bool)
            # depth is loaded per flushed chunk in pass 2 (holding every
            # frame's depth map for the whole run costs ~3 GB on full REAL275)
            cr = auto_crop(mask)  # same decision as estimate_instance
            work[(cat_name, cr)].append((img_idx, i, mask, sub))

    # pass 2: per (category, crop) group, flush sharded batches
    for (cat_name, crop), items in work.items():
        if not items:
            continue
        fn = make_batched_instance_fn(
            models[cat_name], cat_name, pipe, mesh, run_opt=run_opt, crop=crop,
        )
        bsz = n_dev * flush_multiple
        for lo in range(0, len(items), bsz):
            chunk = items[lo : lo + bsz]
            pad = -len(chunk) % n_dev
            memo: Dict[int, np.ndarray] = {}

            def _depth(idx):
                if idx not in memo:
                    raw = cv2.imread(depth_paths[idx], -1)
                    if raw is None:
                        raise FileNotFoundError(
                            f"unreadable depth image: {depth_paths[idx]}")
                    memo[idx] = raw.astype(np.float32) / 1000.0
                return memo[idx]

            depths = np.stack(
                [_depth(c[0]) for c in chunk] + [_depth(chunk[-1][0])] * pad
            )
            masks = np.stack([c[2] for c in chunk] + [chunk[-1][2]] * pad)
            keys = jnp.stack([c[3] for c in chunk] + [chunk[-1][3]] * pad)
            # ONE host sync for the whole flushed chunk (each fetch costs
            # ~80 ms through the relay — CLAUDE.md; per-leaf np.asarray
            # would pay it 7x)
            rot, trans, scale, snorm, loss, count, ext = jax.device_get(
                fn(jnp.asarray(depths), jnp.asarray(masks), keys)
            )
            for j, (img_idx, inst_idx, _, _) in enumerate(chunk):
                # degenerate guards, matching estimate_instance
                if count[j] < 32 or ext[j] / CATEGORIES[cat_name].res > 1000:
                    continue
                # shared RT/scales assembly (same snorm clamping everywhere)
                rt, scales = _assemble_rt(rot[j], trans[j], scale[j], snorm[j])
                results[img_idx]["pred_RTs"][inst_idx] = rt
                results[img_idx]["pred_scales"][inst_idx] = scales

    # pass 3: dump pkls + score
    os.makedirs(out_dir, exist_ok=True)
    for res, pkl_path in zip(results, paths):
        with open(os.path.join(out_dir, os.path.basename(pkl_path)), "wb") as f:
            pickle.dump(res, f)
    return compute_degree_cm_map(
        results, SYNSET_NAMES, os.path.join(out_dir, "plots"),
        degree_thresholds=(5, 10, 15), shift_thresholds=(5, 10, 15),
        iou_3d_thresholds=tuple(np.linspace(0, 1, 101)),
        iou_pose_thres=0.1, use_matches_for_pose=True,
    )

"""Trained two-branch ensemble accuracy benchmark (synthetic, all categories).

The reference's core inference contract is the SHOT+DINO ensemble with
per-branch reconstruction-loss arbitration (eval.py:219, 358-372). This script
produces the trained-ensemble numbers: per category it

  1. loads the round-2 SHOT-branch checkpoint (`--shot-ckpts`), or trains one;
  2. trains the DINO branch on textured, randomly-lit renders through the ViT
     extractor (random fixed backbone — no pretrained weights exist in this
     zero-egress sandbox; the *path* is identical to the real one);
  3. evaluates `estimate_pose_ensemble` (both trained branches competing,
     best-of-N restarts) on >= `--frames` held-out frames, logging the
     per-branch pick rate, per-frame errors, Wilson CIs and the NOCS mAP
     artifact set; optionally each branch alone for attribution
     (`--per-branch-cats`).

    python scripts/ensemble_benchmark.py --out benchmarks/synthetic_r3_ensemble
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from cppf2_tpu.config import CATEGORIES, PipelineConfig, SYNSET_NAMES
from cppf2_tpu.data.synthetic import SyntheticFrameGenerator
from cppf2_tpu.eval.nocs_map import compute_degree_cm_map
from cppf2_tpu.eval.pose_errors import fetch_rt_pairs, pose_error_degree_cm
from cppf2_tpu.infer.frontend import preprocess_frame
from cppf2_tpu.infer.pipeline import estimate_pose_ensemble
from cppf2_tpu.models import DinoBranch, ShotBranch
from cppf2_tpu.train.checkpoints import export_params_msgpack, load_params_msgpack


def wilson_ci(k: int, n: int, z: float = 1.96):
    """95% Wilson score interval for a binomial rate."""
    if n == 0:
        return (0.0, 1.0)
    p = k / n
    den = 1 + z * z / n
    mid = (p + z * z / (2 * n)) / den
    half = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / den
    return (max(0.0, mid - half), min(1.0, mid + half))


def load_shot_params(shot_root, cat_name, cat):
    model = ShotBranch(tuple_size=cat.tuple_size)
    i0 = jnp.zeros((8, cat.tuple_size), jnp.int32)
    ref = model.init(
        jax.random.key(0), jnp.zeros((16, 3)), jnp.zeros((16, 352)),
        jnp.zeros((16, 3)), i0,
    )
    path = os.path.join(shot_root, "shot", cat_name, "params.msgpack")
    if not os.path.exists(path):
        return model, None
    return model, load_params_msgpack(path, ref)


def eval_ensemble(cat_name, shot_model, shot_params, dino_model, dino_params,
                  extractor, n_frames, pipe, n_points, seed, progress,
                  per_branch=False, variants=None):
    """Held-out eval through the full two-branch ensemble graph.

    `variants` ({name: PipelineConfig}) runs several pipeline configurations
    over the SAME frames/descriptors/keys — a paired comparison (e.g. the
    three arbitration rules) for the price of the extra pose graphs only.
    The first variant is the one reported in the headline summary/mAP set.
    """
    from cppf2_tpu.train.driver import _frame_descriptors

    cat = CATEGORIES[cat_name]
    gen = SyntheticFrameGenerator(cat, n_max=n_points, shot_k=48, seed=seed + 77)
    cls_id = cat.category_id
    variants = variants or {"base": pipe}

    @jax.jit
    def preprocess_only(depth, key):
        return preprocess_frame(depth, depth > 0, gen.intrinsics, key,
                                res=cat.res, n_max=n_points, shot_k=48)

    def make_pose(use_visual, use_geo, vpipe):
        # param trees enter as jit ARGUMENTS (closure pytrees are inlined
        # as module constants and defeat the compile cache — CLAUDE.md)
        @jax.jit
        def pose(dp, sp, fi, desc, key):
            def dino_apply(p, pts, ti):
                return dino_model.apply(p, pts, desc, ti)

            def shot_apply(p, pts, ti):
                return shot_model.apply(p, pts, fi.shot, fi.normal, ti)

            return estimate_pose_ensemble(
                dino_apply, dp, shot_apply, sp,
                fi.pc, fi.valid, fi.count, key, cat, vpipe, run_opt=True,
                use_visual=use_visual, use_geo=use_geo,
            )
        return pose

    pose_variants = {n: make_pose(True, True, vp) for n, vp in variants.items()}
    pose_each = (
        (make_pose(True, False, pipe), make_pose(False, True, pipe))
        if per_branch else None)

    def to_row(fetched, i, handle_vis):
        # assembles one result row from pre-fetched values: ALL of a frame's
        # variant/per-branch estimates ride ONE device_get (each separate
        # fetch costs ~80 ms via the relay)
        rt, scales, gt_rt, gt_scales, pick = fetched
        res = {
            "image_path": f"synth_{i}",
            "gt_class_ids": np.array([cls_id]),
            "gt_RTs": gt_rt[None],
            "gt_scales": gt_scales[None],
            "gt_handle_visibility": np.array([handle_vis]),
            "pred_class_ids": np.array([cls_id]),
            "pred_RTs": rt[None],
            "pred_scales": scales[None],
            "pred_scores": np.array([1.0]),
        }
        err = pose_error_degree_cm(rt, gt_rt, cat_name, handle_visibility=handle_vis)
        return res, err, int(pick)

    vnames = list(pose_variants)
    results, vis = [], []
    verrs = {n: [] for n in vnames}
    vpicks = {n: [] for n in vnames}
    branch_errs = {"dino": [], "shot": []}
    t0 = time.time()
    for i in range(n_frames):
        f = gen.next_frame()
        handle_vis = getattr(gen, "last_handle_visible", 1)
        vis.append(handle_vis)
        key = jax.random.key(1000 + i)
        fi = preprocess_only(f.depth, key)
        fd = f._replace(pixel_yx=fi.pixel_yx)
        desc = jnp.asarray(_frame_descriptors(fd, extractor))
        # dispatch EVERY variant + per-branch graph first (async), then one
        # host sync for the whole frame
        ests = [pose_variants[vn](dino_params, shot_params, fi, desc,
                                  jax.random.fold_in(key, 1))
                for vn in vnames]
        if per_branch:
            ests += [fn(dino_params, shot_params, fi, desc,
                        jax.random.fold_in(key, 1)) for fn in pose_each]
        fetched = fetch_rt_pairs(
            ests, f, extras_per_est=[(e.pick,) for e in ests])
        for vn, vals in zip(vnames, fetched):
            row, err, pick = to_row(vals, i, handle_vis)
            vpicks[vn].append(pick)
            verrs[vn].append(err)
            if vn == vnames[0]:
                results.append(row)
        if per_branch:
            for name, vals in zip(("dino", "shot"), fetched[len(vnames):]):
                _, err_b, _ = to_row(vals, i, handle_vis)
                branch_errs[name].append(err_b)
        if (i + 1) % 25 == 0:
            progress(f"[{cat_name}] eval {i + 1}/{n_frames} "
                     f"({(time.time() - t0) / (i + 1):.1f} s/frame)")

    def variant_summary(errs, picks):
        errs = np.asarray(errs)
        picks = np.asarray(picks)
        ok = (errs[:, 0] < 5) & (errs[:, 1] < 5)
        lo, hi = wilson_ci(int(ok.sum()), len(ok))
        return errs, picks, ok, {
            "median_deg": float(np.median(errs[:, 0])),
            "median_cm": float(np.median(errs[:, 1])),
            "deg5cm5": float(ok.mean()),
            "deg5cm5_ci95": [lo, hi],
            "visual_pick_rate": float(np.mean(picks == 0)),
            "n_frames": n_frames,
        }

    errs, picks, ok, out = variant_summary(verrs[vnames[0]], vpicks[vnames[0]])
    progress(
        f"[{cat_name}] {n_frames} frames: median {out['median_deg']:.1f} deg "
        f"/ {out['median_cm']:.2f} cm, 5d5cm {out['deg5cm5']:.3f} "
        f"{[round(c, 2) for c in out['deg5cm5_ci95']]}, "
        f"visual-pick {out['visual_pick_rate']:.2f}"
    )
    if len(vnames) > 1:
        out["variants"] = {}
        for vn in vnames:
            _, _, _, vout = variant_summary(verrs[vn], vpicks[vn])
            out["variants"][vn] = vout
            progress(f"[{cat_name}]   variant {vn}: 5d5cm {vout['deg5cm5']:.3f} "
                     f"{[round(c, 2) for c in vout['deg5cm5_ci95']]}, "
                     f"visual-pick {vout['visual_pick_rate']:.2f}")
    if per_branch:
        for name in ("dino", "shot"):
            be = np.asarray(branch_errs[name])
            okb = (be[:, 0] < 5) & (be[:, 1] < 5)
            out[f"{name}_only_deg5cm5"] = float(okb.mean())
            out[f"{name}_only_median_deg"] = float(np.median(be[:, 0]))
    # per-frame per-variant arrays for paired analysis artifacts
    arrays = {}
    if len(vnames) > 1:
        for vn in vnames:
            slug = vn.replace("=", "_")
            arrays[f"errs__{slug}"] = np.asarray(verrs[vn])
            arrays[f"picks__{slug}"] = np.asarray(vpicks[vn])
    return results, errs, picks, np.asarray(vis), out, arrays


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--categories", nargs="+", default=list(CATEGORIES))
    ap.add_argument("--dino-steps", type=int, default=20000)
    ap.add_argument("--dino-steps-asym", type=int, default=30000,
                    help="training budget for mug/camera (hard categories)")
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--n-points", type=int, default=4096)
    ap.add_argument("--tuples", type=int, default=8192)
    ap.add_argument("--pool", type=int, default=100)
    ap.add_argument("--refresh-every", type=int, default=50)
    ap.add_argument("--num-pairs", type=int, default=20000)
    ap.add_argument("--restarts", type=int, default=3)
    ap.add_argument("--shot-ckpts", default="ckpts_r2")
    ap.add_argument("--save-ckpts", default="ckpts_r3")
    ap.add_argument("--per-branch-cats", nargs="*", default=["mug", "camera"],
                    help="also evaluate each branch alone for these categories")
    ap.add_argument("--stride", type=int, default=4,
                    help="ViT descriptor stride (4 = reference eval setting, "
                         "8 = the 4x-faster production candidate)")
    ap.add_argument("--eval-only", default=None, metavar="DINO_CKPT_ROOT",
                    help="skip training: load dino params from "
                         "{root}/dino/{cat}/params.msgpack (e.g. ckpts_r3) "
                         "and only run the ensemble eval")
    ap.add_argument("--scale-mode", default=None,
                    choices=["pair", "head", "split"],
                    help="canonical->metric rescale override "
                         "(PipelineConfig.scale_mode); default None = each "
                         "category's own default ('head' for mug)")
    ap.add_argument("--arbiter", default=None,
                    choices=["recon", "cross", "margin"],
                    help="ensemble branch-selection rule "
                         "(PipelineConfig.arbiter); default = config default")
    ap.add_argument("--arbiter-margin", type=float, default=None)
    ap.add_argument("--compare", nargs="*", default=None,
                    metavar="FIELD=VALUE",
                    help="paired variant comparison: each token overrides one "
                         "PipelineConfig field on the base config and is "
                         "evaluated on the SAME frames (e.g. --compare "
                         "arbiter=recon arbiter=cross arbiter=margin, or "
                         "yaw_sweep=False yaw_sweep=True). The first variant "
                         "feeds the headline summary and the mAP artifact set.")
    ap.add_argument("--backbone", default=None,
                    help="prefix of a trained compact backbone "
                         "(train/driver.py --branch dino-e2e artifacts: "
                         "{prefix}.msgpack + {prefix}.json) to use for the "
                         "visual extractor instead of a random ViT-L")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (accuracy runs bit-for-bit "
                         "the same pipeline; useful when the TPU relay is "
                         "down — expect ~20-60x slower frames)")
    ap.add_argument("--out", default="benchmarks/synthetic_r3_ensemble")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from synthetic_benchmark import train_one
    from cppf2_tpu.models.dinov2 import DinoFeatureExtractor

    if args.backbone:
        # trained compact backbone (train/driver.py --branch dino-e2e):
        # architecture + crop/stride convention come from the json sidecar
        from cppf2_tpu.models.dinov2 import load_backbone
        from cppf2_tpu.ops.pallas_kernels import on_tpu

        bb = load_backbone(
            args.backbone, attn_impl="pallas" if on_tpu() else "hbm"
        )
        assert bb is not None, f"no backbone at {args.backbone}.msgpack"
        bb_params, bb_cfg, bb_stride, bb_out = bb
        extractor = DinoFeatureExtractor(
            params=bb_params, cfg=bb_cfg, stride=bb_stride, out_size=bb_out
        )
        print(f"[setup] trained backbone {args.backbone}: "
              f"d={bb_cfg.embed_dim} depth={bb_cfg.depth} stride={bb_stride}")
    else:
        extractor = DinoFeatureExtractor(stride=args.stride)
        extractor.init_random(hw=(256, 256), seed=args.seed)
    over = {k: v for k, v in (
        ("arbiter", args.arbiter), ("arbiter_margin", args.arbiter_margin),
    ) if v is not None}
    pipe = PipelineConfig(n_points=args.n_points, num_pairs=args.num_pairs,
                          restarts=args.restarts, scale_mode=args.scale_mode,
                          **over)
    variants = None
    if args.compare:
        import ast
        import dataclasses as dc

        variants = {}
        for tok in args.compare:
            field, _, raw = tok.partition("=")
            try:
                val = ast.literal_eval(raw)
            except (ValueError, SyntaxError):
                val = raw
            variants[tok] = dc.replace(pipe, **{field: val})
    os.makedirs(args.out, exist_ok=True)
    all_results, summary = [], {}
    for cat_name in args.categories:
        cat = CATEGORIES[cat_name]
        shot_model, shot_params = load_shot_params(args.shot_ckpts, cat_name, cat)
        assert shot_params is not None, (
            f"no SHOT checkpoint for {cat_name} under {args.shot_ckpts}")
        if args.eval_only:
            dino_model = DinoBranch(tuple_size=cat.tuple_size)
            i0 = jnp.zeros((8, cat.tuple_size), jnp.int32)
            # template desc dim follows the extractor (384 for a trained
            # compact backbone, 1024 for ViT-L)
            ref = dino_model.init(
                jax.random.key(1), jnp.zeros((16, 3)),
                jnp.zeros((16, extractor.cfg.embed_dim)), i0)
            dino_params = load_params_msgpack(
                os.path.join(args.eval_only, "dino", cat_name,
                             "params.msgpack"), ref)
        else:
            hard = cat_name in ("mug", "camera")
            steps = args.dino_steps_asym if hard else args.dino_steps
            dino_model, dino_state = train_one(
                cat_name, steps, args.n_points, args.tuples,
                150 if hard else args.pool, args.seed, print,
                refresh_every=args.refresh_every,
                branch="dino", extractor=extractor,
                # mug trains on ALL frames: hidden-handle frames are
                # yaw-canonicalized by the generator (map_sym), so their
                # center/scale targets are clean signal, not label noise —
                # filtering them out left body-only clouds OOD (a measured
                # ~6 cm camera-z center bias at eval)
                handle_visible=False,
            )
            dino_params = jax.device_get(dino_state.params)
        if args.save_ckpts and not args.eval_only:
            path = export_params_msgpack(
                os.path.join(args.save_ckpts, "dino", cat_name, "params.msgpack"),
                dino_params,
            )
            print(f"[{cat_name}] saved dino params {path}")
            # ship a complete per-round set: copy the shot ckpt alongside
            src = os.path.join(args.shot_ckpts, "shot", cat_name, "params.msgpack")
            dst = os.path.join(args.save_ckpts, "shot", cat_name, "params.msgpack")
            if os.path.abspath(src) != os.path.abspath(dst):
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copyfile(src, dst)

        results, errs, picks, vis, cat_summary, varrays = eval_ensemble(
            cat_name, shot_model, shot_params, dino_model, dino_params,
            extractor, args.frames, pipe, args.n_points, args.seed, print,
            per_branch=cat_name in (args.per_branch_cats or []),
            variants=variants,
        )
        all_results += results
        summary[cat_name] = cat_summary
        np.savez(os.path.join(args.out, f"errors_{cat_name}.npz"),
                 errs=errs, picks=picks, handle_visible=vis, **varrays)
        # checkpoint the summary as we go (long run)
        with open(os.path.join(args.out, "summary_partial.json"), "w") as f:
            json.dump(summary, f, indent=2)

    iou_aps, pose_aps = compute_degree_cm_map(
        all_results, SYNSET_NAMES, args.out,
        degree_thresholds=(5, 10, 15), shift_thresholds=(5, 10, 15),
        iou_3d_thresholds=tuple(np.linspace(0, 1, 101)),
        iou_pose_thres=0.1, use_matches_for_pose=True,
    )
    out = {
        "per_category": summary,
        "mean_iou25": float(np.nanmean(iou_aps[1:-1, 25])),
        "mean_iou50": float(np.nanmean(iou_aps[1:-1, 50])),
        "mean_5deg5cm": float(np.nanmean(pose_aps[1:-1, 0, 0])),
        "mean_10deg10cm": float(np.nanmean(pose_aps[1:-1, 1, 1])),
        "frames_per_cat": args.frames,
        "restarts": args.restarts,
        "num_pairs": args.num_pairs,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

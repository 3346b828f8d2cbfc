"""In-the-wild single-object pose demo over RGB-D frames.

Equivalent of the reference's demo.py (demo.py:60-317): per frame, mask ->
crop -> descriptors -> cloud -> ensemble pose -> overlay render. The
reference sources masks from a torchvision Mask-RCNN (demo.py:95-115); no
detector weights ship in this environment, so masks come from files
(`--masks`) or the in-repo geometric instance proposer (`--auto-mask`:
depth-discontinuity components after support-plane removal, ranked by the
category scale prior — `infer/segmenter.py`); any external segmenter can be
plugged through `mask_provider`.

Usage (reference example_data layout — rgb.png, depth.png (mm), mask.png):
    python -m cppf2_tpu.demo --rgb rgb.png --depth depth.png --mask mask.png \
        --category mug --ckpts ckpts --out predictions/
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from cppf2_tpu.config import PipelineConfig
from cppf2_tpu.eval.driver import CategoryModels, estimate_instance, load_category_models
from cppf2_tpu.utils.viz import draw_pose_overlay

# intrinsics of the reference's example capture (demo.py uses the NOCS camera
# for example_data)
DEFAULT_INTRINSICS = np.array(
    [[591.0125, 0, 322.525], [0, 590.16775, 244.11084], [0, 0, 1]], np.float32
)


def depth_band_mask(depth_m: np.ndarray, lo=0.2, hi=1.5) -> np.ndarray:
    """Last-resort segmenter: largest connected component in a depth band
    (the structured proposer in `infer/segmenter.py` is the default)."""
    import cv2

    band = ((depth_m > lo) & (depth_m < hi)).astype(np.uint8)
    n, labels = cv2.connectedComponents(band, connectivity=8)
    if n <= 1:
        return band.astype(bool)
    sizes = [(labels == i).sum() for i in range(1, n)]
    return labels == (1 + int(np.argmax(sizes)))


def auto_instance_mask(depth_m, intrinsics, category=None, scale_range=None,
                       mask_index=0, verbose=False, prev_mask=None):
    """Segment the frame with the geometric instance proposer
    (`infer/segmenter.py`: depth edges -> support-plane removal -> connected
    components -> category scale prior). `mask_index` picks among the ranked
    proposals — without a semantic detector (the reference uses a COCO
    Mask R-CNN, demo.py:95-115) two scale-compatible tabletop objects are
    indistinguishable, so the demo prints the ranked list once and lets the
    user choose. From the second frame on, `prev_mask` pins the *identity*:
    the proposal with the best IoU against the previous frame's selection
    wins (the per-frame score ranking can flip between two similar objects
    at depth-noise level, which would silently switch the posed instance
    mid-video). Falls back to the depth-band heuristic when the scene
    yields no proposal.

    Returns (mask, from_proposal): `from_proposal` is False on the
    depth-band fallback — callers tracking identity across frames must NOT
    seed `prev_mask` from a fallback mask (it is often the support surface,
    which would pin tracking to the wrong object for the rest of the
    video)."""
    from cppf2_tpu.infer.segmenter import (
        backproject_grid,
        propose_instances,
        resolve_scale_range,
    )

    scale_range = resolve_scale_range(category, scale_range)
    props = propose_instances(depth_m, intrinsics, scale_range)
    if not props:
        return depth_band_mask(depth_m), False
    pick = min(mask_index, len(props) - 1)
    if pick != mask_index:
        print(f"[demo] --mask-index {mask_index} out of range: only "
              f"{len(props)} proposal(s) this frame, using {pick}")
    if prev_mask is not None:
        ious = [
            (m & prev_mask).sum() / max((m | prev_mask).sum(), 1)
            for m in props
        ]
        best = int(np.argmax(ious))
        if ious[best] > 0.2:  # tracked: keep the same physical object
            pick = best
    if verbose:
        pts = backproject_grid(depth_m, intrinsics)
        for i, m in enumerate(props):
            p = pts[m]
            ext = float((p.max(0) - p.min(0)).max())
            tag = " <- selected" if i == pick else ""
            print(f"[demo] proposal {i}: {int(m.sum())} px, "
                  f"max extent {ext * 100:.1f} cm, "
                  f"median depth {float(np.median(p[:, 2])):.2f} m{tag}")
    return props[pick], True


def run_frame(
    rgb, depth_m, mask, category, models: CategoryModels, pipe: PipelineConfig,
    intrinsics=DEFAULT_INTRINSICS, key=None, dino_extractor=None, run_opt=True,
):
    """Pose one frame; returns (overlay_rgb, rt, scales) or (rgb, None, None)."""
    key = key if key is not None else jax.random.key(0)
    out = estimate_instance(
        rgb, depth_m, mask, intrinsics, models, category, pipe, key,
        dino_extractor, run_opt,
    )
    if out is None:
        return rgb, None, None
    rt, scales, _ = out
    return draw_pose_overlay(rgb, rt, scales, intrinsics), rt, scales


def _read_depth(path: str, depth_scale: float) -> np.ndarray:
    """Depth frame from .npy (meters, the reference's record3d capture format,
    demo.py:98) or a 16-bit png (divided by depth_scale)."""
    import cv2

    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    return cv2.imread(path, -1).astype(np.float32) / depth_scale


def main():
    import glob as globmod

    import cv2

    ap = argparse.ArgumentParser()
    ap.add_argument("--rgb", nargs="+", default=None,
                    help="RGB frame files (or use --rgb-dir)")
    ap.add_argument("--depth", nargs="+", default=None,
                    help="depth frames: 16-bit png (mm) or .npy (meters)")
    ap.add_argument("--rgb-dir", default=None,
                    help="directory of RGB frames, processed sorted — the "
                         "reference's record3d capture layout (demo.py:96-98)")
    ap.add_argument("--depth-dir", default=None,
                    help="directory of depth frames matching --rgb-dir stems")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--end", type=int, default=None)
    ap.add_argument("--video-out", default=None,
                    help="also stitch the overlay sequence into an mp4")
    ap.add_argument("--fps", type=float, default=15.0)
    ap.add_argument("--mask", nargs="*", default=None)
    ap.add_argument("--auto-mask", action="store_true",
                    help="segment with the geometric instance proposer "
                         "(depth edges + support-plane removal + category "
                         "scale prior) — no mask files needed")
    ap.add_argument("--mask-index", type=int, default=0,
                    help="with --auto-mask: which ranked proposal to pose "
                         "(the first frame prints the ranked list)")
    ap.add_argument("--intrinsics", default=None,
                    help=".npy 3x3 camera matrix (default: NOCS camera)")
    ap.add_argument("--category", required=True)
    ap.add_argument("--ckpts", default="ckpts")
    ap.add_argument("--dino-ckpt", default=None)
    ap.add_argument("--depth-scale", type=float, default=1000.0)
    ap.add_argument("--out", default="predictions")
    ap.add_argument("--no-opt", action="store_true")
    ap.add_argument("--restarts", type=int, default=1,
                    help="best-of-N pose restarts by reconstruction loss")
    ap.add_argument("--n-points", type=int, default=None)
    ap.add_argument("--num-pairs", type=int, default=None)
    ap.add_argument("--angle-tol", type=float, default=None,
                    help="rotation-vote tolerance in degrees (coarser = faster)")
    args = ap.parse_args()

    models = load_category_models(args.ckpts, [args.category])[args.category]
    over = {k: v for k, v in (
        ("n_points", args.n_points), ("num_pairs", args.num_pairs),
        ("angle_tol_deg", args.angle_tol),
    ) if v is not None}
    pipe = PipelineConfig(restarts=args.restarts, **over)
    dino_extractor = None
    if args.dino_ckpt:
        from cppf2_tpu.models.dinov2 import DinoFeatureExtractor, load_dinov2_params

        p = load_dinov2_params(args.dino_ckpt)
        if p is not None:
            dino_extractor = DinoFeatureExtractor(params=p)

    # frame list: explicit files or a sorted capture directory with a
    # [start:end] window, like the reference's `sorted(glob)[410:700]`
    if args.rgb_dir:
        rgb_paths = sorted(
            p for p in globmod.glob(os.path.join(args.rgb_dir, "*"))
            if p.lower().endswith((".png", ".jpg", ".jpeg"))
        )[args.start : args.end]
        ddir = args.depth_dir or args.rgb_dir.replace("rgb", "depth")
        if args.depth_dir is None and ddir == args.rgb_dir:
            # the 'rgb'->'depth' substitution was a no-op: without an explicit
            # --depth-dir we would silently read the RGB PNGs as depth frames
            # (an explicit --depth-dir equal to --rgb-dir stays allowed: depth
            # may live as {stem}.npy next to the RGB PNGs)
            raise SystemExit(
                f"--depth-dir required: cannot derive a depth dir from "
                f"{args.rgb_dir!r} (no 'rgb' in the path)")
        depth_paths = []
        for p in rgb_paths:
            stem = os.path.splitext(os.path.basename(p))[0]
            for ext in (".npy", ".png"):
                cand = os.path.join(ddir, stem + ext)
                if os.path.exists(cand):
                    depth_paths.append(cand)
                    break
            else:
                raise SystemExit(f"no depth frame for {stem} under {ddir}")
    else:
        assert args.rgb and args.depth, "provide --rgb/--depth or --rgb-dir"
        rgb_paths, depth_paths = args.rgb, args.depth

    os.makedirs(args.out, exist_ok=True)
    writer = None
    key = jax.random.key(0)
    intrinsics = (np.load(args.intrinsics).astype(np.float32)
                  if args.intrinsics else DEFAULT_INTRINSICS)
    prev_mask = None
    for i, (rgb_p, depth_p) in enumerate(zip(rgb_paths, depth_paths)):
        rgb = cv2.imread(rgb_p)[:, :, ::-1]
        depth = _read_depth(depth_p, args.depth_scale)
        if args.mask:
            mask = cv2.imread(args.mask[i], -1)
            mask = (mask > 0) if mask.ndim == 2 else (mask.sum(-1) > 0)
        elif args.auto_mask:
            mask, from_proposal = auto_instance_mask(
                depth, intrinsics, category=args.category,
                mask_index=args.mask_index, verbose=(i == 0),
                prev_mask=prev_mask,
            )
            # only a real proposal may re-seed identity tracking: the
            # depth-band fallback (no-proposal frames) is often the support
            # surface, and storing it would pin every later frame's IoU
            # match to the wrong object
            if from_proposal:
                prev_mask = mask
        else:
            raise SystemExit("provide --mask files or --auto-mask")
        key, sub = jax.random.split(key)
        overlay, rt, scales = run_frame(
            rgb, depth, mask, args.category, models, pipe,
            intrinsics=intrinsics, key=sub,
            dino_extractor=dino_extractor, run_opt=not args.no_opt,
        )
        out_p = os.path.join(args.out, f"{i:04d}.png")
        cv2.imwrite(out_p, overlay[:, :, ::-1])
        if args.video_out:
            if writer is None:
                writer = cv2.VideoWriter(
                    args.video_out, cv2.VideoWriter_fourcc(*"mp4v"),
                    args.fps, (overlay.shape[1], overlay.shape[0]),
                )
            writer.write(np.ascontiguousarray(overlay[:, :, ::-1]))
        if rt is not None:
            np.savez(out_p.replace(".png", "_pose.npz"), RT=rt, scales=scales)
            print(f"[demo] {rgb_p}: T={rt[:3, 3]} -> {out_p}")
        else:
            print(f"[demo] {rgb_p}: no pose (degenerate input)")
    if writer is not None:
        writer.release()
        print(f"[demo] wrote {args.video_out}")


if __name__ == "__main__":
    main()

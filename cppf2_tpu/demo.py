"""In-the-wild single-object pose demo over RGB-D frames.

Equivalent of the reference's demo.py (demo.py:60-317): per frame, mask ->
crop -> descriptors -> cloud -> ensemble pose -> overlay render. The
reference sources masks from a torchvision Mask-RCNN (demo.py:95-115); no
detector weights ship in this environment, so masks come from files
(`--masks`) or a simple depth-band segmenter (`--auto-mask`), and any external
segmenter can be plugged through `mask_provider`.

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
    """Fallback segmenter: largest connected component in a depth band."""
    import cv2

    band = ((depth_m > lo) & (depth_m < hi)).astype(np.uint8)
    n, labels = cv2.connectedComponents(band, connectivity=8)
    if n <= 1:
        return band.astype(bool)
    sizes = [(labels == i).sum() for i in range(1, n)]
    return labels == (1 + int(np.argmax(sizes)))


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


def main():
    import cv2

    ap = argparse.ArgumentParser()
    ap.add_argument("--rgb", required=True, nargs="+")
    ap.add_argument("--depth", required=True, nargs="+")
    ap.add_argument("--mask", nargs="*", default=None)
    ap.add_argument("--auto-mask", action="store_true")
    ap.add_argument("--category", required=True)
    ap.add_argument("--ckpts", default="ckpts")
    ap.add_argument("--dino-ckpt", default=None)
    ap.add_argument("--depth-scale", type=float, default=1000.0)
    ap.add_argument("--out", default="predictions")
    ap.add_argument("--no-opt", action="store_true")
    ap.add_argument("--restarts", type=int, default=1,
                    help="best-of-N pose restarts by reconstruction loss")
    args = ap.parse_args()

    models = load_category_models(args.ckpts, [args.category])[args.category]
    pipe = PipelineConfig(restarts=args.restarts)
    dino_extractor = None
    if args.dino_ckpt:
        from cppf2_tpu.models.dinov2 import DinoFeatureExtractor, load_dinov2_params

        p = load_dinov2_params(args.dino_ckpt)
        if p is not None:
            dino_extractor = DinoFeatureExtractor(params=p)

    os.makedirs(args.out, exist_ok=True)
    key = jax.random.key(0)
    for i, (rgb_p, depth_p) in enumerate(zip(args.rgb, args.depth)):
        rgb = cv2.imread(rgb_p)[:, :, ::-1]
        depth = cv2.imread(depth_p, -1).astype(np.float32) / args.depth_scale
        if args.mask:
            mask = cv2.imread(args.mask[i], -1)
            mask = (mask > 0) if mask.ndim == 2 else (mask.sum(-1) > 0)
        elif args.auto_mask:
            mask = depth_band_mask(depth)
        else:
            raise SystemExit("provide --mask files or --auto-mask")
        key, sub = jax.random.split(key)
        overlay, rt, scales = run_frame(
            rgb, depth, mask, args.category, models, pipe, key=sub,
            dino_extractor=dino_extractor, run_opt=not args.no_opt,
        )
        out_p = os.path.join(args.out, f"{i:04d}.png")
        cv2.imwrite(out_p, overlay[:, :, ::-1])
        if rt is not None:
            np.savez(out_p.replace(".png", "_pose.npz"), RT=rt, scales=scales)
            print(f"[demo] {rgb_p}: T={rt[:3, 3]} -> {out_p}")
        else:
            print(f"[demo] {rgb_p}: no pose (degenerate input)")


if __name__ == "__main__":
    main()

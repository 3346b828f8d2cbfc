"""Visual-frontend stage micro-bench: where do the non-ViT milliseconds go?

bench.py's visual-inclusive path costs ~18 ms more than the geo path while
the ViT forward alone is ~11 ms (stride 8) — this script times the remaining
frontend stages in isolation at production scale (8192 cloud points, 256
crop) with the chained-dependency methodology:

    window slice + mask + bilinear resize (256 -> 448)
    descriptor sampling: interpolate_features impl=gather vs impl=onehot
    full masked_window_descriptors (for cross-checking the sum)

    python scripts/interp_bench.py [--stride 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from cppf2_tpu.models.dinov2 import (
        VIT_L14,
        DinoFeatureExtractor,
        bbox_crop_descriptors,
        interpolate_features,
        masked_window_descriptors,
    )
    from cppf2_tpu.utils.profiling import chained_timer

    ap = argparse.ArgumentParser()
    ap.add_argument("--stride", type=int, default=8)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke testing)")
    ap.add_argument("--skip-full", action="store_true",
                    help="micro stages only — skip the two ViT-L forwards")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    stride, n, crop = args.stride, args.n, args.crop

    rng = np.random.default_rng(0)
    gh = gw = crop // stride
    rgb = jnp.asarray(rng.uniform(0, 1, (480, 640, 3)).astype(np.float32))
    mask = jnp.asarray(
        (rng.uniform(size=(480, 640)) < 0.1).astype(bool)
    )
    grid = jnp.asarray(rng.normal(size=(gh, gw, 1024)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(0, crop - 1, (n, 2)).astype(np.float32))
    pixel_yx = jnp.asarray(
        rng.integers(0, 400, (n, 2)).astype(np.int32))
    window_yx = jnp.asarray(np.array([40, 100], np.int32))

    def chain_img(a, out):
        leaf = jax.tree.leaves(out)[0]
        return (a[0] + (leaf.ravel()[0] * 1e-12).astype(a[0].dtype),) + a[1:]

    def chain_last(a, out):
        # perturb the LAST arg (the image) — the first may be a param pytree
        leaf = jax.tree.leaves(out)[0]
        return a[:-1] + (a[-1] + (leaf.ravel()[0] * 1e-12).astype(a[-1].dtype),)

    # --- window slice + resize only ------------------------------------
    @jax.jit
    def front(im):
        y0, x0 = window_yx[0], window_yx[1]
        img = jax.lax.dynamic_slice(im, (y0, x0, jnp.int32(0)), (crop, crop, 3))
        m = jax.lax.dynamic_slice(mask, (y0, x0), (crop, crop))
        img = img * m[..., None]
        ph, pw = crop // stride, crop // stride
        return jax.image.resize(img, (ph * 14, pw * 14, 3), method="bilinear")

    ms = chained_timer(front, chain_img, (rgb,))
    print(f"window+mask+resize ({crop}->{crop // stride * 14}): {ms:.2f} ms")

    # --- resize impls head-to-head --------------------------------------
    from cppf2_tpu.models.dinov2 import resize_bilinear_matmul

    crop_img = jnp.asarray(
        rng.uniform(0, 1, (crop, crop, 3)).astype(np.float32))
    oh = ow = crop // stride * 14
    f_jax = jax.jit(lambda im: jax.image.resize(im, (oh, ow, 3), "bilinear"))
    f_mm = jax.jit(lambda im: resize_bilinear_matmul(im, oh, ow))
    for name, f in (("jax.image.resize", f_jax), ("matmul", f_mm)):
        ms = chained_timer(f, chain_img, (crop_img,))
        print(f"resize[{name}] {crop}->{oh}: {ms:.2f} ms")

    # --- descriptor sampling: gather vs onehot --------------------------
    for impl in ("gather", "onehot"):
        f = jax.jit(lambda g, p, impl=impl: interpolate_features(
            g, p, (crop, crop), stride, impl=impl))
        ms = chained_timer(f, chain_img, (grid, pts))
        print(f"interpolate_features[{impl}] ({n} x {gh}x{gw}x1024): {ms:.2f} ms")

    # --- full visual frontend (reference: eval.py:203-205) --------------
    if args.skip_full:
        return
    ext = DinoFeatureExtractor(
        cfg=dataclasses.replace(VIT_L14, attn_impl="pallas"))
    ext.init_random(hw=(crop, crop))

    # params enter as a jit ARGUMENT: closing over the ViT-L tree inlines
    # ~600 MB of literals into the module and the relay rejects the compile
    # (CLAUDE.md / HTTP 413)
    @jax.jit
    def full(params, im):
        return masked_window_descriptors(
            ext.model, params, im, mask, pixel_yx, window_yx,
            crop=crop, stride=stride)

    ms = chained_timer(full, chain_last, (ext.params, rgb))
    print(f"masked_window_descriptors full (stride {stride}): {ms:.2f} ms")

    @jax.jit
    def full_bbox(params, im):
        return bbox_crop_descriptors(
            ext.model, params, im, mask, pixel_yx, stride=stride)

    ms = chained_timer(full_bbox, chain_last, (ext.params, rgb))
    print(f"bbox_crop_descriptors full (stride {stride}): {ms:.2f} ms")


if __name__ == "__main__":
    main()

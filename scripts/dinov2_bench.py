"""DINOv2 ViT-L/14 forward benchmark on the chip (VERDICT r1 item 3).

Times the visual-branch feature extraction the reference runs per crop
(dataset.py:62-80: resize 256-crop to 896x896, forward 4097 tokens, sample
descriptors at keypoints). Random weights — timing only; real weights port
through `port_torch_state_dict` unchanged.

Usage: python scripts/dinov2_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from cppf2_tpu.models.dinov2 import VIT_L14, DinoFeatureExtractor, ViTConfig

    ap = argparse.ArgumentParser()
    ap.add_argument("--attn-impl", default="hbm", choices=["hbm", "chunked", "pallas"])
    ap.add_argument("--attn-chunk", type=int, default=512)
    ap.add_argument("--quant", default="none", choices=["none", "int8"])
    ap.add_argument("--block-q", type=int, default=256)
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--parity", action="store_true",
                    help="report descriptor cosine similarity vs the f32 path")
    ap.add_argument("--parity-only", action="store_true",
                    help="skip the timing loop (parity check only)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) — full-scale parity "
                         "checks run off-TPU to avoid slow f32 remote compiles")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    rng = np.random.default_rng(0)
    cfg = ViTConfig(attn_impl=args.attn_impl, attn_chunk=args.attn_chunk,
                    quant=args.quant, attn_block_q=args.block_q)
    ext = DinoFeatureExtractor(cfg=cfg, stride=args.stride)
    ext.init_random(hw=(256, 256))

    img = jnp.asarray(rng.uniform(0, 1, (256, 256, 3)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(0, 255, (8192, 2)).astype(np.float32))

    if args.parity:
        # f32 reference descriptors from the same (pre-quant) weights
        from cppf2_tpu.models.dinov2 import DinoViT
        import dataclasses as _dc

        ref_cfg = _dc.replace(cfg, quant="none", compute_dtype="float32",
                              attn_impl="hbm")
        ref_ext = DinoFeatureExtractor(cfg=ref_cfg)
        ref_ext.init_random(hw=(256, 256))  # same seed -> same weights
        d_ref = np.asarray(ref_ext(img, pts))
        d_q = np.asarray(ext(img, pts))
        cos = np.sum(d_ref * d_q, -1) / np.maximum(
            np.linalg.norm(d_ref, axis=-1) * np.linalg.norm(d_q, axis=-1), 1e-12)
        print(f"descriptor cosine vs f32: mean {cos.mean():.5f} "
              f"min {cos.min():.5f} (impl={args.attn_impl}, quant={args.quant})")
        if args.parity_only:
            return

    # In production the (8192, 1024) descriptors stay on device (they feed the
    # pose graph); reduce on-device so the relay doesn't stream 33 MB per call.
    run = jax.jit(
        lambda p, im: ext._run(p, im, pts, (256, 256)).astype(jnp.float32).sum()
    )

    # chained timing, one final sync; warm the relay stream with 4 synced
    # chained calls first (axon relay methodology, CLAUDE.md)
    c = jnp.float32(0)
    for i in range(4):
        c = run(ext.params, img + c * 1e-12)
    float(c)
    k = 16
    t0 = time.time()
    for i in range(k):
        c = run(ext.params, img + c * 1e-12)
    float(c)
    dt = (time.time() - t0) / k
    print(
        f"dinov2 vit-l/14 crop->8192 descriptors [{args.attn_impl}"
        f"/s{args.stride}]: {dt*1000:.0f} ms ({1/dt:.1f} crops/s, "
        f"{(256//args.stride)**2 + 1} tokens)"
    )


if __name__ == "__main__":
    main()

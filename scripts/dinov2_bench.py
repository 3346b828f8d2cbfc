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
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    cfg = ViTConfig(attn_impl=args.attn_impl, attn_chunk=args.attn_chunk)
    ext = DinoFeatureExtractor(cfg=cfg)
    ext.init_random(hw=(256, 256))

    img = jnp.asarray(rng.uniform(0, 1, (256, 256, 3)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(0, 255, (8192, 2)).astype(np.float32))

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
        f"dinov2 vit-l/14 crop->8192 descriptors [{args.attn_impl}]: "
        f"{dt*1000:.0f} ms ({1/dt:.1f} crops/s, 4097 tokens, bf16)"
    )


if __name__ == "__main__":
    main()

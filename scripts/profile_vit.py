"""Op-level xplane profile of the DINOv2 ViT-L forward on the chip.

Captures a jax.profiler trace of the production crop->descriptors program and
attributes device time by op category (attention kernel, qkv/proj/mlp
matmuls, layernorm/elementwise, resize), summing the "XLA Ops" line only
(async lines double-count — CLAUDE.md recipe).

    python scripts/profile_vit.py --attn-impl pallas
"""

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"

import numpy as np


def parse_xplane(log_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {log_dir}"
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    ops = defaultdict(float)
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                ops[name] += ev.duration_ps / 1e9  # ms
    return ops


def bucket(name):
    n = name.lower()
    if "custom-call" in n or "mha" in n or "pallas" in n:
        return "attention-kernel"
    if "convolution" in n:
        return "conv/patch-embed"
    if "dot" in n:
        return "matmul"
    if "fusion" in n:
        return "fusion/elementwise"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "layout/copy"
    if "reduce" in n:
        return "reduce"
    return "other"


def main():
    import jax
    import jax.numpy as jnp

    from cppf2_tpu.models.dinov2 import VIT_L14, DinoFeatureExtractor, ViTConfig

    ap = argparse.ArgumentParser()
    ap.add_argument("--attn-impl", default="pallas")
    ap.add_argument("--block-q", type=int, default=0)
    ap.add_argument("--logdir", default="/tmp/vit_trace")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    import dataclasses

    cfg = dataclasses.replace(VIT_L14, attn_impl=args.attn_impl)
    ext = DinoFeatureExtractor(cfg=cfg)
    ext.init_random(hw=(256, 256))
    img = jnp.asarray(rng.uniform(0, 1, (256, 256, 3)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(0, 255, (8192, 2)).astype(np.float32))

    run = jax.jit(
        lambda p, im: ext._run(p, im, pts, (256, 256)).astype(jnp.float32).sum()
    )
    c = jnp.float32(0)
    for i in range(4):
        c = run(ext.params, img + c * 1e-12)
    float(c)

    jax.profiler.start_trace(args.logdir)
    for i in range(4):
        c = run(ext.params, img + c * 1e-12)
    float(c)
    jax.profiler.stop_trace()

    ops = parse_xplane(args.logdir)
    total = sum(ops.values()) / 4
    buckets = defaultdict(float)
    for name, ms in ops.items():
        buckets[bucket(name)] += ms / 4
    print(f"total device time: {total:.1f} ms/forward (4-run average)")
    for b, ms in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {b:24s} {ms:7.2f} ms  ({100 * ms / total:4.1f}%)")
    top = sorted(ops.items(), key=lambda kv: -kv[1])[:12]
    print("top ops:")
    for name, ms in top:
        print(f"  {ms / 4:7.2f} ms  {name[:90]}")


if __name__ == "__main__":
    main()

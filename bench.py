"""Headline benchmark: REAL275-path end-to-end pose throughput on one chip.

Times the full per-instance eval path the reference runs in eval.py:132-372,
*including* the DINOv2 ViT-L/14 visual frontend (eval.py:203-205 computes
descriptors inside the per-instance loop; weights are random here — absent in
this zero-egress sandbox — which changes nothing about throughput):

    depth + mask -> dense backprojection -> voxel downsample -> normals +
    SHOT-352  |  masked RGB window -> resize -> ViT-L (stride-8 tokens,
    fused Pallas attention, bf16 params; int8 via BENCH_VIT_QUANT=int8,
    a measured negative result here) -> bilinear descriptor
    sampling -> both branch tuple MLPs -> bin sampling -> center vote ->
    backvote filter -> rotation votes -> 100-step alignment opt -> ensemble
    selection

as ONE jitted graph at eval-scale shapes (480x640 depth, 8192-point budget,
50k tuples, 1-deg sphere accumulator — eval.py:54-64 defaults). Secondary
numbers in the same JSON line:
  * geo_e2e_fps   — the same path minus the visual frontend (round-2 headline)
  * pose_graph_fps — pose graph only, features precomputed (round-1 headline)
  * instances_per_sec_3x — a 3-instance frame through the *driver* path,
    including real per-instance host work (mask bbox, crop decisions, host
    fetches) — what REAL275 actually stresses (eval.py:132-205 loop)

Prints ONE JSON line; vs_baseline is visual-inclusive e2e fps / 30 (the
>30 fps/chip north star from BASELINE.md — the reference publishes no
throughput numbers). Timing is chained-dependency with a single final host
sync, the only honest methodology through the axon relay (see CLAUDE.md).
"""

import dataclasses
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

# REAL275 camera intrinsics (reference: eval.py:175-177)
REAL275_K = np.array(
    [[591.0125, 0.0, 322.525], [0.0, 590.16775, 244.11084], [0.0, 0.0, 1.0]],
    np.float32,
)


def make_frame(rng, h=480, w=640, radius=0.11, center=(0.05, -0.02, 0.82)):
    """Synthetic sphere-cap depth + mask at REAL275 resolution: a ~20 cm object
    at 0.8 m, ~25k mask pixels -> overflows the 8192-voxel budget like a real
    close-range instance does."""
    cx, cy, cz = center
    fx, fy = REAL275_K[0, 0], REAL275_K[1, 1]
    u0, v0 = REAL275_K[0, 2], REAL275_K[1, 2]
    # reference backprojection flips x/y sign; project with the same convention
    uu = u0 - fx * cx / cz
    vv = v0 - fy * cy / cz
    ys, xs = np.mgrid[0:h, 0:w]
    rpix = radius * fx / cz
    d2 = (xs - uu) ** 2 + (ys - vv) ** 2
    mask = d2 < rpix**2
    bump = np.sqrt(np.maximum(radius**2 - d2 * (cz / fx) ** 2, 0.0))
    depth = np.where(mask, cz - bump, 0.0).astype(np.float32)
    depth += np.where(mask, rng.normal(0, 3e-4, (h, w)), 0.0).astype(np.float32)
    return depth, mask


def chained_fps(run_once, k=32):
    """Chained-dependency timing: each iteration's input depends on the previous
    output, one host sync at the end (defeats relay-level dedup/async lies).
    Warm with 4 chained calls + a sync first — the relay stalls on cold
    streams — then amortize over k calls."""
    import jax

    carry = 0.0
    for i in range(4):
        carry = run_once(jax.random.key(100 + i), carry)
    float(carry)
    t0 = time.time()
    for i in range(k):
        carry = run_once(jax.random.key(i), carry)
    float(carry)  # single final sync
    dt = (time.time() - t0) / k
    return 1.0 / dt


def _relay_up(timeout=2.0):
    import socket

    s = socket.socket()
    s.settimeout(timeout)
    try:
        s.connect(("127.0.0.1", 8093))
        return True
    except OSError:
        return False
    finally:
        s.close()


def _relay_guard():
    """Survive a transient relay outage, fail fast on a permanent one.

    When the axon loopback relay is dead, the first jax op blocks forever
    waiting on the remote-compile endpoint, hanging whatever harness invoked
    the bench — so we probe the port first. A dead probe re-tries every 30 s
    for up to BENCH_RELAY_WAIT_S (default 600 s) before emitting a parseable
    failure JSON line: round 3 lost its driver-captured number to a fail-fast
    on what may have been a transient outage. Only active in loopback-relay
    environments (AXON_LOOPBACK_RELAY)."""
    if os.environ.get("AXON_LOOPBACK_RELAY") != "1":
        return
    import sys

    budget = float(os.environ.get("BENCH_RELAY_WAIT_S", "600"))
    deadline = time.time() + budget
    waited = False
    while True:
        if _relay_up():
            if waited:
                print("bench: relay back up, proceeding", file=sys.stderr)
            return
        if time.time() >= deadline:
            break
        waited = True
        print("bench: relay 127.0.0.1:8093 down, re-probing in 30 s "
              f"({deadline - time.time():.0f} s left)", file=sys.stderr)
        time.sleep(min(30.0, max(0.0, deadline - time.time())))
    print(json.dumps({
        "metric": "real275_e2e_fps_per_chip", "value": 0.0,
        "unit": "frames/sec", "vs_baseline": 0.0,
        "error": "axon relay 127.0.0.1:8093 unreachable for "
                 f"{budget:.0f} s — TPU down",
    }))
    raise SystemExit(1)


def main():
    _relay_guard()
    import jax
    import jax.numpy as jnp

    from cppf2_tpu.config import CATEGORIES, PipelineConfig
    from cppf2_tpu.infer import estimate_pose_ensemble
    from cppf2_tpu.infer.frontend import preprocess_frame
    from cppf2_tpu.models import DinoBranch, ShotBranch
    from cppf2_tpu.models.dinov2 import (
        VIT_L14,
        DinoFeatureExtractor,
        bbox_crop_descriptors,
    )

    rng = np.random.default_rng(0)
    cat = CATEGORIES["mug"]
    # production inference config: bf16 branch MLPs (validated: +0.06 deg
    # median vs f32 on a trained checkpoint — scripts/dtype_check.py), the
    # k=48 neighbor budget every accuracy result uses, and the int8 W8A8 ViT
    # (descriptor cosine vs f32 reported by scripts/dinov2_bench.py
    # --parity). BENCH_* env vars override for experiments.
    dt = os.environ.get("BENCH_DTYPE", "bfloat16")
    k_nb = int(os.environ.get("BENCH_K", "0")) or None
    # ViT linears stay bf16: int8 W8A8 measured ~50x SLOWER at the raw
    # matmul level through this backend (int8 contractions are emulated,
    # not MXU-lowered here) — see RESULTS.md int8 ablation
    vit_quant = os.environ.get("BENCH_VIT_QUANT", "none")
    pipe = PipelineConfig(**({"neighbor_k": k_nb} if k_nb else {}))
    n = pipe.n_points
    crop = 256

    depth_np, mask_np = make_frame(rng)
    depth0 = jnp.asarray(depth_np)
    mask_j = jnp.asarray(mask_np)
    rgb0 = jnp.asarray(rng.uniform(0, 1, (480, 640, 3)).astype(np.float32))
    k_j = jnp.asarray(REAL275_K)
    desc_j = jnp.asarray(rng.normal(size=(n, 1024)).astype(np.float32))

    # visual frontend: ViT-L/14, fused Pallas attention. Production stride 8
    # (descriptor-accuracy validated across all categories on the synthetic
    # ensemble harness — benchmarks/synthetic_r3_ensemble); stride 4 is the
    # reference's own eval setting (dataset.py:63) and is reported as the
    # parity-config secondary number.
    stride = int(os.environ.get("BENCH_VIT_STRIDE", "8"))
    ext = DinoFeatureExtractor(
        cfg=dataclasses.replace(VIT_L14, attn_impl="pallas", quant=vit_quant)
    )
    ext.init_random(hw=(crop, crop))
    vit_model, vit_params = ext.model, ext.params

    shot_m, dino_m = ShotBranch(dtype=dt), DinoBranch(dtype=dt)
    i0 = jnp.zeros((8, 5), jnp.int32)
    pc0 = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    shot0 = jnp.asarray(rng.normal(size=(n, 352)).astype(np.float32))
    nrm0 = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    sp = shot_m.init(jax.random.key(0), pc0, shot0, nrm0, i0)
    dp = dino_m.init(jax.random.key(1), pc0, desc_j, i0)

    # ---- full eval.py path: depth+mask+rgb -> cloud+SHOT || ViT descriptors
    # -> ensemble pose (eval.py:132-372, descriptors inside the loop)
    def make_e2e_full(vit_stride):
        # NOTE: model params enter as jit ARGUMENTS, never closures — a
        # closed-over param tree is inlined into the module as literal
        # constants (measured 608 MB of serialized HLO for the bf16 ViT-L),
        # which blows the relay's compile-request size cap
        @jax.jit
        def e2e_full(vp, dpp, spp, depth, rgb, key):
            k_pre, k_pose = jax.random.split(key)
            fi = preprocess_frame(
                depth, mask_j, k_j, k_pre,
                res=cat.res, n_max=n, shot_k=pipe.neighbor_k, crop=crop,
            )
            # bbox-rescaled crop convention (dataset.py:322-337) — the one
            # the branch checkpoints are trained on and the driver's batched
            # frame path uses
            desc = bbox_crop_descriptors(
                vit_model, vp, rgb, mask_j, fi.pixel_yx, stride=vit_stride,
            )

            def dino_apply(params, points, ti):
                return dino_m.apply(params, points, desc, ti)

            def shot_apply(params, points, ti):
                return shot_m.apply(params, points, fi.shot, fi.normal, ti)

            return estimate_pose_ensemble(
                dino_apply, dpp, shot_apply, spp,
                fi.pc, fi.valid, fi.count, k_pose, cat, pipe, run_opt=True,
            )

        def once(key, carry):
            est = e2e_full(vit_params, dp, sp, depth0 + carry * 1e-12, rgb0, key)
            return est.translation[0]

        return once

    e2e_full_once = make_e2e_full(stride)
    e2e_s4_once = make_e2e_full(4) if stride != 4 else e2e_full_once

    # ---- geo-only e2e (round-2 headline): no visual frontend
    # desc enters as a jit ARGUMENT like the param trees — a closed-over
    # (8192, 1024) f32 is inlined as a ~32 MB serialized-module constant,
    # the same relay compile-size hazard as closed-over params
    @jax.jit
    def e2e_geo(dpp, spp, desc, depth, key):
        k_pre, k_pose = jax.random.split(key)
        fi = preprocess_frame(
            depth, mask_j, k_j, k_pre,
            res=cat.res, n_max=n, shot_k=pipe.neighbor_k, crop=crop,
        )

        def dino_apply(params, points, ti):
            return dino_m.apply(params, points, desc, ti)

        def shot_apply(params, points, ti):
            return shot_m.apply(params, points, fi.shot, fi.normal, ti)

        return estimate_pose_ensemble(
            dino_apply, dpp, shot_apply, spp,
            fi.pc, fi.valid, fi.count, k_pose, cat, pipe, run_opt=True,
            use_visual=False,
        )

    def e2e_geo_once(key, carry):
        est = e2e_geo(dp, sp, desc_j, depth0 + carry * 1e-12, key)
        return est.translation[0]

    # ---- pose graph only (round-1 headline; features precomputed)
    @jax.jit
    def graph(dpp, spp, desc, shot, nrm, pc, key):
        def dino_apply(params, points, ti):
            return dino_m.apply(params, points, desc, ti)

        def shot_apply(params, points, ti):
            return shot_m.apply(params, points, shot, nrm, ti)

        return estimate_pose_ensemble(
            dino_apply, dpp, shot_apply, spp,
            pc, jnp.ones(n, bool), jnp.int32(n), key, cat, pipe, run_opt=True,
        )

    def graph_once(key, carry):
        est = graph(dp, sp, desc_j, shot0, nrm0, pc0 + carry * 1e-12, key)
        return est.translation[0]

    # compile all
    float(e2e_full_once(jax.random.key(0), 0.0))
    float(e2e_s4_once(jax.random.key(0), 0.0))
    float(e2e_geo_once(jax.random.key(0), 0.0))
    float(graph_once(jax.random.key(0), 0.0))

    e2e_fps = chained_fps(e2e_full_once)
    s4_fps = e2e_fps if stride == 4 else chained_fps(e2e_s4_once)
    geo_fps = chained_fps(e2e_geo_once)
    graph_fps = chained_fps(graph_once)
    inst_rate = bench_multi_instance(rng, stride=stride)

    print(
        json.dumps(
            {
                "metric": "real275_e2e_fps_per_chip",
                "value": round(e2e_fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(e2e_fps / 30.0, 3),
                "vit_stride": stride,
                "stride4_e2e_fps": round(s4_fps, 2),
                "geo_e2e_fps": round(geo_fps, 2),
                "pose_graph_fps": round(graph_fps, 2),
                "instances_per_sec_3x": round(inst_rate, 2),
            }
        )
    )


def bench_multi_instance(rng, n_inst=3, reps=8, stride=8):
    """3 instances in one 480x640 frame through the *driver* path
    (`dispatch_frame`): the production per-image protocol — instances
    grouped by (category, crop tier) into vmapped programs, padded to the
    bucket size, ONE host sync per frame — plus the real per-instance host
    work (mask bbox, crop-tier decision) the fused bench excludes
    (eval.py:132-205 per-image instance loop)."""
    import jax

    from cppf2_tpu.config import PipelineConfig
    from cppf2_tpu.eval.driver import (
        dispatch_frame,
        fetch_frames,
        load_category_models,
    )
    from cppf2_tpu.models.dinov2 import VIT_L14, DinoFeatureExtractor

    pipe = PipelineConfig()
    # mixed frame: 2 mugs + 1 can -> TWO group programs (a batch-2 vmapped
    # mug group and a batch-1 can group), the multi-category dispatch shape
    # REAL275 frames actually have; a single-category frame would hide the
    # per-group overhead, 3 distinct categories would triple the ~5-min
    # ensemble compile for the same coverage
    cats = ["mug", "mug", "can"]
    models = load_category_models(None, sorted(set(cats)))
    ext = DinoFeatureExtractor(
        cfg=dataclasses.replace(
            VIT_L14, attn_impl="pallas",
            quant=os.environ.get("BENCH_VIT_QUANT", "none"),
        ),
        stride=stride,
    )
    ext.init_random(hw=(256, 256))

    centers = [(-0.18, -0.05, 0.95), (0.02, 0.02, 0.85), (0.2, -0.08, 1.05)]
    frames = [
        make_frame(rng, radius=0.09, center=c) for c in centers
    ]
    depth = np.zeros((480, 640), np.float32)
    masks = []
    for d, m in frames:
        depth = np.where(m, d, depth)
        masks.append(m)
    rgb = (rng.uniform(0, 255, (480, 640, 3))).astype(np.uint8)
    dets = [(c, m) for c, m in zip(cats, masks)]

    key = jax.random.key(0)
    # warm: compile + relay stream
    fetch_frames(dispatch_frame(rgb, depth, dets, REAL275_K, models, pipe,
                                key, dino_extractor=ext))
    # depth-2 frame pipeline, exactly the production eval loop
    # (evaluate_real275): frame r+1 dispatches before frame r's fetch
    t0 = time.time()
    done = 0
    prev = None
    for r in range(reps):
        key, sub = jax.random.split(key)
        cur = dispatch_frame(
            rgb, depth, dets, REAL275_K, models, pipe, sub,
            dino_extractor=ext,
        )
        if prev is not None:
            done += sum(o is not None for o in fetch_frames(prev).values())
        prev = cur
    done += sum(o is not None for o in fetch_frames(prev).values())
    dt = time.time() - t0
    assert done == reps * len(masks), "instance(s) rejected in multi-inst bench"
    return done / dt


if __name__ == "__main__":
    main()

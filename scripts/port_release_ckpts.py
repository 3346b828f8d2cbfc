"""One-command port of the reference's released checkpoints.

The day the upstream weights are available (the release trees under
ckpts/{dino,shot}/{cat}-num_more-3/ referenced by eval.py:84-101, stripped
from this mount, plus a DINOv2 ViT-L/14 .pth), this ports everything into the
framework's packed format and dress-rehearses each category through the full
ensemble pose graph:

    python scripts/port_release_ckpts.py --release-root /path/to/ckpts \
        --dino-pth /path/to/dinov2_vitl14_pretrain.pth --out ckpts_ported

then evaluate with

    python -m cppf2_tpu.eval.driver --detections ... --images ... \
        --ckpts ckpts_ported --dino-ckpt ckpts_ported/dinov2_vitl14.pth

Porting paths exercised: models/porting.py (BeyondCPPF Lightning ckpts,
congruence-tested in tests/test_porting.py) and models/dinov2.py::
port_torch_state_dict (grid_sample/forward parity-tested in
tests/test_dinov2.py).
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def port_branches(release_root: str, out_root: str, categories) -> dict:
    """Port every available {branch}/{category} Lightning checkpoint to
    `{out}/{branch}/{cat}/params.msgpack`. Returns {(branch, cat): src}."""
    from cppf2_tpu.config import CATEGORIES
    from cppf2_tpu.eval.driver import _check_hydra_sidecar, _reference_ckpt_path
    from cppf2_tpu.models.porting import load_beyondcppf_checkpoint
    from cppf2_tpu.train.checkpoints import export_params_msgpack

    ported = {}
    for cat_name in categories:
        cat = CATEGORIES[cat_name]
        for branch in ("shot", "dino"):
            src = _reference_ckpt_path(release_root, branch, cat_name)
            if src is None:
                print(f"[port] {branch}/{cat_name}: no checkpoint under "
                      f"{release_root} — skipped")
                continue
            _check_hydra_sidecar(src, cat)
            params = load_beyondcppf_checkpoint(src, branch)
            dst_dir = os.path.join(out_root, branch, cat_name)
            os.makedirs(dst_dir, exist_ok=True)
            dst = export_params_msgpack(
                os.path.join(dst_dir, "params.msgpack"), params
            )
            n = sum(x.size for x in _leaves(params))
            print(f"[port] {branch}/{cat_name}: {src} -> {dst} ({n:,} params)")
            ported[(branch, cat_name)] = src
    return ported


def _leaves(tree):
    import jax

    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def port_dinov2(dino_pth: str, out_root: str) -> str:
    """Validate the DINOv2 .pth ports onto DinoViT (forward smoke on a tiny
    crop) and place it at `{out}/dinov2_vitl14.pth` for --dino-ckpt."""
    import jax.numpy as jnp

    from cppf2_tpu.models.dinov2 import DinoFeatureExtractor, load_dinov2_params

    params = load_dinov2_params(dino_pth)
    assert params is not None, f"cannot load {dino_pth}"
    ext = DinoFeatureExtractor(params=params, stride=8)
    desc = ext(
        jnp.zeros((112, 112, 3), jnp.float32),
        jnp.asarray([[56.0, 56.0]]),
    )
    assert np.isfinite(np.asarray(desc)).all(), "ported ViT emits non-finite"
    dst = os.path.join(out_root, "dinov2_vitl14.pth")
    if os.path.abspath(dino_pth) != os.path.abspath(dst):
        shutil.copyfile(dino_pth, dst)
    print(f"[port] DINOv2 ViT-L/14: {dino_pth} -> {dst} (forward smoke ok)")
    return dst


def dress_rehearsal(out_root: str, categories, dino_pth=None,
                    n_points=1024, num_pairs=2048) -> bool:
    """Drive each ported category through the production driver path on a
    synthetic instance; a finite pose out means the port is live end-to-end
    (accuracy parity then needs only the REAL275 run)."""
    import jax

    from cppf2_tpu.config import PipelineConfig
    from cppf2_tpu.eval.driver import (
        REAL275_INTRINSICS,
        estimate_instance,
        load_category_models,
    )

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_frame  # the synthetic REAL275-scale instance

    models = load_category_models(out_root, list(categories))
    ext = None
    if dino_pth:
        from cppf2_tpu.models.dinov2 import DinoFeatureExtractor, load_dinov2_params

        p = load_dinov2_params(dino_pth)
        if p is not None:
            ext = DinoFeatureExtractor(params=p, stride=8)

    rng = np.random.default_rng(0)
    depth, mask = make_frame(rng, radius=0.09, center=(0.0, 0.0, 0.9))
    rgb = rng.integers(0, 255, (480, 640, 3), np.uint8)
    pipe = PipelineConfig(n_points=n_points, num_pairs=num_pairs, opt_steps=10)
    ok = True
    for cat_name in categories:
        out = estimate_instance(
            rgb, depth, mask, REAL275_INTRINSICS, models[cat_name], cat_name,
            pipe, jax.random.key(0), dino_extractor=ext,
        )
        if out is None:
            print(f"[check] {cat_name}: REJECTED (degenerate?) — FAIL")
            ok = False
            continue
        rt, scales, loss = out
        fin = np.isfinite(rt).all() and np.isfinite(scales).all() and np.isfinite(loss)
        t_err = np.linalg.norm(rt[:3, 3] - [0.0, 0.0, 0.9])
        status = "ok" if fin else "NON-FINITE"
        print(f"[check] {cat_name}: pose {status}, |T - gt_center| = "
              f"{t_err * 100:.1f} cm, recon loss {loss:.4f}")
        ok = ok and bool(fin)
    return ok


def preflight(release_root: str, dino_pth) -> list:
    """Enumerate exactly which external assets are present/missing.

    The standing order (README "External assets"): the moment upstream
    weights appear mounted, run this script, then `evaluate_real275` on the
    real REAL275 set. This check prints one line per expected asset so a
    partial mount fails with a precise inventory instead of a glob miss.
    """
    from cppf2_tpu.config import CATEGORIES
    from cppf2_tpu.eval.driver import _reference_ckpt_path

    missing = []
    for branch in ("shot", "dino"):
        for cat_name in CATEGORIES:
            src = _reference_ckpt_path(release_root, branch, cat_name)
            tag = f"{branch}/{cat_name}"
            if src is None:
                missing.append(tag)
                print(f"[preflight] MISSING {tag}: no last.ckpt under "
                      f"{os.path.join(release_root, branch, cat_name + '-num_more-*')}"
                      f" or {os.path.join(release_root, branch, cat_name)}")
            else:
                print(f"[preflight] found   {tag}: {src}")
    if dino_pth is None:
        missing.append("dinov2_vitl14.pth")
        print("[preflight] MISSING dinov2_vitl14.pth: pass --dino-pth "
              "(torch.hub facebookresearch/dinov2 dinov2_vitl14 weights)")
    elif not os.path.exists(dino_pth):
        missing.append(dino_pth)
        print(f"[preflight] MISSING {dino_pth}: file does not exist")
    else:
        print(f"[preflight] found   DINOv2 .pth: {dino_pth}")
    return missing


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--release-root", required=True,
                    help="upstream ckpts tree: {root}/{shot,dino}/"
                         "{cat}-num_more-3/lightning_logs/.../last.ckpt")
    ap.add_argument("--out", default="ckpts_ported")
    ap.add_argument("--dino-pth", default=None,
                    help="official DINOv2 ViT-L/14 .pth (torch.hub download)")
    ap.add_argument("--categories", nargs="*", default=None)
    ap.add_argument("--skip-check", action="store_true",
                    help="port only; skip the pose dress rehearsal")
    args = ap.parse_args(argv)

    from cppf2_tpu.config import CATEGORIES

    categories = args.categories or list(CATEGORIES)
    missing = preflight(args.release_root, args.dino_pth)
    if missing:
        print(f"[preflight] {len(missing)} asset(s) missing: "
              f"{', '.join(missing)} — porting whatever is present")
    os.makedirs(args.out, exist_ok=True)
    ported = port_branches(args.release_root, args.out, categories)
    if not ported:
        print("[port] nothing ported — check --release-root layout")
        return 1
    dino_dst = None
    if args.dino_pth:
        dino_dst = port_dinov2(args.dino_pth, args.out)
    if not args.skip_check:
        have = sorted({c for (_, c) in ported})
        if not dress_rehearsal(args.out, have, dino_pth=dino_dst):
            return 1
    print(f"[port] done: {len(ported)} branch checkpoints -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

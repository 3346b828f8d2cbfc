"""Measure the one-hot histogram matmul dtype choice on the real chip.

`ops/voting.py::_hist16_matmul` builds its one-hot factors in int8 (2x MXU
rate, half the HBM traffic of bf16) — but CLAUDE.md records that raw
int8 x int8 -> int32 dot_generals are ~50x EMULATED-slow through this
backend at ViT shapes. The histogram is the pose graph's hottest op
(8.4 of 25.7 ms at 50k pairs), so data decides: this bench times the
full histogram step (one-hot construction + contraction, the production
composition) at the production fine-level vote volume for int8, bf16 and
f32 factor dtypes. Counts stay exact in every variant (<= 2^24 votes).

Run on TPU: python scripts/hist_dtype_bench.py
Smoke on CPU: python scripts/hist_dtype_bench.py --cpu --volume 4096
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--volume", type=int, default=600_000,
                    help="vote samples V (production fine level: 50k pairs "
                         "x 12 samples)")
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cppf2_tpu.utils.profiling import chained_timer

    g = 16
    rng = np.random.default_rng(0)
    cand = jnp.asarray(rng.uniform(-0.1, 0.1, size=(args.volume, 3)).astype(np.float32))
    ok = jnp.asarray(rng.uniform(size=args.volume) < 0.95)
    lo = jnp.asarray(np.float32([-0.1, -0.1, -0.1]))
    cell = jnp.asarray(np.float32([0.0125, 0.0125, 0.0125]))

    def hist(dtype, acc, cand, ok, lo, cell):
        ids3 = jnp.floor((cand - lo) / cell + 0.5).astype(jnp.int32)
        inside = jnp.all(ids3 >= 0, -1) & jnp.all(ids3 < g, -1) & ok
        ids3 = jnp.clip(ids3, 0, g - 1)
        ar16 = jnp.arange(g, dtype=jnp.int32)
        x1h = (ids3[:, 0:1] == ar16[None, :]).astype(dtype)
        yz = ids3[:, 1] * g + ids3[:, 2]
        ar256 = jnp.arange(g * g, dtype=jnp.int32)
        yz1h = (yz[:, None] == ar256[None, :]).astype(dtype)
        x1h = x1h * inside.astype(dtype)[:, None]
        counts = jax.lax.dot_general(
            x1h, yz1h, (((0,), (0,)), ((), ())), preferred_element_type=acc
        ).astype(jnp.float32)
        best = jnp.argmax(counts)
        center = lo + jnp.stack(
            [best // (g * g), (best % (g * g)) // g, best % g]
        ).astype(cand.dtype) * cell
        return center, counts.reshape(-1)[best]

    variants = {
        "int8": (jnp.int8, jnp.int32),
        "bf16": (jnp.bfloat16, jnp.float32),
        "f32": (jnp.float32, jnp.float32),
    }

    results = {}
    ref_counts = None
    for name, (dtype, acc) in variants.items():
        fn = jax.jit(functools.partial(hist, dtype, acc))
        center, cnt = fn(cand, ok, lo, cell)
        cnt_host = float(cnt)
        if ref_counts is None:
            ref_counts = cnt_host
        assert cnt_host == ref_counts, (name, cnt_host, ref_counts)

        def chain(a, out):
            # dependency: perturb cand by an output-derived epsilon that is
            # numerically zero (count * 0) so the relay cannot overlap calls
            c, k = out
            return (a[0] + k * 0.0, a[1], a[2], a[3])

        ms = chained_timer(fn, chain, (cand, ok, lo, cell), iters=args.iters)
        results[name] = ms
        print(json.dumps({
            "metric": f"hist16_{name}_ms", "value": round(ms, 4),
            "unit": "ms", "volume": args.volume, "peak_count": cnt_host,
        }))

    best = min(results, key=results.get)
    print(json.dumps({
        "metric": "hist16_best_dtype", "value": best,
        "speedup_vs_int8": round(results["int8"] / results[best], 3),
    }))


if __name__ == "__main__":
    main()

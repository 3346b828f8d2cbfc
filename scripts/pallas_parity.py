"""On-hardware parity + timing check for the Pallas kernels vs XLA formulations.

Run on a TPU host:  python scripts/pallas_parity.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from cppf2_tpu.ops.pallas_kernels import hist16_pallas, sphere_accumulate_pallas


def main():
    rng = np.random.default_rng(0)
    v = 800_000

    # --- histogram parity
    ids3 = jnp.asarray(rng.integers(0, 16, size=(v, 3)).astype(np.int32))
    ok = jnp.asarray(rng.uniform(size=v) > 0.1)

    @jax.jit
    def xla_hist(ids3, ok):
        ar16 = jnp.arange(16, dtype=jnp.int32)
        x1h = (ids3[:, 0:1] == ar16[None, :]).astype(jnp.bfloat16)
        yz = ids3[:, 1] * 16 + ids3[:, 2]
        yz1h = (yz[:, None] == jnp.arange(256, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
        x1h = x1h * ok.astype(jnp.bfloat16)[:, None]
        return jax.lax.dot_general(
            x1h, yz1h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    h_pl = jax.jit(hist16_pallas)(ids3, ok)
    h_xla = xla_hist(ids3, ok)
    err = float(jnp.max(jnp.abs(h_pl - h_xla)))
    tot = float(jnp.sum(h_pl))
    print(f"hist16: max|pallas - xla| = {err}  total={tot} (want {int(np.asarray(ok).sum())})")
    assert err == 0.0

    # --- sphere parity
    dirs = rng.normal(size=(v, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    w = rng.uniform(size=v).astype(np.float32)
    sph = rng.normal(size=(719, 3)).astype(np.float32)
    sph /= np.linalg.norm(sph, axis=-1, keepdims=True)

    @jax.jit
    def xla_sphere(d, w, s):
        cos = jax.lax.dot_general(
            d, s, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        hits = (cos > jnp.cos(jnp.deg2rad(2.0))).astype(jnp.float32)
        return jax.lax.dot_general(
            w[None, :], hits, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]

    c_pl = jax.jit(lambda d, w, s: sphere_accumulate_pallas(d, w, s, 1.0))(
        jnp.asarray(dirs), jnp.asarray(w), jnp.asarray(sph)
    )
    c_xla = xla_sphere(jnp.asarray(dirs), jnp.asarray(w), jnp.asarray(sph))
    rel = float(jnp.max(jnp.abs(c_pl - c_xla)) / (jnp.max(c_xla) + 1e-9))
    print(f"sphere: max rel dev = {rel:.2e}")
    assert rel < 1e-3

    # --- timing (chained)
    def chain_time(f, *args, iters=16):
        o = f(*args)
        np.asarray(jax.tree.leaves(o)[0].ravel()[:1])
        t0 = time.time()
        x = args[0]
        for i in range(iters):
            o = f(x, *args[1:])
            x = x + (jax.tree.leaves(o)[0].ravel()[0] * 0).astype(x.dtype)
        np.asarray(jax.tree.leaves(o)[0].ravel()[:1])
        return (time.time() - t0) / iters * 1000

    t_pl = chain_time(jax.jit(hist16_pallas), ids3, ok)
    t_xla = chain_time(xla_hist, ids3, ok)
    print(f"hist16 timing: pallas {t_pl:.2f} ms vs xla {t_xla:.2f} ms")
    t_pl = chain_time(
        jax.jit(lambda d, w, s: sphere_accumulate_pallas(d, w, s, 1.0)),
        jnp.asarray(dirs), jnp.asarray(w), jnp.asarray(sph),
    )
    t_xla = chain_time(xla_sphere, jnp.asarray(dirs), jnp.asarray(w), jnp.asarray(sph))
    print(f"sphere timing: pallas {t_pl:.2f} ms vs xla {t_xla:.2f} ms")


if __name__ == "__main__":
    main()

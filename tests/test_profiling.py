"""Profiling utility tests (CPU; the relay-specific behavior is documented in
the module docstring and exercised by bench.py on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np

from cppf2_tpu.utils.profiling import StepTimer, chained_timer


class TestChainedTimer:
    def test_measures_positive_time(self):
        f = jax.jit(lambda x: x * 2.0 + 1.0)
        ms = chained_timer(
            f, lambda args, out: (out,), (jnp.ones((8, 8)),), iters=4, warmup=1
        )
        assert ms >= 0.0


class TestStepTimer:
    def test_jsonl_emission(self, tmp_path):
        import json

        p = str(tmp_path / "steps.jsonl")
        t = StepTimer(p)
        r1 = t.tick(1)
        r2 = t.tick(2, extra={"loss": 0.5})
        assert r2["avg_ms"] > 0
        lines = [json.loads(l) for l in open(p)]
        assert lines[1]["loss"] == 0.5

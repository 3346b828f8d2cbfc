"""Tracing & profiling utilities (SURVEY.md §5: the reference has none; this
framework ships jax.profiler integration + honest step timing).

Note on this environment: through the remote-TPU relay, dispatch returns
before execution and `block_until_ready` can be a no-op, so naive timers lie.
`chained_timer` measures the only trustworthy quantity: wall time of a chain
of data-dependent executions with a single final host sync.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Callable, Dict, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def chained_timer(
    fn: Callable,
    chain: Callable,
    args0,
    iters: int = 24,
    warmup: int = 4,
) -> float:
    """Milliseconds per call of `fn`, measured on a dependency chain.

    Args:
        fn: callable taking `args0`-like inputs, returning outputs.
        chain: (args, outputs) -> next args, creating a data dependency so the
            relay cannot overlap or dedup calls.
        args0: initial inputs (tuple).
    """
    import jax

    out = fn(*args0)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0:1])
    args = args0
    for _ in range(warmup):
        out = fn(*args)
        args = chain(args, out)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0:1])

    t0 = time.time()
    args = args0
    for _ in range(iters):
        out = fn(*args)
        args = chain(args, out)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0:1])
    return (time.time() - t0) / iters * 1000.0


class StepTimer:
    """Lightweight EMA step timer + jsonl emitter for training loops."""

    def __init__(self, path: Optional[str] = None, ema: float = 0.98):
        self.path = path
        self.ema = ema
        self._avg = None
        self._last = time.time()

    def tick(self, step: int, extra: Optional[Dict] = None):
        now = time.time()
        dt = now - self._last
        self._last = now
        self._avg = dt if self._avg is None else self.ema * self._avg + (1 - self.ema) * dt
        rec = {"step": step, "step_ms": dt * 1000, "avg_ms": self._avg * 1000}
        if extra:
            rec.update(extra)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return rec

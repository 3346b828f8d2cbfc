"""Checkpoint save/restore via orbax.

Replaces Lightning's ModelCheckpoint(save_last, every 10 epochs)
(train_shot.py:139) + `load_from_checkpoint` (eval.py:92-98) with orbax
PyTree checkpointing of flax params + optax state.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from cppf2_tpu.train.loop import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState, step: Optional[int] = None) -> str:
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(state.step) if step is None else step
    path = os.path.join(ckpt_dir, f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state._asdict(), force=True)
    ckptr.wait_until_finished()
    # refresh the 'last' pointer (reference keeps last.ckpt, train_shot.py:139)
    with open(os.path.join(ckpt_dir, "last"), "w") as f:
        f.write(os.path.basename(path))
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    marker = os.path.join(ckpt_dir, "last")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        return os.path.join(ckpt_dir, f.read().strip())


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), target=template._asdict())
    return TrainState(**restored)


def restore_params(path: str):
    """Restore only model params (for inference drivers) without a template."""
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    return restored["params"]


def export_params_msgpack(path: str, params) -> str:
    """Serialize bare params (flax msgpack) — small, git-friendly artifacts
    for shipping pretrained models (opt state dropped)."""
    import flax.serialization

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(params))
    return path


def load_params_msgpack(path: str, template_params):
    import flax.serialization

    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template_params, f.read())

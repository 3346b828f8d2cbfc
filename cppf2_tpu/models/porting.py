"""Torch -> flax checkpoint porting for the BeyondCPPF branch models.

The reference evaluates from Lightning checkpoints (`last.ckpt`,
eval.py:92-99) whose state_dicts follow the module layout of
train_shot.py:52-73 (SHOT branch) / train_dino.py:64-85 (DINO branch):
`nn.Sequential` stacks of ResLayer (fc1/fc2 + optional fc0 skip projection).
`port_beyondcppf_state_dict` maps such a state_dict onto the matching
`ShotBranch` / `DinoBranch` param pytree so released reference weights can be
evaluated in this framework directly (BASELINE.md parity path (a)).

Accepts torch tensors or numpy arrays as values; torch is only needed to
`torch.load` the file itself (`load_beyondcppf_checkpoint`).
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def _a(x):
    return np.asarray(x.detach().cpu() if hasattr(x, "detach") else x)


def _dense(sd: Dict[str, Any], prefix: str):
    # torch Linear weight (out, in) -> flax Dense kernel (in, out)
    return {
        "kernel": _a(sd[f"{prefix}.weight"]).T.copy(),
        "bias": _a(sd[f"{prefix}.bias"]).copy(),
    }


def _res_layer(sd: Dict[str, Any], prefix: str):
    p = {
        "fc1": _dense(sd, f"{prefix}.fc1"),
        "fc2": _dense(sd, f"{prefix}.fc2"),
    }
    if f"{prefix}.fc0.weight" in sd:  # skip projection when widths differ
        p["proj"] = _dense(sd, f"{prefix}.fc0")
    return p


def _res_mlp(sd: Dict[str, Any], prefix: str):
    idxs = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(rf"{re.escape(prefix)}\.(\d+)\.fc1\.weight$", k))
        }
    )
    if not idxs:
        raise KeyError(f"no ResLayer stack under '{prefix}' in state_dict")
    return {f"res{i}": _res_layer(sd, f"{prefix}.{i}") for i in idxs}


def port_beyondcppf_state_dict(sd: Dict[str, Any], branch: str):
    """Map a BeyondCPPF torch state_dict onto a ShotBranch/DinoBranch pytree.

    Args:
        sd: torch state_dict (Lightning `ckpt["state_dict"]` or a bare
            `model.state_dict()`), values torch tensors or numpy arrays.
        branch: "shot" or "dino".
    Returns:
        {"params": ...} variables dict for the matching flax module.
    """
    if branch not in ("shot", "dino"):
        raise ValueError(f"branch must be 'shot' or 'dino', got {branch!r}")
    params: Dict[str, Any] = {
        "tuple_encoder": _res_mlp(sd, "tuple_encoder"),
        "heads": {
            "logit_encoder": _res_mlp(sd, "logit_encoder"),
            "scale_encoder": _res_mlp(sd, "scale_encoder"),
        },
    }
    if branch == "shot":
        params["shot_encoder"] = _res_mlp(sd, "shot_encoder")
    else:
        params["desc_transform"] = _dense(sd, "desc_transform")
        params["desc_pair_transform"] = _dense(sd, "desc_pair_transform")
    return {"params": params}


def load_beyondcppf_checkpoint(path: str, branch: str):
    """Load a reference Lightning checkpoint (or bare state_dict) from disk.

    Returns None when the file does not exist (weights are optional in this
    environment, like the DINOv2 backbone)."""
    import os

    if not os.path.exists(path):
        return None
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return port_beyondcppf_state_dict(sd, branch)

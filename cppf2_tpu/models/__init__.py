from cppf2_tpu.models.layers import ResLayer, ResMLP
from cppf2_tpu.models.cppf import ShotBranch, DinoBranch, TuplePredictions
from cppf2_tpu.models.porting import (
    load_beyondcppf_checkpoint,
    port_beyondcppf_state_dict,
)

__all__ = [
    "ResLayer",
    "ResMLP",
    "ShotBranch",
    "DinoBranch",
    "TuplePredictions",
    "load_beyondcppf_checkpoint",
    "port_beyondcppf_state_dict",
]

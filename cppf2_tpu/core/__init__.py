from cppf2_tpu.core.binning import real2prob, prob2real
from cppf2_tpu.core.geometry import (
    backproject_masked,
    fibonacci_sphere,
    map_sym,
    map_sym_discrete,
    quat_to_matrix,
    matrix_to_quat,
    rotx,
    roty,
    rotz,
    so3_exp,
)
from cppf2_tpu.core.pairs import pair_targets
from cppf2_tpu.core.downsample import voxel_downsample

__all__ = [
    "real2prob",
    "prob2real",
    "backproject_masked",
    "fibonacci_sphere",
    "map_sym",
    "map_sym_discrete",
    "quat_to_matrix",
    "matrix_to_quat",
    "rotx",
    "roty",
    "rotz",
    "so3_exp",
    "pair_targets",
    "voxel_downsample",
]

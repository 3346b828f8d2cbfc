from cppf2_tpu.eval.iou3d import Box, oriented_iou, iou_with_symmetry
from cppf2_tpu.eval.pose_errors import pose_error_degree_cm
from cppf2_tpu.eval.nocs_map import compute_degree_cm_map


def evaluate_real275_parallel(*args, **kwargs):
    from cppf2_tpu.eval.parallel_eval import evaluate_real275_parallel as f

    return f(*args, **kwargs)


__all__ = [
    "Box",
    "oriented_iou",
    "iou_with_symmetry",
    "pose_error_degree_cm",
    "compute_degree_cm_map",
    "evaluate_real275_parallel",
]

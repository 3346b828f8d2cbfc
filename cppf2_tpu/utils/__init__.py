from cppf2_tpu.utils.viz import draw_pose_overlay

__all__ = ["draw_pose_overlay"]

from cppf2_tpu.data.shapes import make_category_mesh, sample_surface, load_obj
from cppf2_tpu.data.render import splat_render_depth, NOCS_INTRINSICS
from cppf2_tpu.data.synthetic import SyntheticFrameGenerator, SynthFrame

__all__ = [
    "make_category_mesh",
    "sample_surface",
    "load_obj",
    "splat_render_depth",
    "NOCS_INTRINSICS",
    "SyntheticFrameGenerator",
    "SynthFrame",
]

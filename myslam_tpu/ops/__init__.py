from myslam_tpu.ops.plane_sample import sample_atlas  # noqa: F401
from myslam_tpu.ops.composite import sdf2alpha, composite_weights  # noqa: F401

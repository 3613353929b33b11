from myslam_tpu.core import geometry, losses, quaternion, sampling  # noqa: F401

from myslam_tpu.parallel.mesh import make_mesh, ray_dp_sharding  # noqa: F401

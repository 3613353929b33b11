from myslam_tpu.render.renderer import (  # noqa: F401
    SceneGeometry,
    query_raw,
    query_sdf,
    render_rays,
)

from myslam_tpu.models.planes import MapState, PlaneLayout, init_map_state  # noqa: F401
from myslam_tpu.models.decoders import init_decoder_params  # noqa: F401

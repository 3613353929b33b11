"""Model factory (reference API shim).

The reference exposes ``get_model(cfg)`` returning the decoder module
(reference src/networks/config.py:25-32).  The functional analog returns
the initialized decoder parameter pytree; plane atlases are allocated by
models.planes.init_map_state (the reference allocates them in the
orchestrator, src/ESLAM.py:175-218).
"""

from __future__ import annotations

import jax

from myslam_tpu.models.decoders import init_decoder_params


def get_model(cfg: dict, key=None) -> dict:
    """Decoder parameters per the config's model/rendering sections."""
    if key is None:
        key = jax.random.PRNGKey(0)
    c_dim = int(cfg["model"]["c_dim"])
    # beta init is 10 either way; learnable_beta only controls whether the
    # mapper's optimizer updates it (engine/mapper.py multi-transform).
    return init_decoder_params(key, c_dim=c_dim, beta_init=10.0)

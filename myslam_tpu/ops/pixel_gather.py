"""Row-aligned random-pixel gathers from device imagery buffers.

The mapping iteration samples ~4000 random pixels from the keyframe
window every step.  A naive point gather (``buf.reshape(-1)[flat]``)
lowers to per-index transactions on TPU — measured 6.3 ms/iter at the
Replica operating point, a fifth of the whole step.  The fast path on
this hardware is the one the tri-plane atlas gathers use: fetch whole
128-lane native rows and do the last-lane selection on the VPU.

  * scalar maps (depth): gather the (128,)-lane row containing each
    pixel, then take_along_axis the lane            -> ~0.15 ms
  * interleaved RGB (u8/f16, 3 lanes per pixel): a pixel's channels can
    straddle a row boundary, so gather rows r and r+1 (256 lanes) and
    select 3 lanes                                  -> ~1.0 ms

Both are EXACT (same i.i.d. draw, same values) — this is a layout/
lowering fix, not an approximation.  Falls back to point gathers when
the buffer's element count doesn't divide the lane width (the scheduler
pads keyframe capacity so it does).
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

ROW = 128  # TPU native lane width

# In ISOLATION the row path wins 6.3 -> 2.5 ms (the numbers above); in
# the REAL optimizer-carrying mapping step it measured ~5 ms/iter SLOWER
# (29.8 -> 34.7 ms/iter, profile_mapping A/B at the same chip state —
# the wider (R, 256) intermediates lose more to fusion/live-range
# pressure than the row transactions save).  Point gathers are therefore
# the default; the row path stays behind this switch as a recorded
# experiment (PERF.md).
ROW_GATHER = os.environ.get("MYSLAM_ROW_GATHER", "0") == "1"


def gather_scalar(buf: jnp.ndarray, flat: jnp.ndarray) -> jnp.ndarray:
    """buf: any-shape scalar map; flat: (R,) flattened indices -> (R,)."""
    n = int(np.prod(buf.shape))
    if not ROW_GATHER or n % ROW != 0:
        return buf.reshape(-1)[flat]
    rows = buf.reshape(-1, ROW)[flat // ROW]
    return jnp.take_along_axis(rows, (flat % ROW)[:, None], axis=1)[:, 0]


def gather_rgb(buf: jnp.ndarray, flat: jnp.ndarray) -> jnp.ndarray:
    """buf: (..., 3) interleaved; flat: (R,) PIXEL indices -> (R, 3)."""
    n = int(np.prod(buf.shape))
    if not ROW_GATHER or n % ROW != 0:
        return buf.reshape(-1, 3)[flat]
    f3 = flat * 3
    c = buf.reshape(-1, ROW)
    r0 = f3 // ROW
    rows2 = jnp.concatenate(
        [c[r0], c[jnp.minimum(r0 + 1, c.shape[0] - 1)]], axis=1)
    lane = (f3 % ROW)[:, None] + jnp.arange(3)[None, :]
    return jnp.take_along_axis(rows2, lane, axis=1)

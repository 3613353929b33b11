"""Row-aligned pixel gathers == point gathers, exactly (ops/pixel_gather).

The row-gather + lane-select form is a lowering fix (the TPU charges
per gather index; whole 128-lane rows ride its fast path) — the values
must be bit-identical to the naive point gather, including channel
triplets that straddle a 128-lane row boundary and the first/last
element of the buffer.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import myslam_tpu.ops.pixel_gather as pg
from myslam_tpu.ops.pixel_gather import ROW, gather_rgb, gather_scalar


@pytest.fixture(autouse=True)
def _force_row_path(monkeypatch):
    """The row path is opt-in (MYSLAM_ROW_GATHER; slower in the real
    fused step, PERF.md) — these tests exercise it explicitly."""
    monkeypatch.setattr(pg, "ROW_GATHER", True)


def test_gather_scalar_matches_point_gather():
    rng = np.random.default_rng(0)
    S, H, W = 3, 16, 64  # S*H*W = 3072 = 24 rows
    buf = jnp.asarray(rng.normal(size=(S, H, W)).astype(np.float32))
    flat = jnp.asarray(rng.integers(0, S * H * W, size=(257,)))
    flat = jnp.concatenate([flat, jnp.array([0, S * H * W - 1])])
    out = gather_scalar(buf, flat)
    ref = buf.reshape(-1)[flat]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_gather_rgb_matches_point_gather_incl_straddle():
    rng = np.random.default_rng(1)
    S, H, W = 2, 16, 64
    n_px = S * H * W
    buf = jnp.asarray(rng.integers(0, 255, size=(S, H, W, 3))
                      .astype(np.uint8))
    # force straddling indices: pixels whose 3*f crosses a row boundary
    straddle = [p for p in range(n_px) if (3 * p) % ROW >= ROW - 2][:50]
    flat = jnp.asarray(
        np.concatenate([rng.integers(0, n_px, size=(200,)),
                        np.asarray(straddle), [0, n_px - 1]]))
    out = gather_rgb(buf, flat)
    ref = buf.reshape(-1, 3)[flat]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_gather_fallback_non_divisible():
    rng = np.random.default_rng(2)
    buf = jnp.asarray(rng.normal(size=(5, 7, 13)).astype(np.float32))
    flat = jnp.asarray(rng.integers(0, 5 * 7 * 13, size=(31,)))
    np.testing.assert_array_equal(
        np.asarray(gather_scalar(buf, flat)),
        np.asarray(buf.reshape(-1)[flat]))
    buf3 = jnp.asarray(rng.normal(size=(5, 7, 13, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(gather_rgb(buf3, flat)),
        np.asarray(buf3.reshape(-1, 3)[flat]))

"""Native packet encoder vs its numpy fallback (bit-exact contract)."""

import numpy as np
import pytest

from myslam_tpu import native


def _frame(seed=0, H=48, W=64):
    rng = np.random.default_rng(seed)
    color = rng.random((H, W, 3), np.float32)
    depth = rng.random((H, W), np.float32) * 4.0
    depth[rng.random((H, W)) < 0.1] = 0.0
    return color, depth


def test_native_lib_builds():
    assert native.get_lib() is not None, "g++ build of packetenc failed"


def test_encode_color_matches_numpy():
    color, _ = _frame(1)
    ours = native.encode_color_u8(color)
    ref = np.clip(np.rint(color * 255.0), 0, 255).astype(np.uint8)
    # rint rounds half-to-even; the native path rounds half-up.  Exact
    # .5 boundaries are measure-zero for random floats; require equality.
    np.testing.assert_array_equal(ours, ref)


def test_quantize_depth_matches_numpy():
    _, depth = _frame(2)
    q = 60000.0 / max(float(depth.max()), 1e-3)
    ours = native.quantize_depth_u16(depth, q)
    ref = np.where(depth > 0, np.clip(np.rint(depth * q), 1, 65535),
                   0).astype(np.uint16)
    np.testing.assert_array_equal(ours, ref)
    # zeros stay zero; valid depths never map to 0
    assert (ours[depth == 0] == 0).all()
    assert (ours[depth > 0] > 0).all()


def test_gather_pixels_matches_numpy():
    color, depth = _frame(3)
    rng = np.random.default_rng(4)
    i = rng.integers(0, 64, size=(8, 32)).astype(np.uint16)
    j = rng.integers(0, 48, size=(8, 32)).astype(np.uint16)
    c, d, hd = native.gather_pixels(color, depth, i, j)
    jc, ic = j.reshape(-1).astype(np.int64), i.reshape(-1).astype(np.int64)
    ref_c = np.clip(np.rint(color[jc, ic] * 255.0), 0, 255).astype(np.uint8)
    ref_d = depth[jc, ic]
    np.testing.assert_array_equal(c, ref_c)
    np.testing.assert_array_equal(d, ref_d)
    assert hd == bool((depth <= 0).any())


def test_depth_max():
    _, depth = _frame(5)
    assert native.depth_max(depth) == pytest.approx(float(depth.max()))

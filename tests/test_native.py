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


def test_native_raycast_matches_numpy():
    """C++ procedural raycast == numpy reference within sin/cos ulp."""
    from myslam_tpu import native
    from myslam_tpu.utils.datasets import (
        render_analytic, render_analytic_pixels, look_at)

    if native.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    room = np.array([[0.0, 4.0], [0.0, 3.0], [0.0, 2.5]])
    spheres = np.array([[2.6, 1.9, 0.7, 0.5], [1.3, 0.9, 1.6, 0.35]])
    c2w = look_at(np.array([2.2, 1.0, 1.2]),
                  np.array([2.0, 2.5, 1.0])).astype(np.float32)
    H, W, fx, fy, cx, cy = 48, 64, 40.0, 40.0, 31.5, 23.5
    cn, dn = native.render_analytic_frame(
        c2w, H, W, fx, fy, cx, cy, room, spheres)
    cp, dp = render_analytic(c2w, H, W, fx, fy, cx, cy, room, spheres)
    np.testing.assert_allclose(dn, dp, atol=1e-4)
    np.testing.assert_allclose(cn, cp, atol=1e-4)
    # sparse native == dense native at the same pixels (exactly)
    rng = np.random.default_rng(0)
    i = rng.integers(0, W, 200).astype(np.int32)
    j = rng.integers(0, H, 200).astype(np.int32)
    cs, ds = native.render_analytic_px(
        c2w, i, j, fx, fy, cx, cy, room, spheres)
    np.testing.assert_array_equal(ds, dn[j, i])
    np.testing.assert_array_equal(cs, cn[j, i])

"""Plane atlas sampling vs a torch.grid_sample oracle (CPU torch).

The reference's hottest op is F.grid_sample(bilinear, border,
align_corners=True) over 12 planes; our fused-atlas gather must reproduce
it bit-for-bit-ish (fp32 tolerance), including out-of-range clamping and
gradients w.r.t. both the planes and the coordinates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from myslam_tpu.models.planes import ORIENTATIONS, make_layout
from myslam_tpu.ops.plane_sample import sample_atlas

BOUND = [[-1.9, 7.94], [-2.2, 4.52], [-2.5, 2.54]]
C_DIM = 8


def make_atlas_and_planes(layout, seed=0):
    """Random atlas plus equivalent per-plane torch tensors."""
    rng = np.random.default_rng(seed)
    atlas = rng.normal(size=(layout.total_rows, C_DIM)).astype(np.float32)
    planes = []  # [(level, ori)] -> torch (1, C, H, W)
    for lvl in range(layout.n_levels):
        row = []
        for ori in range(3):
            h, w = layout.shapes[lvl][ori]
            off = layout.offsets[lvl][ori]
            p = atlas[off:off + h * w].reshape(h, w, C_DIM)
            row.append(torch.from_numpy(p.transpose(2, 0, 1)[None].copy()))
        planes.append(row)
    return atlas, planes


def torch_reference_features(planes, p_nor):
    """Reference feature computation (src/networks/decoders.py:64-85)."""
    vgrid = torch.from_numpy(p_nor)[None, :, None]  # (1, N, 1, 3)
    feats = []
    for row in planes:
        acc = 0
        for ori, (au, av) in enumerate(ORIENTATIONS):
            g = F.grid_sample(
                row[ori], vgrid[..., [au, av]], padding_mode="border",
                align_corners=True, mode="bilinear",
            ).squeeze().transpose(0, 1)
            acc = acc + g
        feats.append(acc)
    return torch.cat(feats, dim=-1).numpy()


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_grid_sample(seed):
    layout = make_layout(jnp.asarray(BOUND), [0.24, 0.06], C_DIM)
    atlas, planes = make_atlas_and_planes(layout, seed)
    rng = np.random.default_rng(seed + 10)
    # include points outside [-1, 1] to exercise border padding
    p_nor = rng.uniform(-1.3, 1.3, size=(512, 3)).astype(np.float32)

    ours = np.asarray(sample_atlas(jnp.asarray(atlas), layout, jnp.asarray(p_nor)))
    theirs = torch_reference_features(planes, p_nor)
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-5)


def test_atlas_gradient_matches_grid_sample():
    layout = make_layout(jnp.asarray(BOUND), [0.24], C_DIM)
    atlas, planes = make_atlas_and_planes(layout, 3)
    rng = np.random.default_rng(11)
    p_nor = rng.uniform(-1.1, 1.1, size=(128, 3)).astype(np.float32)

    def loss_jax(a):
        return jnp.sum(jnp.sin(sample_atlas(a, layout, jnp.asarray(p_nor))))

    g_ours = np.asarray(jax.grad(loss_jax)(jnp.asarray(atlas)))

    tplanes = [p.clone().requires_grad_(True) for p in planes[0]]
    vgrid = torch.from_numpy(p_nor)[None, :, None]
    acc = 0
    for ori, (au, av) in enumerate(ORIENTATIONS):
        acc = acc + F.grid_sample(
            tplanes[ori], vgrid[..., [au, av]], padding_mode="border",
            align_corners=True, mode="bilinear",
        ).squeeze().transpose(0, 1)
    torch.sum(torch.sin(acc)).backward()

    for ori in range(3):
        h, w = layout.shapes[0][ori]
        off = layout.offsets[0][ori]
        g_plane = g_ours[off:off + h * w].reshape(h, w, C_DIM).transpose(2, 0, 1)
        np.testing.assert_allclose(
            g_plane, tplanes[ori].grad[0].numpy(), atol=2e-5, rtol=1e-4
        )


def test_corner_folding_matches_reduced_path():
    """decode(feat) == decode_corners(corners) with the reduction folded
    into the first decoder layer."""
    import jax.numpy as jnp

    from myslam_tpu.models.decoders import (
        decode_sdf,
        decode_sdf_corners,
        init_decoder_params,
    )
    from myslam_tpu.ops.plane_sample import (
        corner_row_map,
        pack_quad,
        sample_quad,
        sample_quad_corners,
    )

    layout = make_layout(jnp.asarray(BOUND), [0.24, 0.06], C_DIM)
    atlas, _ = make_atlas_and_planes(layout, 7)
    rng = np.random.default_rng(8)
    p_nor = rng.uniform(-1.1, 1.1, size=(256, 3)).astype(np.float32)
    quad = pack_quad(jnp.asarray(atlas), layout)

    params = init_decoder_params(jax.random.PRNGKey(0), c_dim=C_DIM)
    feat = sample_quad(quad, layout, jnp.asarray(p_nor))
    corners = sample_quad_corners(quad, layout, jnp.asarray(p_nor))
    row_map = jnp.asarray(corner_row_map(layout))

    a = np.asarray(decode_sdf(params, feat))
    b = np.asarray(decode_sdf_corners(params, corners, row_map))
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)


def test_reduced_corner_path_matches():
    """decode_corners(sample_quad_reduced, reduced_row_map) equals the
    plain sample_quad + decode path (orientation sum pre-folded)."""
    from myslam_tpu.models.decoders import (
        decode_rgb,
        decode_rgb_corners,
        decode_sdf,
        decode_sdf_corners,
        init_decoder_params,
    )
    from myslam_tpu.ops.plane_sample import (
        pack_quad,
        reduced_row_map,
        sample_quad,
        sample_quad_reduced,
    )

    layout = make_layout(jnp.asarray(BOUND), [0.24, 0.06], C_DIM)
    atlas, _ = make_atlas_and_planes(layout, 9)
    rng = np.random.default_rng(10)
    p_nor = rng.uniform(-1.1, 1.1, size=(256, 3)).astype(np.float32)
    quad = pack_quad(jnp.asarray(atlas), layout)

    params = init_decoder_params(jax.random.PRNGKey(0), c_dim=C_DIM)
    feat = sample_quad(quad, layout, jnp.asarray(p_nor))
    reduced = sample_quad_reduced(quad, layout, jnp.asarray(p_nor))
    row_map = jnp.asarray(reduced_row_map(layout))

    np.testing.assert_allclose(
        np.asarray(decode_sdf(params, feat)),
        np.asarray(decode_sdf_corners(params, reduced, row_map)),
        atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(decode_rgb(params, feat)),
        np.asarray(decode_rgb_corners(params, reduced, row_map)),
        atol=2e-5, rtol=1e-4)


def _run_fused_vs_autodiff(layout, quad, p_nor, gbar):
    from myslam_tpu.ops.plane_sample import sample_fused, sample_quad_reduced

    def run(f):
        def loss(q, p):
            return jnp.sum(f(q, layout, p) * jnp.asarray(gbar))
        v = f(quad, layout, jnp.asarray(p_nor))
        gq, gp = jax.grad(loss, argnums=(0, 1))(quad, jnp.asarray(p_nor))
        return np.asarray(v), np.asarray(gq), np.asarray(gp)

    return run(sample_quad_reduced), run(sample_fused)


def _fused_test_inputs():
    from myslam_tpu.ops.plane_sample import pack_quad

    layout = make_layout(jnp.asarray(BOUND), [0.24, 0.06], C_DIM)
    atlas, _ = make_atlas_and_planes(layout, 13)
    rng = np.random.default_rng(14)
    # include out-of-range points (clip-gradient path) and exact cell
    # corners (floor boundary)
    p_nor = rng.uniform(-1.2, 1.2, size=(300, 3)).astype(np.float32)
    quad = pack_quad(jnp.asarray(atlas), layout)
    gbar = rng.normal(size=(300, layout.n_levels * 4 * C_DIM)).astype(
        np.float32)
    return layout, quad, p_nor, gbar


def test_sample_fused_matches_autodiff(monkeypatch):
    """sample_fused's hand-written VJP == autodiff of sample_quad_reduced
    (values, atlas gradient, and coordinate gradient), with the bf16
    one-hot scatter route disabled so the comparison is exact-fp32."""
    import myslam_tpu.ops.plane_sample as ps

    monkeypatch.setattr(ps, "ONEHOT_MAX_ROWS", 0)
    layout, quad, p_nor, gbar = _fused_test_inputs()
    (v0, gq0, gp0), (v1, gq1, gp1) = _run_fused_vs_autodiff(
        layout, quad, p_nor, gbar)
    np.testing.assert_allclose(v1, v0, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(gq1, gq0, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(gp1, gp0, atol=1e-4, rtol=1e-4)


def test_sample_fused_onehot_scatter_route(monkeypatch):
    """The MXU one-hot gradient route (small planes) matches the exact
    scatter gradient to bf16-rounding tolerance, and only perturbs the
    planes it covers."""
    import myslam_tpu.ops.plane_sample as ps

    layout, quad, p_nor, gbar = _fused_test_inputs()
    assert any(h * w <= ps.ONEHOT_MAX_ROWS
               for lvl in range(layout.n_levels)
               for (h, w) in layout.shapes[lvl]), "no plane takes the route"
    _, (v1, gq1, gp1) = _run_fused_vs_autodiff(layout, quad, p_nor, gbar)
    monkeypatch.setattr(ps, "ONEHOT_MAX_ROWS", 0)
    _, (v0, gq0, gp0) = _run_fused_vs_autodiff(layout, quad, p_nor, gbar)
    np.testing.assert_allclose(v1, v0, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(gp1, gp0, atol=1e-4, rtol=1e-4)
    # atlas grad: bf16 update rounding, relative to the gradient scale
    scale = np.abs(gq0).max()
    np.testing.assert_allclose(gq1, gq0, atol=1.5e-2 * scale)


def test_fused_calls_path_matches_per_plane_path(monkeypatch):
    """FUSE_PLANE_CALLS (one combined gather / one combined fine-plane
    scatter per atlas) is numerically identical to the per-plane-call
    path — same math, different transaction batching."""
    import myslam_tpu.ops.plane_sample as ps

    layout, quad, p_nor, gbar = _fused_test_inputs()
    monkeypatch.setattr(ps, "ONEHOT_MAX_ROWS", 0)
    monkeypatch.setattr(ps, "FUSE_PLANE_CALLS", True)
    _, (v1, gq1, gp1) = _run_fused_vs_autodiff(layout, quad, p_nor, gbar)
    monkeypatch.setattr(ps, "FUSE_PLANE_CALLS", False)
    _, (v0, gq0, gp0) = _run_fused_vs_autodiff(layout, quad, p_nor, gbar)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    np.testing.assert_array_equal(np.asarray(gq1), np.asarray(gq0))
    np.testing.assert_array_equal(np.asarray(gp1), np.asarray(gp0))


def test_coordinate_gradient_matches_grid_sample():
    layout = make_layout(jnp.asarray(BOUND), [0.24], C_DIM)
    atlas, planes = make_atlas_and_planes(layout, 4)
    rng = np.random.default_rng(12)
    p_nor = rng.uniform(-0.95, 0.95, size=(64, 3)).astype(np.float32)

    def loss_jax(p):
        return jnp.sum(jnp.sin(sample_atlas(jnp.asarray(atlas), layout, p)))

    g_ours = np.asarray(jax.grad(loss_jax)(jnp.asarray(p_nor)))

    tp = torch.from_numpy(p_nor).clone().requires_grad_(True)
    vgrid = tp[None, :, None]
    acc = 0
    for ori, (au, av) in enumerate(ORIENTATIONS):
        idx = torch.tensor([au, av])
        acc = acc + F.grid_sample(
            planes[0][ori], vgrid[..., idx], padding_mode="border",
            align_corners=True, mode="bilinear",
        ).squeeze().transpose(0, 1)
    torch.sum(torch.sin(acc)).backward()
    np.testing.assert_allclose(g_ours, tp.grad.numpy(), atol=3e-4, rtol=1e-3)

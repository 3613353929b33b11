"""Offline tool tests: ATE alignment, ICP, recon metrics, rasterizer."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from myslam_tpu.ops.marching import extract_isosurface
from myslam_tpu.tools.eval_ate import evaluate_run, horn_align
from myslam_tpu.tools.eval_recon import calc_3d_metric, icp_p2p
from myslam_tpu.utils.meshmath import (
    make_depth_rasterizer,
    sample_surface,
    subdivide_to_edge,
)
from myslam_tpu.utils.ply import write_ply


def sphere_mesh(n=64, r=0.8, center=(0, 0, 0)):
    xs = np.linspace(-1.2, 1.2, n, dtype=np.float32)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    vol = np.linalg.norm(g - np.asarray(center, np.float32), axis=-1) - r
    sp = xs[1] - xs[0]
    return extract_isosurface(vol, [-1.2, -1.2, -1.2], [sp] * 3)


def test_horn_align_recovers_rigid_transform():
    rng = np.random.default_rng(0)
    traj = rng.normal(size=(50, 3)).cumsum(0)
    R = Rotation.from_euler("xyz", [10, -5, 30], degrees=True).as_matrix()
    t = np.array([1.0, -2.0, 0.5])
    traj2 = traj @ R.T + t
    _, _, err = horn_align(traj.T, traj2.T)
    assert err.max() < 1e-9


def test_evaluate_run_with_nan_gt():
    rng = np.random.default_rng(1)
    n = 30
    gt = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    gt[:, :3, 3] = rng.normal(size=(n, 3))
    est = gt.copy()
    est[:, :3, 3] += rng.normal(size=(n, 3)) * 0.01
    gt[5] = np.nan  # invalid GT pose must be masked, not crash
    res = evaluate_run(est, gt)
    assert res["compared_pose_pairs"] == n - 1
    assert res["absolute_translational_error.rmse"] < 0.05


def test_icp_recovers_small_transform():
    rng = np.random.default_rng(2)
    v, f = sphere_mesh(n=32)
    pts = sample_surface(v, f, 4000, rng)
    R = Rotation.from_euler("xyz", [2, -1, 3], degrees=True).as_matrix()
    t = np.array([0.02, -0.03, 0.01])
    moved = pts @ R.T + t
    T = icp_p2p(moved, pts)
    back = moved @ T[:3, :3].T + T[:3, 3]
    assert np.abs(back - pts).mean() < 0.01


def test_recon_metrics_same_mesh(tmp_path):
    v, f = sphere_mesh()
    p1 = str(tmp_path / "a.ply")
    p2 = str(tmp_path / "b.ply")
    write_ply(p1, v, f)
    write_ply(p2, v, f)
    # NOTE: even identical meshes score ~= the mean nearest-neighbor
    # distance of two independent surface samplings (~1 cm at 20k samples
    # on this sphere) — that noise floor shrinks with sample count.
    r = calc_3d_metric(p1, p2, align=False, num_points=20000)
    assert r["accuracy_cm"] < 1.5
    assert r["completion_cm"] < 1.5
    assert r["completion_ratio_pct"] > 99.0


def test_recon_metrics_detect_deficit(tmp_path):
    v, f = sphere_mesh()
    # reconstruction missing the z>0 hemisphere
    keep = (v[f][:, :, 2] < 0).all(axis=1)
    p1 = str(tmp_path / "rec.ply")
    p2 = str(tmp_path / "gt.ply")
    write_ply(p1, v, f[keep])
    write_ply(p2, v, f)
    r = calc_3d_metric(p1, p2, align=False, num_points=20000)
    assert r["completion_cm"] > 5.0  # missing half the surface
    assert r["completion_ratio_pct"] < 75.0
    assert r["accuracy_cm"] < 2.0  # what exists is accurate (to noise floor)


def test_rasterizer_depth_matches_analytic_sphere():
    v, f = sphere_mesh(n=80, r=0.5)
    v, f = subdivide_to_edge(v, f, 0.02)
    H = W = 200
    fx = fy = 200.0
    cx = cy = 99.5
    render = make_depth_rasterizer(H, W, fx, fy, cx, cy)
    # camera at z=-2 looking along +z (CV convention)
    w2c = np.eye(4)
    w2c[2, 3] = 2.0
    depth = render(v[f], w2c)
    # center pixel depth: 2 - r
    assert abs(depth[100, 100] - 1.5) < 0.02
    # background is empty
    assert depth[5, 5] == 0.0
    # coverage: the sphere disc should be mostly filled
    disc = depth[60:140, 60:140]
    assert (disc > 0).mean() > 0.95


def test_oriented_bounds_recovers_rotated_box():
    """oriented_bounds (reference eval_recon.py:117 protocol dependency):
    recovers a rotated box's true extents, sorted descending, containing
    all points, right-handed."""
    from myslam_tpu.utils.meshmath import oriented_bounds

    rng = np.random.default_rng(0)
    ext_true = np.array([4.0, 2.5, 1.0])
    pts = rng.uniform(-0.5, 0.5, (4000, 3)) * ext_true
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0.0],
                  [np.sin(th), np.cos(th), 0.0],
                  [0.0, 0.0, 1.0]])
    pts = pts @ R.T + np.array([3.0, -1.0, 2.0])
    to_origin, extents = oriented_bounds(pts)
    np.testing.assert_allclose(extents, ext_true, atol=0.05)
    assert (np.diff(extents) <= 1e-9).all()  # sorted descending
    p = pts @ to_origin[:3, :3].T + to_origin[:3, 3]
    assert (np.abs(p) <= extents / 2 + 1e-6).all()
    assert np.linalg.det(to_origin[:3, :3]) > 0


def test_replay_swaps_meshes(tmp_path):
    """Offline replay renders per-frame culled meshes as they appear in
    the run's timeline (reference visualizer_util.py:100-140)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from visualizer import replay
    from myslam_tpu.utils.ply import write_ply

    out = tmp_path / "run"
    (out / "ckpts").mkdir(parents=True)
    (out / "mesh").mkdir()
    n = 20
    est = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    est[:, 0, 3] = np.linspace(0, 1, n)
    np.savez(out / "ckpts" / "00019.npz", idx=n - 1,
             estimate_c2w_list=est, gt_c2w_list=est)
    # two culled meshes appearing at frames 5 and 15 (tiny tetrahedra)
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    write_ply(str(out / "mesh" / "00005_mesh_culled.ply"), v, f)
    write_ply(str(out / "mesh" / "00015_mesh_culled.ply"), v + 0.5, f)

    frames = replay({}, str(out), every=5)
    assert len(frames) == 4  # frames 0, 5, 10, 15
    for p in frames:
        assert os.path.isfile(p)


def test_denoise_observed_points_rejects_outliers():
    """Voxel-vote hull denoising (the reference's TSDF-fusion role,
    Mesher.py:78-112): isolated depth spikes must not inflate the
    observed-space hull; dense surface points and cameras survive."""
    from myslam_tpu.utils.mesher import denoise_observed_points

    rng = np.random.default_rng(0)
    surf = rng.uniform(0, 1, (5000, 3)).astype(np.float32)  # dense slab
    spikes = np.array([[8.0, 8.0, 8.0], [-5.0, 0.2, 0.1]], np.float32)
    cams = np.array([[0.5, 0.5, 2.0]], np.float32)
    pts = np.concatenate([surf, spikes, cams])
    out = denoise_observed_points(pts, n_cams=1, voxel=0.1, min_votes=3)
    assert out.max() <= 2.0  # spikes gone
    assert out.min() >= -0.1
    assert any(np.all(out == cams[0], axis=-1))  # camera kept
    assert len(out) > 4500  # surface survives


def test_depth_l1_2d_metric(tmp_path, capsys):
    from myslam_tpu.tools.eval_recon import calc_2d_metric

    v, f = sphere_mesh()
    p1 = str(tmp_path / "rec.ply")
    p2 = str(tmp_path / "gt.ply")
    write_ply(p1, v, f)
    write_ply(p2, v, f)
    # identical meshes -> ~zero depth L1; no unseen file -> LOUD warning
    r = calc_2d_metric(p1, p2, align=False, n_imgs=8)
    assert r["depth_l1_cm"] < 0.5
    assert "UNRESTRICTED" in capsys.readouterr().err

    # unseen point set present (and far away, so no view is rejected):
    # loads, no warning, same result shape
    np.save(str(tmp_path / "gt_pc_unseen.npy"),
            np.full((10, 3), 100.0, np.float32))
    r2 = calc_2d_metric(p1, p2, align=False, n_imgs=8)
    assert r2["depth_l1_cm"] < 0.5
    assert "UNRESTRICTED" not in capsys.readouterr().err

    # a reconstruction missing a hemisphere scores a real deficit
    keep = (v[f][:, :, 2] < 0).all(axis=1)
    p3 = str(tmp_path / "rec_half.ply")
    write_ply(p3, v, f[keep])
    r3 = calc_2d_metric(p3, p2, align=False, n_imgs=8)
    assert r3["depth_l1_cm"] > 2.0


def test_vertex_visibility_unseen_derivation(tmp_path):
    """The pc_unseen derivation: vertices behind the camera are unseen,
    vertices in front within depth+truncation are seen."""
    from myslam_tpu.tools.cull_mesh import vertex_visibility

    cfg = {"cam": {"H": 60, "W": 80, "fx": 50.0, "fy": 50.0,
                   "cx": 39.5, "cy": 29.5},
           "model": {"truncation": 0.06},
           "meshing": {"eval_rec": True}}
    # camera at origin looking along -z (SLAM convention)
    c2w = np.eye(4, dtype=np.float32)
    depth = np.full((60, 80), 2.0, np.float32)
    verts = np.array([[0.0, 0.0, -1.5],    # in front, before depth: seen
                      [0.0, 0.0, +1.5],    # behind camera: unseen
                      [0.0, 0.0, -3.0]],   # beyond depth+trunc: occluded
                     np.float32)
    seen = vertex_visibility(verts, cfg, [(depth, c2w)])
    assert seen.tolist() == [True, False, False]


def test_frontend_mock_and_headless(tmp_path, monkeypatch):
    """Interactive frontend (reference visualizer_util.py:204): the
    driver API records events through the queue protocol, the backend
    resolver degrades to headless without a display, and the headless
    loop renders live frames from the same event stream."""
    import multiprocessing as mp

    from myslam_tpu.utils.frontend import (
        SLAMFrontend,
        _headless_loop,
        pick_backend,
    )

    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
    assert pick_backend("auto") == "headless"  # no display, no open3d

    fe = SLAMFrontend(str(tmp_path), backend="mock").start()
    pose = np.eye(4)
    fe.update_pose(0, pose, pose)
    fe.update_mesh("m.ply")
    fe.update_pose(10, pose, pose)
    fe.join()
    kinds = [e[0] for e in fe._mock_events]
    assert kinds == ["pose", "mesh", "pose", "close"]

    # headless loop in-process: same events -> live_*.jpg frames
    q = mp.Queue()
    for i in (0, 10):
        q.put(("pose", i, pose, pose))
    q.put(("close",))
    _headless_loop(q, str(tmp_path))
    import glob as g
    assert g.glob(str(tmp_path / "vis" / "live_*.jpg"))

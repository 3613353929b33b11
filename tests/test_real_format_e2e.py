"""End-to-end runs through the REAL dataset readers (VERDICT r1 item 4).

The synthetic scene is exported to actual Replica/TUM directory layouts
on disk, then the full SLAM loop runs through the same reader code path
real datasets use — jpg decode, u16 depth quantization, pose-column
flips, TUM timestamp association + first-pose rebase, crop_size
intrinsics rescale, crop_edge, the (identity-coefficient) undistort
call, every_frame=1 scheduling, and depth holes driving the importance
branch from file data.
"""

import copy
import os

import numpy as np
import pytest

from myslam_tpu.tools.export_synthetic import (
    export_replica,
    export_scannet,
    export_tum,
    transform_bound,
    tum_world_transform,
)
from myslam_tpu.utils.config import load_config

N_FRAMES = 8


def _base_cfg():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(repo, "configs", "Synthetic", "room_smoke.yaml"),
        os.path.join(repo, "configs", "myslam.yaml"))
    cfg = copy.deepcopy(cfg)
    cfg["data"]["n_frames"] = N_FRAMES
    cfg["mapping"]["iters_first"] = 30
    cfg["mapping"]["iters"] = 6
    return cfg


def _run(cfg, out):
    from myslam_tpu.engine.scheduler import SLAMSystem

    slam = SLAMSystem(cfg, output=out, seed=0)
    slam._extract_and_cull_mesh = lambda *a, **k: None  # covered elsewhere
    slam.run()
    t_err = np.linalg.norm(
        slam.estimates[1:, :3, 3] - slam.gt_poses[1:, :3, 3], axis=-1)
    return slam, t_err


def test_replica_layout_e2e(tmp_path):
    cfg = _base_cfg()
    data_dir = str(tmp_path / "replica_data")
    export_replica(cfg, data_dir, n_frames=N_FRAMES)
    assert os.path.isfile(os.path.join(data_dir, "traj.txt"))
    assert os.path.isfile(
        os.path.join(data_dir, "results", "frame000000.jpg"))

    # baseline: the same schedule on the dataset-free synthetic reader
    slam_direct, t_direct = _run(cfg, str(tmp_path / "direct"))

    cfg_r = copy.deepcopy(cfg)
    cfg_r["dataset"] = "replica"
    cfg_r["data"]["input_folder"] = data_dir
    cfg_r["cam"]["png_depth_scale"] = 6553.5
    slam_r, t_replica = _run(cfg_r, str(tmp_path / "replica"))

    # loader correctness: reader-recovered GT poses == generating poses
    from myslam_tpu.utils.datasets import Synthetic

    gt = np.stack(Synthetic(cfg).poses[:N_FRAMES])
    np.testing.assert_allclose(slam_r.gt_poses, gt, atol=1e-5)

    # jpg/u16 quantization costs a little accuracy, not correctness
    assert np.isfinite(t_replica).all()
    assert t_replica.max() < 2.0 * t_direct.max() + 0.01, (
        t_replica, t_direct)


def test_scannet_layout_e2e(tmp_path):
    """ScanNet layout end-to-end (VERDICT r2 item 7): numeric-sorted
    color/depth/pose files, crop_edge 10, 48 stratified samples, depth
    holes, and — the ScanNet-defining quirk — nan/inf GT-pose frames
    flowing through tracking -> checkpoint -> eval_ate masking
    (reference datasets.py:140-167, eval_ate.py:262-281,
    configs/ScanNet/scannet.yaml)."""
    cfg = _base_cfg()
    data_dir = str(tmp_path / "scannet_data")
    invalid = (3, 5)  # frame 0 must stay valid (adopted as start pose)
    export_scannet(cfg, data_dir, n_frames=N_FRAMES,
                   invalid_frames=invalid, holes=True)
    assert os.path.isfile(os.path.join(data_dir, "pose", "0.txt"))

    cfg_s = copy.deepcopy(cfg)
    cfg_s["dataset"] = "scannet"
    cfg_s["data"]["input_folder"] = data_dir
    cfg_s["cam"]["png_depth_scale"] = 1000.0
    # ScanNet-specific knobs (reference configs/ScanNet/scannet.yaml):
    cfg_s["cam"]["crop_edge"] = 10
    cfg_s["rendering"]["n_stratified"] = 48
    slam_s, t_err = _run(cfg_s, str(tmp_path / "scannet"))

    # crop_edge shrank the camera the reference way
    assert (slam_s.cam.H, slam_s.cam.W) == (
        cfg["cam"]["H"] - 20, cfg["cam"]["W"] - 20)
    # invalid GT poses arrived non-finite; everything else finite
    assert not np.isfinite(slam_s.gt_poses[list(invalid)]).all()
    assert np.isfinite(slam_s.estimates).all()
    # depth holes drove the importance branch from file data
    assert any(slam_s.store.has_depthless[:slam_s.store.count])

    # checkpoint -> eval_ate chain: the masking drops exactly the
    # invalid frames and yields a finite ATE on the rest
    from myslam_tpu.tools.eval_ate import convert_poses, evaluate_run
    from myslam_tpu.utils.logger import latest_checkpoint

    ckpt = latest_checkpoint(os.path.join(slam_s.output, "ckpts"))
    data = np.load(ckpt, allow_pickle=True)
    n = int(data["idx"]) + 1
    assert n == N_FRAMES
    _, mask = convert_poses(data["gt_c2w_list"][:n])
    assert sorted(np.nonzero(~mask)[0].tolist()) == sorted(invalid)
    result = evaluate_run(
        data["estimate_c2w_list"][:n], data["gt_c2w_list"][:n])
    rmse = result["absolute_translational_error.rmse"]
    assert result["compared_pose_pairs"] == N_FRAMES - len(invalid)
    assert np.isfinite(rmse)
    assert rmse < 0.05, result

    # masked-frame errors (tracked fine, just not evaluable) are not in
    # the metric; tracked trajectory itself stayed near GT on the valid
    # frames
    valid_err = t_err[[i - 1 for i in range(1, N_FRAMES)
                       if i not in invalid]]
    assert np.isfinite(valid_err).all()


def test_tum_layout_e2e(tmp_path):
    cfg = _base_cfg()
    data_dir = str(tmp_path / "tum_data")
    export_tum(cfg, data_dir, n_frames=N_FRAMES, holes=True)
    assert os.path.isfile(os.path.join(data_dir, "groundtruth.txt"))

    cfg_t = copy.deepcopy(cfg)
    cfg_t["dataset"] = "tumrgbd"
    cfg_t["data"]["input_folder"] = data_dir
    cfg_t["cam"]["png_depth_scale"] = 5000.0
    # TUM-specific paths: distortion (identity coefficients exercise the
    # cv2.undistort branch), crop_size intrinsics rescale, edge crop,
    # every-frame mapping (reference configs/TUM_RGBD/tum.yaml).
    cfg_t["cam"]["distortion"] = [0.0, 0.0, 0.0, 0.0, 0.0]
    cfg_t["cam"]["crop_size"] = [96, 128]
    cfg_t["cam"]["crop_edge"] = 4
    cfg_t["mapping"]["every_frame"] = 1
    cfg_t["mapping"]["keyframe_every"] = 1
    # the reader rebases into a different world frame; move the bound
    A = tum_world_transform(cfg)
    cfg_t["mapping"]["bound"] = transform_bound(cfg["mapping"]["bound"], A)
    cfg_t["mapping"]["marching_cubes_bound"] = cfg_t["mapping"]["bound"]

    slam_t, t_err = _run(cfg_t, str(tmp_path / "tum"))

    # reader semantics: first pose is the flipped identity
    np.testing.assert_allclose(
        slam_t.gt_poses[0], np.diag([1.0, -1.0, -1.0, 1.0]), atol=1e-6)
    # all frames associated and kept (timestamps 1/30 s apart > 1/32)
    assert slam_t.n_img == N_FRAMES
    # exported depth holes flowed through the reader into the engine
    assert any(slam_t.store.has_depthless[:slam_t.store.count])
    assert np.isfinite(t_err).all()
    assert t_err.max() < 0.08, t_err

"""End-to-end SLAM on the synthetic analytic scene (exact ground truth).

The reference has no tests; its verification is end-to-end metrics (ATE,
recon).  This is the equivalent gate at CI scale: a short sequence with
known poses must track within millimetres and produce a map that renders
the observed geometry.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myslam_tpu.engine.scheduler import SLAMSystem
from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def slam(tmp_path_factory):
    cfg = load_config(
        os.path.join(REPO, "configs", "Synthetic", "room_smoke.yaml"),
        DEFAULT_CONFIG)
    cfg["data"]["n_frames"] = 9
    cfg["mapping"]["iters_first"] = 60
    cfg["mapping"]["ckpt_freq"] = 4  # mid-run checkpoint for resume test
    out = str(tmp_path_factory.mktemp("slam_out"))
    system = SLAMSystem(cfg, output=out, seed=0)
    system.run()
    return system


def test_tracking_stays_on_trajectory(slam):
    t_err = np.linalg.norm(
        slam.estimates[:, :3, 3] - slam.gt_poses[:, :3, 3], axis=-1)
    assert t_err[0] == 0.0  # first pose adopted from GT
    assert np.mean(t_err[1:]) < 0.02, t_err
    assert np.max(t_err[1:]) < 0.04, t_err
    # rotation error via trace formula
    R_err = np.einsum("nij,nik->njk", slam.estimates[:, :3, :3],
                      slam.gt_poses[:, :3, :3])
    cos = (np.trace(R_err, axis1=1, axis2=2) - 1) / 2
    ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    assert np.max(ang) < 3.0, ang


def test_map_renders_observed_depth(slam):
    """Rendered depth from the final map must match GT depth closely."""
    from myslam_tpu.core.geometry import rays_from_uv
    from myslam_tpu.render.renderer import render_rays

    color, depth, gt_c2w = slam.dataset.get_frame(0)
    H, W = depth.shape
    rng = np.random.default_rng(0)
    ii = rng.integers(10, W - 10, 400).astype(np.float32)
    jj = rng.integers(10, H - 10, 400).astype(np.float32)
    rays_o, rays_d = rays_from_uv(
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(gt_c2w),
        slam.cam.fx, slam.cam.fy, slam.cam.cx, slam.cam.cy)
    gt_d = jnp.asarray(depth[jj.astype(int), ii.astype(int)])
    d, c, _, _ = render_rays(
        jax.random.PRNGKey(0), slam.map_state, slam.scene,
        rays_o, rays_d, gt_d, importance=False)
    err = np.abs(np.asarray(d) - np.asarray(gt_d))
    assert np.median(err) < 0.02, np.median(err)

    gt_c = color[jj.astype(int), ii.astype(int)]
    cerr = np.abs(np.asarray(c) - gt_c).mean()
    assert cerr < 0.15, cerr


def test_metrics_written(slam):
    recs = [json.loads(l) for l in open(slam.metrics_path)]
    # compile-wall records (utils/compilelog.py) share the file; frame
    # records are the ones carrying a "frame" key.
    recs = [r for r in recs if "frame" in r]
    assert len(recs) == slam.n_img
    assert "map_loss" in recs[0]  # frame 0 mapped
    assert "track_loss_best" in recs[1]
    # mapping losses decrease over the run
    map_losses = [r["map_loss"] for r in recs if "map_loss" in r]
    assert map_losses[-1] < map_losses[0]


def test_keyframes_admitted(slam):
    # frames 0,4,8 are mapped; keyframe_every=4 admits each
    assert slam.store.frame_ids == [0, 4, 8]


def test_full_state_resume(slam, tmp_path):
    """Genuine resume — the capability the reference lacks (its
    checkpoints omit planes/keyframes, SURVEY §5.4).  A fresh system
    restores the mid-run checkpoint and finishes the sequence with
    tracking quality equal to the uninterrupted run."""
    import copy
    import shutil

    from myslam_tpu.utils.logger import latest_checkpoint

    out2 = str(tmp_path / "resume_out")
    os.makedirs(os.path.join(out2, "ckpts"))
    # hand the mid-run checkpoint (frame 4, ckpt_freq gated) to a new run
    src = os.path.join(slam.output, "ckpts", "00004.npz")
    if not os.path.exists(src):  # fall back to any non-final checkpoint
        src = latest_checkpoint(os.path.join(slam.output, "ckpts"))
    shutil.copy(src, os.path.join(out2, "ckpts", os.path.basename(src)))

    cfg = copy.deepcopy(slam.cfg)
    system2 = SLAMSystem(cfg, output=out2, seed=0)
    start = system2.resume()
    assert start > 0
    system2.gt_poses[:start] = slam.gt_poses[:start]
    system2.run(start_idx=start)
    t_err = np.linalg.norm(
        system2.estimates[1:, :3, 3] - system2.gt_poses[1:, :3, 3], axis=-1)
    assert np.mean(t_err) < 0.02, t_err
    assert np.max(t_err) < 0.04, t_err


def test_recon_metrics_against_analytic_gt(slam):
    """Full reconstruction-eval protocol on the synthetic oracle: analytic
    GT mesh -> frustum-cull both meshes -> accuracy/completion (reference
    README.md:99-118 pipeline, dataset-free)."""
    from myslam_tpu.tools.cull_mesh import cull_mesh
    from myslam_tpu.tools.eval_recon import calc_3d_metric
    from myslam_tpu.utils.datasets import Prefetcher

    import copy

    raw = os.path.join(slam.output, "mesh", "final_mesh.ply")
    assert os.path.exists(raw)
    # Eval protocol (reference README.md:104-110): the rec mesh is culled
    # with OCCLUSION (eval_rec) so unobservable regions (behind walls,
    # sphere interiors) don't count against accuracy.
    cfg_rec = copy.deepcopy(slam.cfg)
    cfg_rec["meshing"]["eval_rec"] = True
    frames = ((d, p) for _, (c, d, p) in
              Prefetcher(slam.dataset, range(slam.n_img)))
    rec = cull_mesh(raw, cfg_rec, frames,
                    out_file=os.path.join(slam.output, "rec_eval.ply"))
    gt = os.path.join(slam.output, "gt_mesh.ply")
    slam.dataset.save_gt_mesh(gt, resolution=0.02)
    frames = ((d, p) for _, (c, d, p) in
              Prefetcher(slam.dataset, range(slam.n_img)))
    gt_culled = cull_mesh(gt, slam.cfg, frames)
    m = calc_3d_metric(rec, gt_culled, align=False, num_points=50_000)
    # Observed GT surface is covered to centimetres.
    assert m["completion_cm"] < 6.0, m
    assert m["completion_ratio_pct"] > 70.0, m
    # Accuracy via the analytic oracle, MEDIAN-based: a 9-frame smoke map
    # legitimately grows free-space floaters in barely-supervised regions
    # (mean accuracy is dominated by them at this scale; full-length runs
    # train them away), but the observed surface itself must be tight.
    from myslam_tpu.utils.ply import read_ply

    v, _, _ = read_ply(rec)
    dist = np.abs(slam.dataset.gt_sdf(v))
    assert np.median(dist) < 0.02, np.median(dist)

"""Pipelined track || map mode (parallel.pipeline): full-run validation.

The pipeline overlaps the fused tracking group with the mapping program
on disjoint device sets (the reference's 2-process overlap,
src/ESLAM.py:246-260).  Tracking renders against a map snapshot one
boundary STALE (the staleness the reference tolerates,
src/Tracker.py:212-234), so the gate is trajectory closeness to the
serial run — not bitwise parity.  Runs on the virtual 8-CPU mesh.
"""

import os

import jax
import numpy as np
import pytest

from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config


def _cfg(**parallel):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(repo, "configs", "Synthetic", "room_smoke.yaml"),
        os.path.join(repo, "configs", "myslam.yaml"))
    cfg["data"]["n_frames"] = 13
    cfg["mapping"]["iters_first"] = 30
    cfg["mapping"]["iters"] = 8
    cfg["parallel"].update(parallel)
    return cfg


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_pipeline_matches_serial(tmp_path):
    from myslam_tpu.engine.scheduler import SLAMSystem

    est = {}
    for mode in ("serial", "pipe"):
        cfg = _cfg(pipeline=(mode == "pipe"))
        slam = SLAMSystem(cfg, output=str(tmp_path / mode), seed=0)
        if mode == "pipe":
            assert slam.mesh_T.devices.ravel()[0] != \
                slam.mesh_M.devices.ravel()[0]
        slam.run()
        est[mode] = slam.estimates.copy()
        gt = slam.gt_poses

    assert np.all(np.isfinite(est["pipe"]))
    # Absolute quality: the pipelined trajectory stays near GT.
    ate_pipe = np.linalg.norm(
        est["pipe"][1:, :3, 3] - gt[1:, :3, 3], axis=-1)
    ate_serial = np.linalg.norm(
        est["serial"][1:, :3, 3] - gt[1:, :3, 3], axis=-1)
    assert ate_pipe.max() < 0.05, ate_pipe
    # Staleness tolerance: within a few mm of the serial trajectory and
    # no worse than ~2x its error against GT.
    d = np.linalg.norm(
        est["pipe"][:, :3, 3] - est["serial"][:, :3, 3], axis=-1)
    assert d.max() < 0.02, d
    assert np.sqrt((ate_pipe ** 2).mean()) < \
        2.0 * np.sqrt((ate_serial ** 2).mean()) + 5e-4


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_pipeline_with_dp_submeshes(tmp_path):
    """Pipeline composed with ray DP inside each submesh (2 track + 4
    map devices) — the configuration the >=5x scaling story projects."""
    from myslam_tpu.engine.scheduler import SLAMSystem

    cfg = _cfg(pipeline=True, pipeline_track_devices=2,
               pipeline_map_devices=4)
    cfg["data"]["n_frames"] = 9
    slam = SLAMSystem(cfg, output=str(tmp_path / "pipedp"), seed=0)
    assert slam.mesh_T.size == 2 and slam.mesh_M.size == 4
    slam.run()
    est = slam.estimates
    assert np.all(np.isfinite(est))
    t_err = np.linalg.norm(
        est[1:, :3, 3] - slam.gt_poses[1:, :3, 3], axis=-1)
    assert t_err.max() < 0.05, t_err


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_pipeline_resume(tmp_path):
    """Checkpoint/resume under pipeline placement: state re-lands on the
    submeshes and the run completes."""
    from myslam_tpu.engine.scheduler import SLAMSystem

    cfg = _cfg(pipeline=True)
    cfg["data"]["n_frames"] = 9
    out = str(tmp_path / "ckpt")
    slam = SLAMSystem(cfg, output=out, seed=0)
    slam.ckpt_freq = 4
    slam.no_log_on_first_frame = True
    slam.run()

    slam2 = SLAMSystem(cfg, output=out, seed=0)
    start = slam2.resume()
    assert start > 0
    slam2.run(start)
    est = slam2.estimates
    assert np.all(np.isfinite(est))
    t_err = np.linalg.norm(
        est[1:, :3, 3] - slam2.gt_poses[1:, :3, 3], axis=-1)
    assert t_err.max() < 0.05, t_err

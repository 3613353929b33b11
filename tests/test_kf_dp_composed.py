"""kf_shards x devices composed mesh (VERDICT r4 item 5).

``parallel: {kf_shards: K, devices: D}`` builds one 2-axis ('kf','dp')
mesh: keyframe imagery shards over 'kf' (each row owns its slots'
pixels), each kf row's ray budget splits over its 'dp' columns (distinct
pixel draws via key folding), and every loss/gradient/pose psum reduces
over BOTH axes — lifting pure ray-DP's gradient-ring saturation without
giving up imagery locality (scheduler.py composed_kf_dp;
distributed_ba.make_kf_frame_mapper dp_axis).

Like the single-axis kf mode (tests/test_kf_engine.py), the composed
ray draw is a different — equally valid — stochastic BA than the
replicated mapper's, so the oracle is convergence parity vs the
1-device run plus the exact invariants: finite decreasing losses and a
trajectory matching the single-device product run within tolerance on
the same synthetic sequence.
"""

import os
import tempfile

import numpy as np
import pytest

from myslam_tpu.engine.scheduler import SLAMSystem
from myslam_tpu.utils.config import load_config, update_recursive

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cfg(parallel):
    cfg = load_config(
        os.path.join(REPO, "configs", "Synthetic", "room_smoke.yaml"),
        os.path.join(REPO, "configs", "myslam.yaml"))
    update_recursive(cfg, {
        "data": {"n_frames": 7},
        "cam": {"H": 48, "W": 64, "fx": 40.0, "fy": 40.0,
                "cx": 31.5, "cy": 23.5},
        "tracking": {"pixels": 64, "iters": 2,
                     "ignore_edge_W": 4, "ignore_edge_H": 4,
                     "vis_freq": 10 ** 9},
        "mapping": {"pixels": 128, "iters_first": 6, "iters": 3,
                    "vis_freq": 10 ** 9, "mesh_freq": 10 ** 9},
        "rendering": {"n_stratified": 8, "n_importance": 4},
        "parallel": parallel,
    })
    return cfg


def _run(parallel):
    slam = SLAMSystem(_cfg(parallel),
                      output=tempfile.mkdtemp(prefix="kfdp_"), seed=0)
    slam.ckpt_freq = 10 ** 9
    slam._extract_and_cull_mesh = lambda *a, **k: None
    losses = []
    orig = slam._map_frame

    def rec(idx, pkt, first, cur_has_depthless):
        r = orig(idx, pkt, first, cur_has_depthless)
        losses.append(np.asarray(r["map_loss"][0]))
        return r

    slam._map_frame = rec
    slam.run()
    t_err = np.linalg.norm(
        slam.estimates[1:, :3, 3] - slam.gt_poses[1:, :3, 3], axis=-1)
    return np.concatenate(losses), t_err


def test_composed_kf_dp_mesh_runs_and_converges():
    losses, t_err = _run({"kf_shards": 2, "devices": 4})
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert np.isfinite(t_err).all()

    # Convergence parity vs the single-device product run (different but
    # equally valid ray draws -> tolerance-level, not bitwise).
    losses_1, t_err_1 = _run({})
    assert t_err.max() < 0.5 and t_err_1.max() < 0.5
    assert abs(t_err.max() - t_err_1.max()) < 0.3


def test_composed_mesh_shapes_and_guards():
    # Accepted: 2 x 4 over the 8-device virtual mesh.
    slam = SLAMSystem(_cfg({"kf_shards": 2, "devices": 4}),
                      output=tempfile.mkdtemp(prefix="kfdp_"), seed=0)
    assert slam.mesh.axis_names == ("kf", "dp")
    assert slam.mesh.shape["kf"] == 2 and slam.mesh.shape["dp"] == 4
    assert slam.composed_kf_dp
    # Store capacity still pads to kf_shards (slot axis shards kf-only).
    assert slam.store.capacity % 2 == 0

    # Rejected: map_shards composes with nothing.
    with pytest.raises(ValueError, match="composes"):
        SLAMSystem(_cfg({"map_shards": 2, "devices": 4}),
                   output=tempfile.mkdtemp(prefix="kfdp_"), seed=0)

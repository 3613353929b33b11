"""Packed (u8/u16) keyframe store composed with the parallel modes.

VERDICT r3 item 5: long sequences (ScanNet scene0000 scale) need a
memory-lean keyframe store TOGETHER with a sharded mesh.  The packed
store is that path — these tests run full SLAM loops with
``keyframe_device: cpu`` (= packed) under kf_shards, map_shards, ray DP
and pipeline on the virtual 8-device mesh and check each matches the
float-store run of the same mode to color-quantization tolerance.
"""

import copy
import os

import numpy as np
import pytest

from myslam_tpu.utils.config import load_config, update_recursive


def _cfg(n_frames=5):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(repo, "configs", "Synthetic", "room_smoke.yaml"),
        os.path.join(repo, "configs", "myslam.yaml"))
    cfg = copy.deepcopy(cfg)
    update_recursive(cfg, {
        "data": {"n_frames": n_frames},
        "cam": {"H": 48, "W": 64, "fx": 40.0, "fy": 40.0,
                "cx": 31.5, "cy": 23.5},
        "tracking": {"pixels": 64, "iters": 2,
                     "ignore_edge_W": 4, "ignore_edge_H": 4},
        "mapping": {"pixels": 64, "iters_first": 8, "iters": 4},
    })
    return cfg


def _run(tmp_path, name, parallel, keyframe_device):
    from myslam_tpu.engine.scheduler import SLAMSystem

    cfg = _cfg()
    cfg["parallel"] = parallel
    cfg["keyframe_device"] = keyframe_device
    slam = SLAMSystem(cfg, output=str(tmp_path / name), seed=0)
    slam._extract_and_cull_mesh = lambda *a, **k: None
    slam.run()
    assert np.isfinite(slam.estimates).all()
    return slam


@pytest.mark.parametrize("parallel", [
    {"kf_shards": 4},
    {"map_shards": 2},
    {"devices": 2},
    {"pipeline": True, "pipeline_track_devices": 1,
     "pipeline_map_devices": 1},
], ids=["kf_shards", "map_shards", "ray_dp", "pipeline"])
def test_packed_composes_with_parallel_modes(tmp_path, parallel):
    ref = _run(tmp_path, "float", parallel, "tpu")
    out = _run(tmp_path, "packed", parallel, "cpu")
    assert out.store.packed
    d = np.linalg.norm(
        out.estimates[:, :3, 3] - ref.estimates[:, :3, 3], axis=-1)
    assert d.max() < 5e-3, (parallel, d)
    # trajectory is also sane in absolute terms
    t_err = np.linalg.norm(
        out.estimates[1:, :3, 3] - out.gt_poses[1:, :3, 3], axis=-1)
    assert t_err.max() < 0.5, (parallel, t_err)

"""vis_inside_freq: in-loop panels for tracking and mapping (VERDICT r1
item 7; reference Frame_Visualizer.py:67, Mapper.py:310,
Tracker.py:302)."""

import copy
import glob
import os

import numpy as np

from myslam_tpu.utils.config import load_config


def test_inside_freq_panels_emitted(tmp_path):
    from myslam_tpu.engine.scheduler import SLAMSystem

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(repo, "configs", "Synthetic", "room_smoke.yaml"),
        os.path.join(repo, "configs", "myslam.yaml"))
    cfg = copy.deepcopy(cfg)
    cfg["data"]["n_frames"] = 5
    cfg["mapping"].update(
        iters_first=30, iters=6, vis_freq=4, vis_inside_freq=10,
        no_vis_on_first_frame=False)
    cfg["tracking"].update(vis_freq=2, vis_inside_freq=4)

    out = str(tmp_path / "run")
    slam = SLAMSystem(cfg, output=out, seed=0)
    slam._extract_and_cull_mesh = lambda *a, **k: None
    slam.run()

    # Mapping frame 0 (iters_first=30, chunks of 6): iteration-0 panel
    # plus boundary crossings of multiples of 10 below 30.
    mvis = sorted(os.path.basename(p) for p in
                  glob.glob(os.path.join(out, "mapping_vis", "00000_*.jpg")))
    assert "00000_0000.jpg" in mvis, mvis
    assert "00000_0010.jpg" in mvis, mvis
    assert "00000_0020.jpg" in mvis, mvis
    assert "00000_0030.jpg" not in mvis, mvis  # iteration 30 never runs

    # Tracking vis frames (2, 4): panels at iterations 0 and 4 of 8.
    tvis = sorted(os.path.basename(p) for p in
                  glob.glob(os.path.join(out, "tracking_vis", "*.jpg")))
    assert "00002_0000.jpg" in tvis, tvis
    assert "00002_0004.jpg" in tvis, tvis
    assert "00004_0000.jpg" in tvis, tvis
    # non-vis frames emit nothing
    assert not any(n.startswith("00003") for n in tvis), tvis

#!/usr/bin/env python
"""Keyframe-store placement bench: device vs packed vs host_staged.

VERDICT r3 item 8 asked for the host-keyframe mode's mapped-frame wall
to sit within ~10 % of device mode at ``every_frame: 1`` (the TUM
operating point, reference configs/TUM_RGBD/tum.yaml).  This tool runs
the SAME synthetic sequence at the full Replica frame size with
``every_frame: 1`` under each store placement and reports steady-state
window-level wall per mapped frame (warmup excluded, device queue
drained by the value-fetch barrier — utils/timing.py rationale).

Usage: python -m myslam_tpu.tools.bench_host_mode [--frames 28]
       [--warmup 8] [--modes device cpu host_staged] [--json out.json]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import time


def run_mode(mode: str, frames: int, warmup: int, output: str):
    import numpy as np

    from myslam_tpu.engine.scheduler import SLAMSystem
    from myslam_tpu.utils.config import load_config

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cfg = load_config(os.path.join(repo, "configs", "Synthetic", "room.yaml"),
                      os.path.join(repo, "configs", "myslam.yaml"))
    cfg = copy.deepcopy(cfg)
    cfg["data"]["n_frames"] = frames
    cfg["keyframe_device"] = mode
    # TUM operating point: map every frame, admit every mapped frame
    # (reference configs/TUM_RGBD/tum.yaml every_frame/keyframe_every 1).
    cfg["mapping"]["every_frame"] = 1
    cfg["mapping"]["keyframe_every"] = 1

    slam = SLAMSystem(cfg, output=output, seed=0)
    slam.sync_after_frame = warmup - 1
    t0 = time.time()
    slam.run(finalize=False)
    wall = time.time() - t0

    w = min(warmup, len(slam.frame_start_wall) - 1)
    span = slam.drain_wall - slam.frame_start_wall[w]
    n_steady = len(slam.frame_start_wall) - w
    t_err = np.linalg.norm(
        slam.estimates[1:, :3, 3] - slam.gt_poses[1:, :3, 3], axis=-1)
    rec = {
        "mode": mode,
        "frames": frames,
        "steady_ms_per_mapped_frame": round(span / n_steady * 1e3, 1),
        "fps": round(n_steady / span, 3),
        "ate_rmse_cm": round(float(np.sqrt(np.mean(t_err ** 2)) * 100), 3),
        "wall_s": round(wall, 1),
    }
    if mode == "host_staged":
        rec["cache_misses"] = int(slam.store.cache_misses)
        rec["cache_lines"] = int(slam.store.cache_lines)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=28)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--modes", nargs="+",
                    default=["cpu", "host_staged"])
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--output", type=str, default="/tmp/myslam_hostbench")
    args = ap.parse_args()

    out = []
    for mode in args.modes:
        rec = run_mode(mode, args.frames, args.warmup,
                       os.path.join(args.output, mode))
        print(json.dumps(rec), flush=True)
        out.append(rec)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

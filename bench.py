#!/usr/bin/env python
"""Benchmark: end-to-end SLAM throughput on the synthetic room workload.

Runs the full tracking+mapping pipeline at the reference's Replica
operating point (680x1200 RGB-D, 2000 tracking px x 8 iters, 4000 mapping
px x 15 iters every 4th frame, 40 samples/ray) on real hardware, and
prints ONE JSON line:

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

`vs_baseline` compares against REFERENCE_FPS, the reference ESLAM's
end-to-end Replica throughput. The repo publishes no numbers and CUDA is
unavailable here, so this constant is the paper-derived estimate
(~0.18 s/frame on an RTX 3090-class GPU, arXiv 2211.11704); re-measure
when the reference can be run.
"""

import argparse
import json
import time

import numpy as np

REFERENCE_FPS = 5.5


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=120)
    parser.add_argument("--warmup-frames", type=int, default=24,
                        help="frames excluded from timing (jit compiles)")
    parser.add_argument("--smoke", action="store_true",
                        help="tiny fast configuration for quick checks")
    parser.add_argument("--output", type=str, default="/tmp/myslam_bench")
    args = parser.parse_args()

    import os
    repo = os.path.dirname(os.path.abspath(__file__))
    from myslam_tpu.engine.scheduler import SLAMSystem
    from myslam_tpu.utils.config import load_config

    scene_cfg = ("room_smoke.yaml" if args.smoke else "room.yaml")
    cfg = load_config(
        os.path.join(repo, "configs", "Synthetic", scene_cfg),
        os.path.join(repo, "configs", "myslam.yaml"))
    cfg["data"]["n_frames"] = args.frames

    slam = SLAMSystem(cfg, output=args.output, seed=0)
    slam.final_mesh_subprocess = True
    # Empty the device queue at the warmup boundary so the steady window
    # holds no backlog from the (intentionally heavy) first-frame mapping.
    slam.sync_after_frame = args.warmup_frames - 1
    t0 = time.time()
    slam.run()
    wall = time.time() - t0

    # Steady-state throughput measured WINDOW-LEVEL: from the start of the
    # first post-warmup frame to the device-queue drain.  Per-frame host
    # times would over-count (dispatch is async: queued device work would
    # land in the uncounted drain), so they are only kept in metrics.jsonl
    # for diagnosis.
    w = min(args.warmup_frames, len(slam.frame_start_wall) - 1)
    span = slam.drain_wall - slam.frame_start_wall[w]
    n_steady = len(slam.frame_start_wall) - w
    fps = n_steady / span if span > 0 else 0.0
    times = np.array(slam.frame_times)

    t_err = np.linalg.norm(
        slam.estimates[1:, :3, 3] - slam.gt_poses[1:, :3, 3], axis=-1)
    ate_rmse_cm = float(np.sqrt(np.mean(t_err ** 2)) * 100)

    print(json.dumps({
        "metric": "synthetic_room_e2e_frames_per_s",
        "value": round(float(fps), 3),
        "unit": "frames/s",
        # REFERENCE_FPS is a paper-derived ESTIMATE (CUDA is unavailable
        # here so the reference cannot be measured); see module docstring.
        "vs_baseline": round(float(fps) / REFERENCE_FPS, 3),
        "baseline_kind": "estimate(paper, RTX3090-class)",
        "ate_rmse_cm": round(ate_rmse_cm, 3),
        "frames": len(times),
        "wall_s": round(wall, 1),
    }))


if __name__ == "__main__":
    main()

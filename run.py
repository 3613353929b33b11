#!/usr/bin/env python
"""CLI entry point: python run.py <config.yaml> [--input_folder] [--output].

Mirrors the reference's runner (run.py in MohammadJohari/ESLAM) so the
invocation shape and per-scene configs carry over unchanged.
"""

import argparse

from myslam_tpu.engine.scheduler import SLAMSystem
from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config


def main():
    parser = argparse.ArgumentParser(
        description="Run TPU-native dense RGB-D SLAM.")
    parser.add_argument("config", type=str, help="Path to config file.")
    parser.add_argument("--input_folder", type=str, default=None,
                        help="Overrides the input folder in the config.")
    parser.add_argument("--output", type=str, default=None,
                        help="Overrides the output folder in the config.")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--resume", action="store_true",
                        help="Resume from the newest checkpoint in the "
                             "output folder (full state, incl. the map).")
    args = parser.parse_args()

    cfg = load_config(args.config, DEFAULT_CONFIG)
    slam = SLAMSystem(cfg, input_folder=args.input_folder,
                      output=args.output, seed=args.seed)
    print(f"INFO: output folder: {slam.output}")
    print(f"INFO: frames: {slam.n_img}, "
          f"camera {slam.cam.W}x{slam.cam.H}, "
          f"keyframe capacity {slam.store.capacity}")
    start = slam.resume() if args.resume else 0
    slam.run(start)
    print(f"INFO: done — {slam.fps:.2f} frames/s average")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Offline mesh extraction from a checkpoint.

Resumes the newest full-state checkpoint (the framework checkpoints the
complete map, unlike the reference) and runs the final mesh extraction +
culling exactly as the in-loop path would
(scheduler._extract_and_cull_mesh) — re-mesh any finished or
interrupted run without re-tracking.

CLI: python -m myslam_tpu.tools.final_mesh <config.yaml> [--output DIR]
"""

from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config", type=str)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--input_folder", type=str, default=None)
    args = parser.parse_args()

    from myslam_tpu.engine.scheduler import SLAMSystem
    from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config

    cfg = load_config(args.config, DEFAULT_CONFIG)
    slam = SLAMSystem(cfg, input_folder=args.input_folder,
                      output=args.output)
    start = slam.resume()
    if start == 0:
        raise SystemExit("no checkpoint to mesh from")
    name = ("final_mesh_eval_rec.ply" if slam.eval_rec else "final_mesh.ply")
    import sys
    import time
    t0 = time.time()
    out = slam._extract_and_cull_mesh(
        os.path.join(slam.output, "mesh", name), upto=slam.n_img)
    # Compile-wall breakdown (utils/compilelog.py): meshing cost is
    # dominated by a handful of large program compiles; print them so a
    # timed run shows compile vs compute directly.
    from myslam_tpu.utils import compilelog
    for rec in compilelog.drain():
        print(f"[compile] {rec['fun']} {rec['compile_phase']}: "
              f"{rec['secs']} s", file=sys.stderr)
    print(f"Final mesh written to {out} ({time.time() - t0:.1f} s)")


if __name__ == "__main__":
    main()

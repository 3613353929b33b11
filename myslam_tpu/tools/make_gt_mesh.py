#!/usr/bin/env python
"""Ground-truth mesh generator for the procedural synthetic scenes.

Real datasets ship GT meshes for reconstruction evaluation (reference
README.md:99-118, scripts/download_replica_mesh.sh); the synthetic scene
has an analytic SDF, so its GT mesh is generated exactly.  The output
feeds the standard protocol:

    python -m myslam_tpu.tools.make_gt_mesh configs/Synthetic/room.yaml \
        --output gt.ply [--resolution 0.01] [--cull]
    python -m myslam_tpu.tools.cull_mesh <cfg> --input_mesh gt.ply  # or --cull
    python -m myslam_tpu.tools.eval_recon --rec_mesh R --gt_mesh gt_culled.ply -3d
"""

from __future__ import annotations

import argparse

from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config
from myslam_tpu.utils.datasets import Prefetcher, Synthetic, get_dataset


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config", type=str)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--resolution", type=float, default=0.01)
    parser.add_argument("--cull", action="store_true",
                        help="also write the frustum-culled GT mesh "
                             "(GT poses, all frames)")
    args = parser.parse_args()

    cfg = load_config(args.config, DEFAULT_CONFIG)
    dataset = get_dataset(cfg, None)
    if not isinstance(dataset, Synthetic):
        raise SystemExit("GT meshes can only be generated for synthetic "
                         "scenes; real datasets ship theirs (see "
                         "scripts/download_replica_mesh.sh).")
    path = dataset.save_gt_mesh(args.output, resolution=args.resolution)
    print(f"GT mesh written to {path}")
    if args.cull:
        from myslam_tpu.tools.cull_mesh import cull_mesh

        frames = ((d, p) for _, (c, d, p) in
                  Prefetcher(dataset, range(len(dataset))))
        out = cull_mesh(path, cfg, frames)
        print(f"Culled GT mesh written to {out}")


if __name__ == "__main__":
    main()

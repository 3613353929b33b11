#!/usr/bin/env python
"""One-command reconstruction eval against the analytic GT (synthetic).

Reproduces PERF.md's reconstruction row: generates the analytic GT mesh
for the scene, culls BOTH meshes in the reference's eval_rec mode
(frustum + depth-occlusion — reference src/tools/cull_mesh.py:97-98,
README.md:104-110), and prints the 3-D metrics (reference
src/tools/eval_recon.py protocol).

CLI: python -m myslam_tpu.tools.eval_synthetic_recon <config.yaml>
         --rec_mesh out/mesh/final_mesh.ply [--n-frames 120]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import tempfile


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", type=str)
    ap.add_argument("--rec_mesh", type=str, required=True,
                    help="UNCULLED reconstruction mesh (final_mesh.ply)")
    ap.add_argument("--n-frames", type=int, default=None,
                    help="cull with this many frames (default: config)")
    ap.add_argument("--resolution", type=float, default=0.01,
                    help="GT mesh resolution (m)")
    ap.add_argument("--workdir", type=str, default=None)
    args = ap.parse_args()

    from myslam_tpu.tools.cull_mesh import cull_mesh
    from myslam_tpu.tools.eval_recon import calc_3d_metric
    from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config
    from myslam_tpu.utils.datasets import Prefetcher, Synthetic, get_dataset

    cfg = load_config(args.config, DEFAULT_CONFIG)
    cfg = copy.deepcopy(cfg)
    if args.n_frames:
        cfg["data"]["n_frames"] = args.n_frames
    cfg["meshing"]["eval_rec"] = True

    dataset = get_dataset(cfg, None)
    if not isinstance(dataset, Synthetic):
        raise SystemExit(
            "analytic GT exists only for synthetic scenes; real datasets "
            "ship GT meshes (scripts/download_replica_mesh.sh) — use "
            "tools/cull_mesh + tools/eval_recon directly.")

    wd = args.workdir or tempfile.mkdtemp(prefix="synth_recon_")
    gt_path = dataset.save_gt_mesh(
        os.path.join(wd, "gt_mesh.ply"), resolution=args.resolution)

    def frames():
        return ((d, p) for _, (c, d, p)
                in Prefetcher(dataset, range(len(dataset))))

    rec_culled = cull_mesh(args.rec_mesh, cfg, frames(),
                           out_file=os.path.join(wd, "rec_eval_rec.ply"))
    gt_culled = cull_mesh(gt_path, cfg, frames(),
                          out_file=os.path.join(wd, "gt_eval_rec.ply"))
    result = calc_3d_metric(rec_culled, gt_culled)
    print(json.dumps({"workdir": wd, **result}))


if __name__ == "__main__":
    main()

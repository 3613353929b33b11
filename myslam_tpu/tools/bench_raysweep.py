#!/usr/bin/env python
"""Empirical check of the scaling model's COMPUTE term (VERDICT r4
weak-item 5): measure the mapping chunk's ms/iter as a function of the
per-chip ray count on the real chip.

Under n-way ray DP each chip optimizes the same replicated map on a
4000/n-ray shard of the pixel batch (parallel/mesh.py), so the per-chip
compute share of the projection IS the single-chip iteration time at
R = 4000/n rays.  SCALING.md's project_dp assumed that share divides
linearly (map_iter_ms / n); this sweep replaces the assumption with a
measurement: time the real 15-iter chunk program at R in {4000, 2000,
1000, 500, 250} (the shares at n = 1..16), fit

    t_iter(R) = floor_ms + slope * R

and report the implied compute-only scaling t(4000)/t(4000/n) next to
the model's 1/n.  The intercept is the per-chip fixed floor (scan/ray
bookkeeping, small-batch tiling inefficiency, the dense z-sort) that
strong scaling cannot shard away; tools/scaling_report.py consumes it
via --map-floor-ms / the profile's "map_iter_floor_ms".

The comm term is validated separately (tools/validate_scaling.py reads
collective bytes out of the compiled HLO); together the two cover both
halves of the projection with hardware-anchored inputs.

Usage:
    python -m myslam_tpu.tools.bench_raysweep [--exact] [--json]
        [--out raysweep.json] [--rays 4000,2000,1000,500,250]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import time

import numpy as np


def time_chunk_at(cfg, rays: int, color_topk: int, n_iters: int):
    """Build the mapper at mapping.pixels=rays and time one compiled
    15-iter chunk program (3 reps, value-fetch barrier)."""
    import jax.numpy as jnp

    from myslam_tpu.tools.profile_mapping import build
    from myslam_tpu.utils.timing import barrier

    cfg = copy.deepcopy(cfg)
    cfg["mapping"]["pixels"] = int(rays)
    (jax, jnp, cam, scene, ms, poses, mask, slot_kf, kf_colors,
     kf_depths, mapper, _tracker, _sl, _cl) = build(
         cfg, color_topk=color_topk)
    W = poses.shape[0]
    key = jax.random.PRNGKey(1)
    params = {"map": ms, "poses": jnp.copy(poses)}
    opt_state = mapper.jit_init(params)

    def run_chunk(params, opt_state):
        return mapper.jit_chunk(
            params, opt_state, mask, slot_kf, jnp.int32(W), kf_colors,
            kf_depths, key, jnp.int32(0), jnp.float32(1.0),
            jnp.int32(n_iters), chunk=n_iters)

    params, opt_state, losses = run_chunk(params, opt_state)  # compile
    barrier(losses)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        params, opt_state, losses = run_chunk(params, opt_state)
    barrier(losses)
    return (time.time() - t0) / reps / n_iters * 1e3


def fit_and_rows(rays, iter_ms):
    """Least-squares t(R) = floor + slope*R and the implied DP
    compute-only scaling rows vs the model's linear assumption."""
    A = np.stack([np.ones(len(rays)), np.asarray(rays, float)], axis=1)
    (floor, slope), *_ = np.linalg.lstsq(A, np.asarray(iter_ms), rcond=None)
    floor = float(max(floor, 0.0))
    slope = float(slope)
    r0 = max(rays)
    t0 = iter_ms[rays.index(r0)]
    rows = []
    for n in (1, 2, 4, 8, 16):
        share = r0 // n
        measured = (iter_ms[rays.index(share)]
                    if share in rays else floor + slope * share)
        rows.append({
            "chips": n,
            "rays_per_chip": share,
            "iter_ms_measured" if share in rays else "iter_ms_fit":
                round(measured, 3),
            "compute_speedup_measured": round(t0 / measured, 2),
            "compute_speedup_model_linear": n,
            "efficiency_vs_linear": round(t0 / measured / n, 3),
        })
    return floor, slope, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=str, default="4000,2000,1000,500,250")
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--exact", action="store_true",
                    help="also sweep the reference-exact lane "
                         "(color_topk 0, f32 reads)")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cfg = load_config(
        os.path.join(repo, "configs", "Synthetic", "room.yaml"),
        DEFAULT_CONFIG)
    cfg = copy.deepcopy(cfg)
    cfg["cam"].update(H=680, W=1200, fx=600.0, fy=600.0,
                      cx=599.5, cy=339.5)
    cfg["tracking"]["pixels"] = 2000

    rays = [int(r) for r in args.rays.split(",")]
    topk = int(cfg["rendering"].get("color_topk", 0))

    lanes = [("topk_bf16" if cfg["mapping"].get("map_bf16") else "topk",
              cfg, topk)]
    if args.exact:
        cfg_exact = copy.deepcopy(cfg)
        cfg_exact["mapping"]["map_bf16"] = False
        lanes.append(("exact", cfg_exact, 0))

    report = {"timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                         time.gmtime()),
              "chunk_iters": args.iters, "lanes": {}}
    for name, lane_cfg, k in lanes:
        iter_ms = []
        for r in rays:
            ms = time_chunk_at(lane_cfg, r, k, args.iters)
            iter_ms.append(round(ms, 3))
            print(f"[{name}] R={r}: {ms:.2f} ms/iter", flush=True)
        floor, slope, rows = fit_and_rows(rays, iter_ms)
        report["lanes"][name] = {
            "rays": rays, "iter_ms": iter_ms,
            "fit_floor_ms": round(floor, 3),
            "fit_slope_ms_per_ray": round(slope, 6),
            "fit_floor_frac_of_4000": round(
                floor / iter_ms[rays.index(max(rays))], 3),
            "dp_compute_rows": rows,
        }

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps(report) if args.json else
          json.dumps(report, indent=1))


if __name__ == "__main__":
    main()

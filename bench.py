#!/usr/bin/env python
"""Benchmark: end-to-end SLAM throughput on the synthetic room workload.

Runs the full tracking+mapping pipeline at the reference's Replica
operating point (680x1200 RGB-D, 2000 tracking px x 8 iters, 4000 mapping
px x 15 iters every 4th frame, 40 samples/ray) on real hardware, in BOTH
math lanes by default —

  * top-K color (the validated approximation the synthetic config opts
    into, ``color_topk: 12``): the headline lane;
  * reference-exact (color composited at every sample, exactly the
    reference's math, src/utils/Renderer.py:139-147): ``color_topk: 0``

— and prints ONE JSON line whose top-level fields are the headline
(top-K) lane with the exact lane nested under ``"lanes"`` so the driver
artifact records both fps/ATE pairs (VERDICT r4 item 4).

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
BASELINE_KIND = "estimate(paper, RTX3090-class)"


def run_lane(args, exact: bool, seed: int = 0):
    """One full SLAM run in the given math lane; returns (record, slam)."""
    import os
    repo = os.path.dirname(os.path.abspath(__file__))
    from myslam_tpu.engine.scheduler import SLAMSystem
    from myslam_tpu.utils.config import load_config

    scene_cfg = ("room_smoke.yaml" if args.smoke else "room.yaml")
    cfg = load_config(
        getattr(args, "config", None) or
        os.path.join(repo, "configs", "Synthetic", scene_cfg),
        os.path.join(repo, "configs", "myslam.yaml"))
    cfg["data"]["n_frames"] = args.frames
    if exact:
        cfg["rendering"]["color_topk"] = 0
        # The exact lane is the reference's math end-to-end: f32 map
        # reads too (--map-bf16 can re-enable for investigation).
        cfg["mapping"]["map_bf16"] = False
    if getattr(args, "topk", -1) >= 0 and not exact:
        # Investigation override (e.g. K=39 ~ exact math via the top-K
        # code path — the PERF.md lane-bisect): not a driver lane.
        cfg["rendering"]["color_topk"] = args.topk
    if getattr(args, "map_bf16", False):
        cfg["mapping"]["map_bf16"] = True

    out = args.output + ("_exact" if exact else "")
    slam = SLAMSystem(cfg, output=out, seed=seed)
    # Empty the device queue at the warmup boundary so the steady window
    # holds no backlog from the (intentionally heavy) first-frame mapping.
    slam.sync_after_frame = args.warmup_frames - 1
    t0 = time.time()
    # Loop only: fps and ATE are fully determined at the device-queue
    # drain; the metric line is printed BEFORE checkpoint/mesh
    # finalization so the benchmark artifact exists even if meshing
    # overruns an external budget (round-2 lesson: a final-mesh overrun
    # destroyed the whole artifact).
    slam.run(finalize=False)
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
    frame0_wall = float(times[0]) if len(times) else 0.0

    rec = {
        "math": ("reference-exact (color_topk 0)" if exact
                 else "top-K color (validated approximation)"),
        "value": round(float(fps), 3),
        "unit": "frames/s",
        # REFERENCE_FPS is a paper-derived ESTIMATE (CUDA is unavailable
        # here so the reference cannot be measured); see module docstring.
        "vs_baseline": round(float(fps) / REFERENCE_FPS, 3),
        "baseline_kind": BASELINE_KIND,
        "ate_rmse_cm": round(ate_rmse_cm, 3),
        "frames": len(times),
        "wall_s": round(wall, 1),
        "frame0_wall_s": round(frame0_wall, 1),
        "compile_backend_s": round(float(slam.compile_secs), 1),
        "cache": ("cold" if frame0_wall > args.cold_threshold_s
                  else "warm"),
    }
    return rec, slam


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=120)
    parser.add_argument("--warmup-frames", type=int, default=24,
                        help="frames excluded from timing (jit compiles)")
    parser.add_argument("--smoke", action="store_true",
                        help="tiny fast configuration for quick checks")
    parser.add_argument("--output", type=str, default="/tmp/myslam_bench")
    parser.add_argument("--mesh", choices=("auto", "on", "off"),
                        default="auto",
                        help="final meshing after the metric line: auto "
                        "skips it when the run paid a cold compile cache "
                        "(the metric is already printed either way)")
    parser.add_argument("--cold-threshold-s", type=float, default=90.0,
                        help="frame-0 wall above this means cold cache")
    parser.add_argument("--lanes", choices=("both", "topk", "exact"),
                        default="both",
                        help="math lanes to run; 'both' (default) nests "
                        "the reference-exact lane's numbers under the "
                        "top-K headline in the one JSON line")
    parser.add_argument("--exact", action="store_true",
                        help="alias for --lanes exact (reference-exact "
                        "math only)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--map-bf16", action="store_true",
                        help="bf16 quad-atlas reads in the mapping step "
                             "(mapping.map_bf16) — A/B lane, see PERF.md")
    parser.add_argument("--topk", type=int, default=-1,
                        help="override rendering.color_topk for the "
                        "top-K lane (investigation only)")
    parser.add_argument("--config", type=str, default=None,
                        help="alternate scene yaml (e.g. a TUM-schedule "
                        "synthetic lane); default Synthetic/room[_smoke]")
    args = parser.parse_args()
    if args.exact:
        args.lanes = "exact"

    headline_exact = args.lanes == "exact"
    lanes = {}
    if args.lanes == "both":
        # The exact lane runs FIRST, in its own subprocess, BEFORE this
        # process touches the TPU.  Measured r5: a long run sharing the
        # remote worker with another live client reads ~25 % slow
        # (exact 4.8-4.9 fps when the top-K lane's process was still
        # alive — in-process second lane OR concurrent subprocess —
        # vs 6.50 reproducibly in a fresh process with the previous
        # client exited; the 3-seed studies' sequential processes all
        # read healthy for the same reason).  Sequential isolation with
        # the parent not yet attached makes the nested number identical
        # to a standalone run.
        import os
        import subprocess
        import sys
        cmd = [sys.executable, os.path.abspath(__file__),
               "--lanes", "exact", "--mesh", "off",
               "--frames", str(args.frames),
               "--warmup-frames", str(args.warmup_frames),
               "--seed", str(args.seed),
               "--cold-threshold-s", str(args.cold_threshold_s),
               "--output", args.output + "_exactlane"]
        if args.smoke:
            cmd.append("--smoke")
        if args.config:
            cmd += ["--config", args.config]
        try:
            # Budget scales with the run length: the slowest measured
            # lane (TUM schedule, 5.6 s/frame) plus compile headroom.
            out = subprocess.run(
                cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                text=True, timeout=max(1800, 600 + 15 * args.frames)
            ).stdout
            rec2 = next(json.loads(ln) for ln in out.splitlines()
                        if ln.startswith("{"))
            rec2.pop("lanes", None)
            rec2.pop("metric", None)
            rec2.pop("final_mesh", None)
            lanes["exact"] = rec2
        except Exception as e:  # the headline lane must survive
            lanes["exact"] = {"error": repr(e)}
    rec, slam = run_lane(args, exact=headline_exact, seed=args.seed)
    lanes[("exact" if headline_exact else "topk")] = dict(rec)

    cold = rec["cache"] == "cold"
    do_mesh = args.mesh == "on" or (args.mesh == "auto" and not cold)
    line = {
        "metric": ("synthetic_room_e2e_frames_per_s_exact"
                   if headline_exact
                   else "synthetic_room_e2e_frames_per_s"),
        **rec,
        "lanes": lanes,
        "final_mesh": ("pending" if do_mesh else
                       "skipped(cold-cache)" if args.mesh == "auto"
                       else "skipped(--mesh off)"),
    }
    print(json.dumps(line), flush=True)

    # Finalization (checkpoint + mesh) AFTER the metric line; its output
    # goes to stderr so the metric stays the only stdout line.
    import contextlib
    import sys
    with contextlib.redirect_stdout(sys.stderr):
        try:
            # Tunnel D2H health gate: device-to-host through the
            # remote-TPU link has been measured from ~11 MB/s down to
            # ~0.02 MB/s (degraded states); checkpoint+mesh fetch tens
            # to hundreds of MB, so a degraded link would blow any wall
            # budget.  2 MB probe, ~0.2 s when healthy.
            import jax
            import jax.numpy as jnp
            probe = jnp.arange(512 * 1024, dtype=jnp.float32) + 1.0
            jax.block_until_ready(probe)
            tp = time.time()
            np.asarray(probe)
            d2h_mbps = 2.0 / max(time.time() - tp, 1e-9)
            print(f"d2h probe: {d2h_mbps:.1f} MB/s")
            healthy = d2h_mbps >= 2.0
            if not healthy:
                print("D2H link degraded: skipping final checkpoint "
                      "and mesh (metric line already emitted)")
            t1 = time.time()
            slam.finalize(mesh=do_mesh and healthy, checkpoint=healthy)
            print(f"finalize done ({time.time() - t1:.1f} s)")
        except Exception:
            import traceback
            traceback.print_exc()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Mapping-step profile: measured time vs roofline on the real chip.

Produces the evidence VERDICT r1 asked for (SURVEY §5.1): per-program
wall time at the Replica operating point, XLA's own cost analysis
(FLOPs, bytes accessed), and the implied fraction of the chip's
HBM-bandwidth / MXU rooflines — plus an optional jax.profiler trace for
TensorBoard.

Usage:
    python -m myslam_tpu.tools.profile_mapping [--trace DIR] [--json]

v5e single-chip peaks used for the roofline: ~819 GB/s HBM,
~197 TFLOP/s bf16 / ~98.5 TFLOP/s f32 MXU.
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import time

import numpy as np

HBM_GBPS = 819.0
F32_TFLOPS = 98.5


def build(cfg, color_topk: int = 0):
    import jax
    import jax.numpy as jnp

    from myslam_tpu.core.quaternion import matrix_to_cam_pose
    from myslam_tpu.engine.camera import Camera
    from myslam_tpu.engine.mapper import make_mapper
    from myslam_tpu.engine.scheduler import compute_bound
    from myslam_tpu.engine.tracker import make_tracker
    from myslam_tpu.models.decoders import init_decoder_params
    from myslam_tpu.models.planes import init_map_state, make_layout
    from myslam_tpu.render.renderer import SceneGeometry

    cam = Camera.from_cfg(cfg)
    bound = compute_bound(cfg)
    pres, cres = cfg["planes_res"], cfg["c_planes_res"]
    sdf_layout = make_layout(bound, [pres["coarse"], pres["fine"]], 32)
    color_layout = make_layout(bound, [cres["coarse"], cres["fine"]], 32)
    r = cfg["rendering"]
    scene = SceneGeometry(
        sdf_layout, color_layout, tuple(map(tuple, bound.tolist())),
        float(cfg["model"]["truncation"]), int(r["n_stratified"]),
        int(r["n_importance"]), bool(r["perturb"]),
        color_topk=color_topk)
    key = jax.random.PRNGKey(0)
    ms = init_map_state(key, sdf_layout, color_layout,
                        init_decoder_params(key, c_dim=32))
    W = int(cfg["mapping"]["mapping_window_size"])
    center = bound.mean(axis=1)
    c2ws = jnp.tile(jnp.eye(4), (W, 1, 1)).at[:, :3, 3].set(
        jnp.asarray(center))
    poses = matrix_to_cam_pose(c2ws)
    mask = jnp.ones((W,)).at[0].set(0.0)
    kf_colors = jnp.full((W, cam.H, cam.W, 3), 0.5, jnp.float16)
    kf_depths = jnp.full((W, cam.H, cam.W), 1.5, jnp.float32)
    slot_kf = jnp.arange(W, dtype=jnp.int32)
    mapper = make_mapper(cfg, scene, cam, importance=False)
    tracker = make_tracker(cfg, scene, cam)
    return (jax, jnp, cam, scene, ms, poses, mask, slot_kf, kf_colors,
            kf_depths, mapper, tracker, sdf_layout, color_layout)


def analytic_gather_bytes(scene, n_rays):
    """HBM bytes per mapping iteration from the tri-plane gathers alone
    (fwd row reads + bwd scatter read-modify-write), f32 atlases."""
    n_pts = n_rays * scene.n_samples
    row_b = 4 * scene.sdf_layout.c_dim * 4  # 4C lanes x 4 B
    planes = scene.sdf_layout.n_levels * 3 + scene.color_layout.n_levels * 3
    fwd = n_pts * planes * row_b
    bwd = 2 * fwd  # scatter-add: read + write of touched rows
    return fwd + bwd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", type=str, default=None,
                    help="write a jax.profiler trace to this dir")
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--out", type=str, default=None,
                    help="also write the profile JSON here (e.g. the "
                         "repo-root perf_profile.json that "
                         "tools/scaling_report.py consumes)")
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
    cfg["mapping"]["pixels"] = 4000
    cfg["tracking"]["pixels"] = 2000

    # Two math lanes (PERF.md): reference-exact color (topk 0, forced
    # f32 map reads like bench.py --exact) and the bench-headline
    # approximation lane (top-K + whatever map_bf16 the config says).
    topk = int(cfg["rendering"].get("color_topk", 0))
    cfg_exact = copy.deepcopy(cfg)
    cfg_exact["mapping"]["map_bf16"] = False
    (jax, jnp, cam, scene, ms, poses, mask, slot_kf, kf_colors, kf_depths,
     mapper, tracker, sdf_layout, color_layout) = build(
         cfg_exact, color_topk=0)
    mapper_topk = None
    if topk:
        mapper_topk = build(cfg, color_topk=topk)[10]
    import jax.tree_util as jtu

    key = jax.random.PRNGKey(1)
    W = poses.shape[0]
    n_iters = args.iters

    # Time the CHUNK PROGRAM itself — what the scheduler actually
    # dispatches per mapped frame.  Calling the map_step host wrapper in
    # a timing loop instead (as this tool did through round 4) bills a
    # per-call optimizer.init dispatch plus a ~20-leaf host tree copy at
    # ~3-5 ms tunnel dispatch latency each: it read ~30 ms/iter when the
    # program runs 18.5 (tools/bench_scansteps A/B, PERF.md).  The
    # donation contract makes the rep loop natural: each call consumes
    # the previous call's outputs.
    from myslam_tpu.utils.timing import barrier

    def time_chunk(mpr, ms_in):
        params = {"map": ms_in, "poses": jnp.copy(poses)}
        opt_state = mpr.jit_init(params)

        def run_chunk(params, opt_state):
            return mpr.jit_chunk(
                params, opt_state, mask, slot_kf, jnp.int32(W), kf_colors,
                kf_depths, key, jnp.int32(0), jnp.float32(1.0),
                jnp.int32(n_iters), chunk=n_iters)

        params, opt_state, losses = run_chunk(params, opt_state)  # compile
        barrier(losses)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            params, opt_state, losses = run_chunk(params, opt_state)
        barrier(losses)  # span barrier: amortizes the fetch round-trip
        return (time.time() - t0) / reps * 1e3, params["map"]

    map_ms, ms = time_chunk(mapper, ms)  # donated chain: rebind ms
    map_topk_ms = None
    if mapper_topk is not None:
        map_topk_ms, ms = time_chunk(mapper_topk, ms)

    # tracking step (8 iters x 2000 px)
    t = cfg["tracking"]
    it_n, n_px = int(t["iters"]), int(t["pixels"])
    px_i = jnp.tile(jnp.linspace(2, cam.W - 3, n_px, dtype=jnp.float32),
                    (it_n, 1))
    px_j = jnp.tile(jnp.linspace(2, cam.H - 3, n_px, dtype=jnp.float32),
                    (it_n, 1))
    px_color = jnp.full((it_n, n_px, 3), 128, jnp.uint8)
    px_depth = jnp.full((it_n, n_px), 1.5, jnp.float32)
    tout = tracker(ms, poses[1], px_i, px_j, px_color, px_depth, key)
    barrier(tout[1])
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        tout = tracker(ms, poses[1], px_i, px_j, px_color, px_depth, key)
    barrier(tout[1])
    track_ms = (time.time() - t0) / reps * 1e3

    # Dense-Adam atlas update alone (the part of a mapping iteration
    # that does NOT shard under plain ray DP: every chip updates the
    # full replicated atlases).  Iterated INSIDE one program — a
    # host-loop measurement reads dispatch + tunnel latency (~13 ms!)
    # instead of the actual ~0.1 ms of elementwise HBM work.
    import optax
    OPT_REPS = 200

    opt = optax.adam(1e-3)
    opt_state0 = opt.init(ms)
    grads0 = jtu.tree_map(jnp.ones_like, ms)

    @jax.jit
    def opt_scan(params, opt_state, grads):
        def body(carry, _):
            p, s = carry
            u, s = opt.update(grads, s, p)
            return (optax.apply_updates(p, u), s), jnp.float32(0)

        (p, s), _ = jax.lax.scan(
            body, (params, opt_state), None, length=OPT_REPS)
        return p, s

    p, s = opt_scan(jtu.tree_map(jnp.copy, ms), opt_state0, grads0)
    barrier(jtu.tree_leaves(p)[0])
    t0 = time.time()
    p, s = opt_scan(p, s, grads0)
    barrier(jtu.tree_leaves(p)[0])
    opt_ms = (time.time() - t0) / OPT_REPS * 1e3

    # XLA's own cost model for one mapping chunk
    lowered = mapper.jit_chunk.lower(
        {"map": ms, "poses": poses}, mapper.jit_init(
            {"map": ms, "poses": poses}),
        mask, slot_kf, jnp.int32(W), kf_colors, kf_depths, key,
        jnp.int32(0), jnp.float32(1.0), jnp.int32(n_iters), chunk=n_iters)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_x = float(cost.get("bytes accessed", 0.0))

    per_iter_ms = map_ms / n_iters
    gather_b = analytic_gather_bytes(scene, int(cfg["mapping"]["pixels"]))
    report = {
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        # Exact color lane (reference math, bench.py --exact).
        "map_step_ms": round(map_ms, 2),
        # Split for the scaling model: map_iter_ms (loss+grad, shards
        # under ray DP) vs map_opt_ms (dense Adam atlas update,
        # replicated under DP).  The measured step includes both.
        "map_iter_ms": round(max(per_iter_ms - opt_ms, 0.0), 3),
        # Top-K color lane (what the synthetic bench headline runs).
        "map_step_topk_ms": (round(map_topk_ms, 2)
                             if map_topk_ms is not None else None),
        "map_iter_topk_ms": (
            round(max(map_topk_ms / n_iters - opt_ms, 0.0), 3)
            if map_topk_ms is not None else None),
        "color_topk": topk,
        "map_bf16": bool(cfg["mapping"].get("map_bf16", False)),
        "map_opt_ms": round(opt_ms, 3),
        "track_step_ms": round(track_ms, 2),
        "track_iter_ms": round(track_ms / it_n, 3),
        "xla_flops_per_chunk": flops,
        "xla_bytes_per_chunk": bytes_x,
        "achieved_gbps": round(bytes_x / (map_ms / 1e3) / 1e9, 1)
        if bytes_x else None,
        "hbm_roofline_frac": round(
            bytes_x / (map_ms / 1e3) / 1e9 / HBM_GBPS, 3)
        if bytes_x else None,
        "mxu_f32_frac": round(
            flops / (map_ms / 1e3) / 1e12 / F32_TFLOPS, 4)
        if flops else None,
        "gather_scatter_gb_per_iter": round(gather_b / 1e9, 3),
        "gather_roofline_ms_per_iter": round(
            gather_b / (HBM_GBPS * 1e9) * 1e3, 3),
    }

    if args.trace:
        with jax.profiler.trace(args.trace):
            _, ms = time_chunk(mapper, ms)
        report["trace_dir"] = args.trace

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    if args.json:
        print(json.dumps(report))
    else:
        for k, v in report.items():
            print(f"{k}: {v}")


if __name__ == "__main__":
    main()

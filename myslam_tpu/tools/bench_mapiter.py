#!/usr/bin/env python
"""A/B benchmark of the real mapping iteration under plane-call fusion.

Times jax.value_and_grad of the actual mapping loss (engine/mapper
_build_core) at the Replica operating point (4000 rays x 40 samples,
room-scale atlases), as a scan of several iterations inside one program,
with ops.plane_sample.FUSE_PLANE_CALLS toggled — the microbench
(bench_fusion) measures isolated transactions; this measures the op in
its real dataflow context where XLA can overlap calls.

Usage: python -m myslam_tpu.tools.bench_mapiter [--iters 10]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--modes", type=str, default="0,1",
                    help="comma list of FUSE_PLANE_CALLS settings to time")
    ap.add_argument("--topk", type=int, default=-1,
                    help="override rendering.color_topk (-1 = config)")
    ap.add_argument("--patch", type=int, default=0,
                    help="override mapping.pixel_patch (0 = config)")
    ap.add_argument("--rowgather", type=int, default=0,
                    help="1 = enable the ops/pixel_gather row path for "
                    "the window pixel reads (sets pixel_gather.ROW_GATHER"
                    "; 0 = the default point gathers)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from myslam_tpu.engine.scheduler import enable_compilation_cache
    enable_compilation_cache()

    import copy
    import os

    import myslam_tpu.ops.plane_sample as ps
    from myslam_tpu.core.quaternion import matrix_to_cam_pose
    from myslam_tpu.engine.camera import Camera
    from myslam_tpu.engine.mapper import _build_core
    from myslam_tpu.engine.scheduler import compute_bound
    from myslam_tpu.models.decoders import init_decoder_params
    from myslam_tpu.models.planes import init_map_state, make_layout
    from myslam_tpu.render.renderer import SceneGeometry
    from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cfg = load_config(os.path.join(repo, "configs", "Synthetic", "room.yaml"),
                      DEFAULT_CONFIG)
    cfg = copy.deepcopy(cfg)
    cfg["cam"].update(H=680, W=1200, fx=600.0, fy=600.0,
                      cx=599.5, cy=339.5)
    cfg["mapping"]["pixels"] = 4000
    if args.patch:
        cfg["mapping"]["pixel_patch"] = args.patch
        print(f"pixel_patch={args.patch}", flush=True)

    # ROW_GATHER defaults off via MYSLAM_ROW_GATHER, so the flag must
    # actively flip the module switch in BOTH directions — otherwise
    # rowgather=1 vs rowgather=0 would silently time identical code.
    import myslam_tpu.ops.pixel_gather as pg
    pg.ROW_GATHER = bool(args.rowgather)
    print(f"rowgather={int(args.rowgather)} "
          f"({'row-aligned' if args.rowgather else 'naive point'} "
          "gathers)", flush=True)

    cam = Camera.from_cfg(cfg)
    bound = compute_bound(cfg)
    pres, cres = cfg["planes_res"], cfg["c_planes_res"]
    sdf_layout = make_layout(bound, [pres["coarse"], pres["fine"]], 32)
    color_layout = make_layout(bound, [cres["coarse"], cres["fine"]], 32)
    r = cfg["rendering"]
    topk = int(r.get("color_topk", 0)) if args.topk < 0 else args.topk
    scene = SceneGeometry(
        sdf_layout, color_layout, tuple(map(tuple, bound.tolist())),
        float(cfg["model"]["truncation"]), int(r["n_stratified"]),
        int(r["n_importance"]), bool(r["perturb"]), color_topk=topk)
    print(f"color_topk={topk}", flush=True)
    key = jax.random.PRNGKey(0)
    ms = init_map_state(key, sdf_layout, color_layout,
                        init_decoder_params(key, c_dim=32))
    W = int(cfg["mapping"]["mapping_window_size"])
    center = bound.mean(axis=1)
    c2ws = jnp.tile(jnp.eye(4), (W, 1, 1)).at[:, :3, 3].set(
        jnp.asarray(center))
    poses = matrix_to_cam_pose(c2ws)
    pose_mask = jnp.ones((W,)).at[0].set(0.0)
    slot_kf = jnp.arange(W, dtype=jnp.int32)
    kf_colors = jnp.full((W, cam.H, cam.W, 3), 0.5, jnp.float16)
    kf_depths = jnp.full((W, cam.H, cam.W), 1.5, jnp.float32)
    jax.block_until_ready(kf_depths)

    n_it = args.iters
    results = {}
    for mode in [int(x) for x in args.modes.split(",")]:
        ps.FUSE_PLANE_CALLS = bool(mode)
        loss_fn, _ = _build_core(cfg, scene, cam, importance=False)

        @jax.jit
        def grads_scan(params):
            def step(acc, it):
                k = jax.random.fold_in(key, it)
                loss, g = jax.value_and_grad(loss_fn)(
                    params, pose_mask, slot_kf, jnp.int32(W),
                    kf_colors, kf_depths, k)
                # consume the grads so nothing is dead-code-eliminated
                s = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
                return acc + loss + s, ()
            acc, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(n_it))
            return acc

        params = {"map": ms, "poses": poses}
        from myslam_tpu.utils.timing import barrier

        t0 = time.time()
        out = grads_scan(params)
        barrier(out)
        compile_s = time.time() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            out = grads_scan(params)
            barrier(out)  # value fetch: block_until_ready lies via axon
            best = min(best, (time.time() - t0) / n_it * 1e3)
        results[mode] = best
        print(f"fuse={mode}: {best:.3f} ms/iter "
              f"(first call incl. compile {compile_s:.1f} s)", flush=True)

    if len(results) == 2:
        print(f"speedup fused/sep: {results[0] / results[1]:.3f}x",
              flush=True)


if __name__ == "__main__":
    main()

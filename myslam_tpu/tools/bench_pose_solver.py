#!/usr/bin/env python
"""Equal-WALL-CLOCK adam-vs-schur comparison for the kf-partitioned BA.

VERDICT r2 item 9: the Schur pose step costs ~1.24x an Adam iteration at
the operating point, so convergence-per-iteration alone cannot justify
it — this tool gives both solvers the SAME seconds (not the same
iterations) on the same perturbed-pose scenario the unit gates use
(tests/test_distributed_ba.py) and reports pose error vs wall time.

Scenario: smoke-scale synthetic map trained at true poses; window slot 2
perturbed ~4 cm/RT; each solver runs chunks of BA until the wall budget
is spent; the recovered translation error is sampled after every chunk.

Needs >= --shards devices (use the virtual CPU mesh:
XLA_FLAGS=--xla_force_host_platform_device_count=8).

Usage: python -m myslam_tpu.tools.bench_pose_solver [--budget-s 10]
       [--chunk 8] [--shards 4] [--json out.json]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget-s", type=float, default=10.0,
                    help="wall seconds granted to EACH solver")
    ap.add_argument("--chunk", type=int, default=8,
                    help="BA iterations per dispatched chunk")
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    import jax
    if "host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from myslam_tpu.core.quaternion import (
        cam_pose_to_matrix,
        matrix_to_cam_pose,
    )
    from myslam_tpu.engine.camera import Camera
    from myslam_tpu.models.decoders import init_decoder_params
    from myslam_tpu.models.planes import init_map_state, make_layout
    from myslam_tpu.parallel.distributed_ba import (
        make_distributed_ba,
        shard_keyframes,
    )
    from myslam_tpu.render.renderer import SceneGeometry
    from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config
    from myslam_tpu.utils.datasets import Synthetic

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cfg = load_config(
        os.path.join(repo, "configs", "Synthetic", "room_smoke.yaml"),
        DEFAULT_CONFIG)
    cfg = copy.deepcopy(cfg)
    cfg["cam"].update(H=48, W=64, fx=40.0, fy=40.0, cx=31.5, cy=23.5)
    cfg["data"]["n_frames"] = 16
    cfg["mapping"]["pixels"] = 512
    ds = Synthetic(cfg)
    cam = Camera.from_cfg(cfg)

    bound = np.array(cfg["mapping"]["bound"], np.float32)
    layout_s = make_layout(jnp.asarray(bound), [0.48, 0.12], 8)
    layout_c = make_layout(jnp.asarray(bound), [0.48, 0.12], 8)
    scene = SceneGeometry(layout_s, layout_c,
                          tuple(map(tuple, bound.tolist())),
                          0.06, 12, 4, True)
    key = jax.random.PRNGKey(0)
    ms0 = init_map_state(key, layout_s, layout_c,
                         init_decoder_params(key, c_dim=8))

    frames = [ds.get_frame(i) for i in (0, 5, 10, 15)]
    kf_colors = jnp.asarray(np.stack([f[0] for f in frames]), jnp.float16)
    kf_depths = jnp.asarray(np.stack([f[1] for f in frames]))
    poses_true = matrix_to_cam_pose(
        jnp.asarray(np.stack([f[2] for f in frames])))

    mesh = Mesh(np.array(jax.devices()[:args.shards]), ("kf",))
    kf_c, kf_d = shard_keyframes(mesh, kf_colors, kf_depths)
    slot_kf = jnp.arange(4, dtype=jnp.int32)
    n_slots = jnp.int32(4)

    # Pre-train the map at true poses (both solvers start identical).
    ba_train = make_distributed_ba(
        cfg, scene, cam, mesh, iters=60, pose_solver="adam")
    frozen = jnp.zeros((4,))
    ms = ms0
    for r in range(3):
        ms, _, _ = ba_train(ms, poses_true, frozen, slot_kf, n_slots,
                            kf_c, kf_d, jax.random.PRNGKey(100 + r))
    jax.block_until_ready(ms.sdf_atlas)
    ms_base = jax.tree_util.tree_map(jnp.copy, ms)

    rng = np.random.default_rng(1)
    poses_pert = np.asarray(poses_true).copy()
    poses_pert[2, 4:] += rng.normal(scale=0.025, size=3)
    poses_pert[2, :4] += rng.normal(scale=0.012, size=4)
    mask = jnp.asarray([0.0, 0.0, 1.0, 0.0])

    def t_err(p7):
        c_est = np.asarray(cam_pose_to_matrix(jnp.asarray(p7)))[2]
        c_true = np.asarray(cam_pose_to_matrix(poses_true))[2]
        return float(np.linalg.norm(c_est[:3, 3] - c_true[:3, 3]))

    out = {"budget_s": args.budget_s, "chunk": args.chunk,
           "err_initial_m": t_err(poses_pert), "solvers": {}}
    for solver in ("adam", "schur", "schur@4"):
        interval = 1
        if "@" in solver:
            interval = int(solver.split("@")[1])
        ba = make_distributed_ba(
            cfg, scene, cam, mesh, iters=args.chunk,
            pose_solver=solver.split("@")[0], schur_interval=interval)
        ms = jax.tree_util.tree_map(jnp.copy, ms_base)
        poses = jnp.asarray(poses_pert)
        # warm-up compile (not billed)
        ms_w = jax.tree_util.tree_map(jnp.copy, ms)
        ms_w, p_w, l_w = ba(ms_w, poses, mask, slot_kf, n_slots,
                            kf_c, kf_d, jax.random.PRNGKey(7))
        np.asarray(l_w)  # value fetch: trustworthy completion barrier

        trace = []
        iters_done = 0
        t0 = time.time()
        while time.time() - t0 < args.budget_s:
            ms, poses, losses = ba(ms, poses, mask, slot_kf, n_slots,
                                   kf_c, kf_d,
                                   jax.random.PRNGKey(7 + iters_done))
            np.asarray(losses)  # value fetch barrier
            iters_done += args.chunk
            trace.append({"wall_s": round(time.time() - t0, 3),
                          "iters": iters_done,
                          "err_m": round(t_err(poses), 5)})
        wall = time.time() - t0
        out["solvers"][solver] = {
            "iters_done": iters_done,
            "wall_s": round(wall, 2),
            "ms_per_iter": round(wall / max(iters_done, 1) * 1e3, 2),
            "err_final_m": trace[-1]["err_m"] if trace else None,
            "trace": trace,
        }
        print(f"{solver}: {iters_done} iters in {wall:.1f} s -> "
              f"err {out['solvers'][solver]['err_final_m']} m "
              f"(from {out['err_initial_m']:.4f})", flush=True)

    errs = {k: v["err_final_m"] for k, v in out["solvers"].items()
            if v["err_final_m"] is not None}
    out["winner_at_equal_wall"] = min(errs, key=errs.get) if errs else None
    print("winner at equal wall:", out["winner_at_equal_wall"])
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

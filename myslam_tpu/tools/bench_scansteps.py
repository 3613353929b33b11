#!/usr/bin/env python
"""A/B the iteration-scan wrapper around the mapping step.

profile_components puts the bare loss+grad at ~23 ms/iter while the
real chunk program (_scan_steps inside make_mapper) measures ~30 —
this tool times _scan_steps variants at the Replica operating point to
attribute that gap:

  nocond   loss+grad+optax update, total=None (no masked-tail branch)
  cond     the production form: every iteration wrapped in
           lax.cond(it < total, ...) for the ragged first-frame tail

Usage: python -m myslam_tpu.tools.bench_scansteps [--iters 15]
"""

from __future__ import annotations

import argparse
import copy
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--rng", type=str, default="threefry2x32",
                    choices=("threefry2x32", "rbg"),
                    help="PRNG impl for the in-iteration draws (rbg is "
                    "hardware-accelerated on TPU)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from myslam_tpu.engine.scheduler import enable_compilation_cache
    enable_compilation_cache()

    from myslam_tpu.core.quaternion import matrix_to_cam_pose
    from myslam_tpu.engine.camera import Camera
    from myslam_tpu.engine.mapper import _build_core, _scan_steps
    from myslam_tpu.engine.scheduler import compute_bound
    from myslam_tpu.models.decoders import init_decoder_params
    from myslam_tpu.models.planes import init_map_state, make_layout
    from myslam_tpu.render.renderer import SceneGeometry
    from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config
    from myslam_tpu.utils.timing import barrier

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cfg = load_config(os.path.join(repo, "configs", "Synthetic", "room.yaml"),
                      DEFAULT_CONFIG)
    cfg = copy.deepcopy(cfg)
    cfg["cam"].update(H=680, W=1200, fx=600.0, fy=600.0,
                      cx=599.5, cy=339.5)
    cfg["mapping"]["pixels"] = 4000

    cam = Camera.from_cfg(cfg)
    bound = compute_bound(cfg)
    pres, cres = cfg["planes_res"], cfg["c_planes_res"]
    sdf_layout = make_layout(bound, [pres["coarse"], pres["fine"]], 32)
    color_layout = make_layout(bound, [cres["coarse"], cres["fine"]], 32)
    r = cfg["rendering"]
    topk = int(r.get("color_topk", 0))
    scene = SceneGeometry(
        sdf_layout, color_layout, tuple(map(tuple, bound.tolist())),
        float(cfg["model"]["truncation"]), int(r["n_stratified"]),
        int(r["n_importance"]), bool(r["perturb"]), color_topk=topk)
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

    loss_fn, optimizer = _build_core(cfg, scene, cam, importance=False)
    params = {"map": ms, "poses": poses}
    opt_state = jax.jit(optimizer.init)(params)
    n_it = args.iters
    key = jax.random.key(0, impl=args.rng)
    print(f"rng={args.rng}", flush=True)

    variants = {
        "nocond": lambda p, o, k: _scan_steps(
            loss_fn, optimizer, p, o, pose_mask, slot_kf, jnp.int32(W),
            kf_colors, kf_depths, k, jnp.int32(0), jnp.float32(1.0),
            n_it, total=None),
        "cond": lambda p, o, k, t=jnp.int32(n_it): _scan_steps(
            loss_fn, optimizer, p, o, pose_mask, slot_kf, jnp.int32(W),
            kf_colors, kf_depths, k, jnp.int32(0), jnp.float32(1.0),
            n_it, total=t),
    }
    for name, fn in variants.items():
        jfn = jax.jit(fn)
        t0 = time.time()
        out = jfn(params, opt_state, key)
        barrier(out[2])
        compile_s = time.time() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            out = jfn(params, opt_state, key)
            barrier(out[2])
            best = min(best, (time.time() - t0) / n_it * 1e3)
        print(f"{name}: {best:.3f} ms/iter "
              f"(first call incl. compile {compile_s:.1f} s)", flush=True)


if __name__ == "__main__":
    main()

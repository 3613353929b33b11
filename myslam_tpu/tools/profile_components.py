#!/usr/bin/env python
"""Per-component breakdown of the mapping iteration (VERDICT r3 item 3).

PERF.md's roofline story accounted for the gather/scatter share of the
30 ms mapping iteration; this tool measures the REST.  Each component of
the real iteration is timed as its own N-iteration lax.scan inside one
program (host-loop timing reads dispatch latency through the remote
tunnel, not device time), at the Replica operating point and with the
production code paths (engine/mapper._build_core and the renderer
internals it calls):

  full_grad   the real value_and_grad step        (= the 30 ms/iter)
  forward     loss value only                     (backward = full - fwd)
  raygen      pixel draw + rays + z-vals + pts + normalize
  sdf_field   q.sdf on the iteration's 160k points (gather + decode)
  rgb_field   color field at the composited points (top-K or all)
  mlp_only    decoder MLPs on pre-gathered corners (isolates the matmuls)
  composite   sdf2alpha + weights + depth/color/sdf losses on fixed fields

Usage: python -m myslam_tpu.tools.profile_components [--iters 10]
       [--topk -1] [--json]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--topk", type=int, default=-1,
                    help="override rendering.color_topk (-1 = config)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from myslam_tpu.engine.scheduler import enable_compilation_cache
    enable_compilation_cache()

    from myslam_tpu.core.geometry import (
        normalize_3d_coordinate,
        ray_aabb_exit_t,
        rays_from_uv,
    )
    from myslam_tpu.core.losses import color_loss, depth_loss, sdf_losses
    from myslam_tpu.core.quaternion import cam_pose_to_matrix, \
        matrix_to_cam_pose
    from myslam_tpu.engine.camera import Camera
    from myslam_tpu.engine.mapper import _build_core
    from myslam_tpu.engine.scheduler import compute_bound
    from myslam_tpu.models.decoders import init_decoder_params
    from myslam_tpu.models.planes import init_map_state, make_layout
    from myslam_tpu.ops.composite import composite, composite_topk, sdf2alpha
    from myslam_tpu.ops.plane_sample import pack_quad, sample_fused
    from myslam_tpu.render.renderer import (
        SceneGeometry,
        build_z_vals_core,
        make_queries,
    )
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
    topk = int(r.get("color_topk", 0)) if args.topk < 0 else args.topk
    scene = SceneGeometry(
        sdf_layout, color_layout, tuple(map(tuple, bound.tolist())),
        float(cfg["model"]["truncation"]), int(r["n_stratified"]),
        int(r["n_importance"]), bool(r["perturb"]), color_topk=topk)
    key = jax.random.PRNGKey(0)
    ms = init_map_state(key, sdf_layout, color_layout,
                        init_decoder_params(key, c_dim=32))
    m = cfg["mapping"]
    n_rays = int(m["pixels"])
    W = int(m["mapping_window_size"])
    center = bound.mean(axis=1)
    c2ws = jnp.tile(jnp.eye(4), (W, 1, 1)).at[:, :3, 3].set(
        jnp.asarray(center))
    poses = matrix_to_cam_pose(c2ws)
    pose_mask = jnp.ones((W,)).at[0].set(0.0)
    slot_kf = jnp.arange(W, dtype=jnp.int32)
    kf_colors = jnp.full((W, cam.H, cam.W, 3), 0.5, jnp.float16)
    kf_depths = jnp.full((W, cam.H, cam.W), 1.5, jnp.float32)
    HW = cam.H * cam.W
    w_color, w_depth = float(m["w_color"]), float(m["w_depth"])
    w_fs, w_center, w_tail = (float(m["w_sdf_fs"]),
                              float(m["w_sdf_center"]),
                              float(m["w_sdf_tail"]))
    jax.block_until_ready(kf_depths)
    n_it = args.iters

    def timed_scan(body, *arrays):
        """Time body(it, *arrays)->scalar as one n_it-iteration
        in-program scan.  Every device buffer the body reads MUST ride
        in ``arrays`` — a closed-over jax.Array becomes a lowering-time
        constant (fetched D2H and embedded in the compile payload; a
        160 MB capture blew the remote-compile request limit)."""
        @jax.jit
        def scan(*arrays):
            def step(acc, it):
                return acc + body(it, *arrays), ()
            acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                                  jnp.arange(n_it))
            return acc

        out = scan(*arrays)
        barrier(out)
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            out = scan(*arrays)
            barrier(out)
            best = min(best, (time.time() - t0) / n_it * 1e3)
        return best

    def consume(tree):
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(tree))

    # The iteration's actual geometry stage (matches _build_core's loss).
    def raygen(it, kf_colors, kf_depths, poses):
        k = jax.random.fold_in(key, it)
        k_px, k_render = jax.random.split(k)
        slot_of_ray = jnp.arange(n_rays) % W
        kf_of_ray = slot_kf[slot_of_ray]
        ki, kj = jax.random.split(k_px)
        i = jax.random.randint(ki, (n_rays,), 0, cam.W).astype(jnp.float32)
        j = jax.random.randint(kj, (n_rays,), 0, cam.H).astype(jnp.float32)
        flat = (kf_of_ray * HW + j.astype(jnp.int32) * cam.W
                + i.astype(jnp.int32))
        px_depth = kf_depths.reshape(-1)[flat]
        px_color = kf_colors.reshape(-1, 3)[flat].astype(jnp.float32)
        c2w_of_ray = cam_pose_to_matrix(poses)[slot_of_ray]
        rays_o, rays_d = rays_from_uv(i, j, c2w_of_ray, cam.fx, cam.fy,
                                      cam.cx, cam.cy)
        z_vals = build_z_vals_core(k_render, scene, rays_o, rays_d,
                                   px_depth, False, None)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        p_nor = normalize_3d_coordinate(pts.reshape(-1, 3),
                                        scene.bound_array)
        t_exit = ray_aabb_exit_t(rays_o, rays_d, scene.bound_array)
        return (p_nor, z_vals, px_depth, px_color,
                t_exit >= px_depth, pts)

    report = {"n_rays": n_rays, "n_samples": scene.n_samples,
              "color_topk": topk, "iters": n_it}

    def emit(name, val):
        report[name] = round(float(val), 3)
        print(f"{name}: {report[name]}", flush=True)

    # 1) full loss+grad (the real per-iteration cost)
    loss_fn, _ = _build_core(cfg, scene, cam, importance=False)
    params = {"map": ms, "poses": poses}

    def full_grad(it, params, kf_colors, kf_depths):
        k = jax.random.fold_in(key, it)
        loss, g = jax.value_and_grad(loss_fn)(
            params, pose_mask, slot_kf, jnp.int32(W),
            kf_colors, kf_depths, k)
        return loss + consume(g)

    emit("full_grad_ms",
         timed_scan(full_grad, params, kf_colors, kf_depths))

    # 2) forward only
    def forward(it, params, kf_colors, kf_depths):
        k = jax.random.fold_in(key, it)
        return loss_fn(params, pose_mask, slot_kf, jnp.int32(W),
                       kf_colors, kf_depths, k)

    emit("forward_ms",
         timed_scan(forward, params, kf_colors, kf_depths))

    # 3) ray generation + z-vals + points + pixel reads
    def raygen_only(it, kf_colors, kf_depths, poses):
        p_nor, z_vals, px_depth, px_color, inside, _ = raygen(
            it, kf_colors, kf_depths, poses)
        return (jnp.sum(p_nor) + jnp.sum(z_vals) + jnp.sum(px_depth)
                + jnp.sum(px_color) + jnp.sum(inside))

    emit("raygen_ms", timed_scan(raygen_only, kf_colors, kf_depths, poses))

    # 4) SDF field (gather + bilinear-folded decode) at the real points
    def sdf_field(it, ms, kf_colors, kf_depths, poses):
        p_nor = raygen(it, kf_colors, kf_depths, poses)[0]
        q = make_queries(ms, scene)
        return jnp.sum(q.sdf(p_nor))

    emit("sdf_field_ms",
         timed_scan(sdf_field, ms, kf_colors, kf_depths, poses))

    # 5) + color field exactly as the renderer composites it
    def sdf_rgb_field(it, ms, kf_colors, kf_depths, poses):
        p_nor, z_vals, _, _, _, pts = raygen(
            it, kf_colors, kf_depths, poses)
        q = make_queries(ms, scene)
        sdf = q.sdf(p_nor).reshape(z_vals.shape)
        alpha = sdf2alpha(sdf, q.beta)
        K = int(scene.color_topk)
        if K and K < scene.n_samples:
            depth, color = composite_topk(
                alpha, z_vals, pts,
                lambda p: q.rgb(normalize_3d_coordinate(
                    p, scene.bound_array)), K)
        else:
            rgb = q.rgb(p_nor).reshape(z_vals.shape + (3,))
            depth, color, _ = composite(alpha, z_vals, rgb)
        return jnp.sum(depth) + jnp.sum(color) + jnp.sum(sdf)

    emit("sdf_rgb_composite_ms",
         timed_scan(sdf_rgb_field, ms, kf_colors, kf_depths, poses))

    # 6) decoder MLPs alone on pre-gathered corner features
    from myslam_tpu.models.decoders import (
        decode_rgb_corners,
        decode_sdf_corners,
    )
    from myslam_tpu.render.renderer import _row_map

    n_pts = n_rays * scene.n_samples
    p_fix = jnp.asarray(
        np.random.default_rng(0).uniform(0.05, 0.95, (n_pts, 3)),
        jnp.float32)
    sdf_quad = pack_quad(ms.sdf_atlas, scene.sdf_layout)
    color_quad = pack_quad(ms.color_atlas, scene.color_layout)
    sdf_corners = sample_fused(sdf_quad, scene.sdf_layout, p_fix)
    rgb_corners = sample_fused(color_quad, scene.color_layout, p_fix)
    jax.block_until_ready(rgb_corners)

    def mlp_only(it, ms, sdf_corners, rgb_corners):
        s = decode_sdf_corners(ms.decoder, sdf_corners,
                               _row_map(scene.sdf_layout))
        c = decode_rgb_corners(ms.decoder, rgb_corners,
                               _row_map(scene.color_layout))
        return jnp.sum(s) + jnp.sum(c) + 0.0 * it

    emit("mlp_only_ms", timed_scan(mlp_only, ms, sdf_corners, rgb_corners))

    # 7) compositing + losses on FIXED fields (no gather, no MLP)
    sdf_fix = jnp.asarray(
        np.random.default_rng(1).normal(size=(n_rays, scene.n_samples)),
        jnp.float32)
    rgb_fix = jnp.full((n_rays, scene.n_samples, 3), 0.5, jnp.float32)
    z_fix = jnp.tile(jnp.linspace(0.5, 2.5, scene.n_samples),
                     (n_rays, 1))
    d_fix = jnp.full((n_rays,), 1.5, jnp.float32)
    c_fix = jnp.full((n_rays, 3), 0.5, jnp.float32)
    mask_fix = jnp.ones((n_rays,), bool)

    def composite_loss(it, sdf_fix, rgb_fix, z_fix, d_fix, c_fix,
                       mask_fix):
        alpha = sdf2alpha(sdf_fix + 0.0 * it, jnp.float32(10.0))
        depth, color, _ = composite(alpha, z_fix, rgb_fix)
        loss = sdf_losses(sdf_fix, z_fix, d_fix, mask_fix,
                          scene.truncation, w_fs, w_center, w_tail)
        loss = loss + w_color * color_loss(c_fix, color, mask_fix)
        loss = loss + w_depth * depth_loss(d_fix, depth, mask_fix)
        return loss

    emit("composite_loss_ms",
         timed_scan(composite_loss, sdf_fix, rgb_fix, z_fix, d_fix,
                    c_fix, mask_fix))

    report["backward_ms"] = round(
        report["full_grad_ms"] - report["forward_ms"], 3)
    report["fwd_unaccounted_ms"] = round(
        report["forward_ms"] - report["sdf_rgb_composite_ms"], 3)
    for k in list(report):
        if k.endswith("_ms"):
            report[k] = round(float(report[k]), 3)

    if args.json:
        print(json.dumps(report))
    else:
        for k, v in report.items():
            print(f"{k}: {v}", flush=True)


if __name__ == "__main__":
    main()

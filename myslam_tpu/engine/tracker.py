"""Per-frame camera tracking as one jitted device program.

Re-design of the reference Tracker (src/Tracker.py:150-314): instead of a
Python loop issuing 8 separate fused-kernel launches + optimizer steps,
the whole per-frame optimization is a single ``lax.scan`` inside one jit —
sample pixels, render, masked losses, Adam on the 7-dof (quat, trans)
pose — with the best-of-iters candidate selection done in-carry.

Reference semantics kept:
  * fresh Adam state per frame, betas (0.5, 0.999), separate lr for R/T
    (src/Tracker.py:291-296);
  * per-iteration loss evaluated at the pre-update pose; the pose with
    the lowest such loss wins (src/Tracker.py:298-309);
  * ray filtering (bound exit >= gt depth, depth > 0) and the
    10x-median depth-error outlier rejection become masks
    (src/Tracker.py:175-195);
  * fresh random pixels every iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from myslam_tpu.core.geometry import ray_aabb_exit_t, rays_from_uv
from myslam_tpu.core.losses import (
    color_loss,
    depth_loss,
    masked_median,
    sdf_losses,
)
from myslam_tpu.core.quaternion import cam_pose_to_matrix
from myslam_tpu.engine.camera import Camera
from myslam_tpu.models.planes import MapState
from myslam_tpu.ops.plane_sample import pack_quad
from myslam_tpu.render.renderer import SceneGeometry, render_rays


def constant_speed_init(
    prev: jnp.ndarray, prev_prev: jnp.ndarray, use_const_speed
) -> jnp.ndarray:
    """Initial pose guess: linear extrapolation in (quat, trans) space.

    prev, prev_prev: (7,) cam poses.  Reference src/Tracker.py:282-289.
    """
    extrapolated = 2.0 * prev - prev_prev
    return jnp.where(use_const_speed, extrapolated, prev)


def make_track_core(cfg: dict, scene: SceneGeometry, cam: Camera,
                    ray_sharding=None):
    """Build the traceable per-frame optimization core.

    Returns core(ms, quads, pose_init7, px_i (iters,n), px_j (iters,n),
                 px_color (iters,n,3) uint8, px_depth (iters,n), key)
      -> (best_pose7, losses (iters,)) — NOT jitted; callers embed it in
    their own programs (one frame, or a whole every_frame group) with the
    quad atlases packed once outside.

    The per-iteration pixel batches arrive pre-sampled from the host
    (datasets.build_packet) — only ~0.2 MB crosses the host-device link
    per frame instead of the full image.

    ``ray_sharding``: optional NamedSharding to shard the pixel batch over
    a device mesh (data-parallel tracking; the 7-dof pose gradient is
    psum'd by XLA automatically).
    """
    t = cfg["tracking"]
    n_px = int(t["pixels"])
    iters = int(t["iters"])
    w_color, w_depth = float(t["w_color"]), float(t["w_depth"])
    w_fs, w_center, w_tail = (
        float(t["w_sdf_fs"]), float(t["w_sdf_center"]), float(t["w_sdf_tail"])
    )
    lr_T, lr_R = float(t["lr_T"]), float(t["lr_R"])
    map_bf16 = bool(t.get("map_bf16", True))

    optimizer = optax.multi_transform(
        {
            "R": optax.adam(lr_R, b1=0.5, b2=0.999),
            "T": optax.adam(lr_T, b1=0.5, b2=0.999),
        },
        {"R": "R", "T": "T"},
    )

    bound = scene.bound_array

    def loss_fn(params, ms: MapState, quads, i, j, px_color, px_depth, key):
        pose = jnp.concatenate([params["R"], params["T"]])
        c2w = cam_pose_to_matrix(pose[None])[0]
        k_render = key
        i = i.astype(jnp.float32)
        j = j.astype(jnp.float32)
        px_color = px_color.astype(jnp.float32) * (1.0 / 255.0)
        if ray_sharding is not None:
            i = jax.lax.with_sharding_constraint(i, ray_sharding)
            j = jax.lax.with_sharding_constraint(j, ray_sharding)
            px_depth = jax.lax.with_sharding_constraint(px_depth, ray_sharding)
            px_color = jax.lax.with_sharding_constraint(px_color, ray_sharding)
        rays_o, rays_d = rays_from_uv(i, j, c2w, cam.fx, cam.fy, cam.cx, cam.cy)

        t_exit = ray_aabb_exit_t(
            jax.lax.stop_gradient(rays_o), jax.lax.stop_gradient(rays_d), bound
        )
        inside = (t_exit >= px_depth) & (px_depth > 0)

        depth, color, sdf, z_vals = render_rays(
            k_render, ms, scene, rays_o, rays_d, px_depth, importance=False,
            sdf_quad=quads[0], color_quad=quads[1]
        )

        err = jnp.abs(px_depth - jax.lax.stop_gradient(depth))
        med = masked_median(err, inside)
        dmask = inside & (err < 10.0 * med)

        loss = sdf_losses(
            sdf, z_vals, px_depth, dmask, scene.truncation, w_fs, w_center, w_tail
        )
        loss = loss + w_color * color_loss(px_color, color, dmask)
        loss = loss + w_depth * depth_loss(px_depth, depth, dmask)
        return loss

    def core(ms: MapState, quads, pose_init: jnp.ndarray,
             px_i, px_j, px_color, px_depth, key):
        params0 = {"R": pose_init[:4], "T": pose_init[4:]}
        opt0 = optimizer.init(params0)

        def step(carry, xs):
            params, opt_state, best_loss, best_pose = carry
            it, i, j, col, dep = xs
            k = jax.random.fold_in(key, it)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, ms, quads, i, j, col, dep, k
            )
            pose = jnp.concatenate([params["R"], params["T"]])
            better = loss < best_loss
            best_pose = jnp.where(better, pose, best_pose)
            best_loss = jnp.minimum(loss, best_loss)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # ``pose`` is the pre-update pose whose loss was just
            # evaluated -- recording it lets vis_inside_freq panels be
            # rendered post-hoc with EXACT in-loop semantics (the map is
            # frozen during tracking), reference Frame_Visualizer.py:67.
            return (params, opt_state, best_loss, best_pose), (loss, pose)

        carry0 = (params0, opt0, jnp.inf, pose_init)
        (_, _, _, best_pose), (losses, iter_poses) = jax.lax.scan(
            step, carry0, (jnp.arange(iters), px_i, px_j, px_color, px_depth)
        )
        return best_pose, losses, iter_poses

    core.map_bf16 = map_bf16
    return core


def _pack_tracking_quads(ms: MapState, scene: SceneGeometry, map_bf16: bool):
    """Quad atlases for a frozen-map optimization, packed once per program
    — in bfloat16 by default, halving the per-iteration gather traffic
    (the map receives no gradient here; feature rounding is ~0.4%
    relative)."""
    qdtype = jnp.bfloat16 if map_bf16 else jnp.float32
    return (pack_quad(ms.sdf_atlas, scene.sdf_layout).astype(qdtype),
            pack_quad(ms.color_atlas, scene.color_layout).astype(qdtype))


def make_tracker(cfg: dict, scene: SceneGeometry, cam: Camera,
                 ray_sharding=None):
    """Jitted single-frame tracking: pack quads + optimization core."""
    core = make_track_core(cfg, scene, cam, ray_sharding=ray_sharding)

    def track(ms: MapState, pose_init: jnp.ndarray,
              px_i, px_j, px_color, px_depth, key):
        quads = _pack_tracking_quads(ms, scene, core.map_bf16)
        return core(ms, quads, pose_init, px_i, px_j, px_color, px_depth,
                    key)  # (best_pose, losses, iter_poses)

    return jax.jit(track)


def make_frame_tracker(cfg: dict, scene: SceneGeometry, cam: Camera,
                       ray_sharding=None):
    """Whole-frame tracking as ONE device program.

    Wraps make_tracker's optimization scan with the pose initialization
    (constant-speed extrapolation from the on-device trajectory,
    reference src/Tracker.py:282-289) and the trajectory write-back, so a
    tracked frame costs a single dispatch instead of four (each extra
    tiny program adds queue latency on remote devices).

    Returns track_frame(ms, est_c2w (n,4,4) [donated], idx, px_i, px_j,
                        px_color, px_depth, key)
      -> (est_c2w', c2w (4,4), loss_first, loss_best, iter_poses (iters,7))
    """
    from myslam_tpu.core.quaternion import matrix_to_cam_pose

    const_speed = bool(cfg["tracking"].get("const_speed_assumption", True))
    track = make_tracker(cfg, scene, cam, ray_sharding=ray_sharding)

    def track_frame(ms: MapState, est_c2w, idx, px_i, px_j, px_color,
                    px_depth, key):
        prev = matrix_to_cam_pose(est_c2w[idx - 1][None])[0]
        if const_speed:
            prev_prev = matrix_to_cam_pose(
                est_c2w[jnp.maximum(idx - 2, 0)][None])[0]
            pose_init = jnp.where(idx >= 2, 2.0 * prev - prev_prev, prev)
        else:
            pose_init = prev
        best_pose, losses, iter_poses = track(
            ms, pose_init, px_i, px_j, px_color, px_depth, key)
        c2w = cam_pose_to_matrix(best_pose[None])[0]
        est_c2w = est_c2w.at[idx].set(c2w)
        return est_c2w, c2w, losses[0], jnp.min(losses), iter_poses

    return jax.jit(track_frame, donate_argnums=(1,))


def make_group_tracker(cfg: dict, scene: SceneGeometry, cam: Camera,
                       group_size: int, ray_sharding=None):
    """Track a whole ``every_frame`` group of frames as ONE device program.

    Between two mapped frames the map snapshot is frozen (reference
    interleave, src/Tracker.py:264-267), so the frames kE+1 .. (k+1)E all
    optimize against identical plane atlases.  Fusing them into one
    dispatch (a ``lax.scan`` over frames around the per-frame optimization
    core) packs the quad atlases ONCE per group instead of once per frame
    and replaces ~6 small host->device uploads + 1 dispatch per frame with
    one batched upload + one dispatch per group — the per-operation tunnel
    latency to a remote TPU is milliseconds each.

    Sequential semantics are preserved: frame g's constant-speed pose
    initialization (src/Tracker.py:282-289) extrapolates from the poses
    frames g-1 and g-2 of this same scan just produced.

    Returns track_group(ms, est_c2w (n,4,4) [donated], idx0,
                        px_i (G,iters,n), px_j, px_color (G,iters,n,3) u8,
                        px_depth (G,iters,n), key)
      -> (est_c2w', c2ws (G,4,4), loss_first (G,), loss_best (G,),
          iter_poses (G, iters, 7))
    where idx0 is the first tracked frame of the group (>= 1).
    """
    from myslam_tpu.core.quaternion import matrix_to_cam_pose

    const_speed = bool(cfg["tracking"].get("const_speed_assumption", True))
    core = make_track_core(cfg, scene, cam, ray_sharding=ray_sharding)
    G = int(group_size)

    def track_group(ms: MapState, est_c2w, idx0, px_i, px_j, px_color,
                    px_depth, key):
        quads = _pack_tracking_quads(ms, scene, core.map_bf16)
        prev0 = matrix_to_cam_pose(est_c2w[idx0 - 1][None])[0]
        prev_prev0 = matrix_to_cam_pose(
            est_c2w[jnp.maximum(idx0 - 2, 0)][None])[0]
        # Frame 1 has no two predecessors; degrade to prev (idx0 >= 1).
        prev_prev0 = jnp.where(idx0 >= 2, prev_prev0, prev0)

        def step(carry, xs):
            prev, prev_prev = carry
            idx, i, j, col, dep = xs
            if const_speed:
                pose_init = 2.0 * prev - prev_prev
            else:
                pose_init = prev
            best_pose, losses, iter_poses = core(
                ms, quads, pose_init, i, j, col, dep,
                jax.random.fold_in(key, idx))
            return (best_pose, prev), (best_pose, losses[0],
                                       jnp.min(losses), iter_poses)

        idxs = idx0 + jnp.arange(G)
        (_, _), (poses, loss_first, loss_best, iter_poses) = jax.lax.scan(
            step, (prev0, prev_prev0), (idxs, px_i, px_j, px_color,
                                        px_depth))
        c2ws = cam_pose_to_matrix(poses)  # (G, 4, 4)
        est_c2w = jax.lax.dynamic_update_slice(
            est_c2w, c2ws, (idx0, jnp.int32(0), jnp.int32(0)))
        return est_c2w, c2ws, loss_first, loss_best, iter_poses

    return jax.jit(track_group, donate_argnums=(1,))

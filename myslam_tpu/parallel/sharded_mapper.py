"""Windowed BA with MAP-BLOCK SHARDED plane atlases.

The single-chip mapper (engine/mapper.py) keeps the whole map resident.
This variant partitions both atlases across the ``map`` mesh axis
(parallel/plane_shard.py: row bands per plane, halo-exchanged quad
packing) so maps larger than one chip's HBM train across devices — the
framework's analog of sequence/context parallelism (SURVEY §5.7).

Data flow per iteration:
  * rays/pixels are replicated; every device samples its OWN bands of
    every plane and one psum per query assembles the (N, L*4C) features;
  * the decoders (tiny MLPs) run replicated;
  * autodiff through the shard_map'd sampler produces purely LOCAL
    scatter-adds — plane gradients never cross the interconnect; only
    per-point features (forward) and their cotangents (backward) ride
    the psum;
  * Adam state for the atlases inherits the P(map, None) sharding.

Loss/semantics match the single-chip mapper for depth-valid windows
(depth-guided sampling only).  NOTE: this is the minimal library-level
BA step kept for dryruns/benchmarks; the PRODUCT map-block-sharded
mapper is parallel/sharded_engine.py, which runs the ENTIRE fused frame
mapper — including the reference's depth-less importance branch
(src/utils/Renderer.py:108-134) — against the banded backend and is
what `parallel.map_shards` in the config selects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from myslam_tpu.core.geometry import (
    normalize_3d_coordinate,
    ray_aabb_exit_t,
    rays_from_uv,
)
from myslam_tpu.core.losses import color_loss, depth_loss, sdf_losses
from myslam_tpu.core.quaternion import cam_pose_to_matrix
from myslam_tpu.models.decoders import decode_rgb_corners, decode_sdf_corners
from myslam_tpu.ops.composite import composite, sdf2alpha
from myslam_tpu.ops.plane_sample import reduced_row_map
from myslam_tpu.core.sampling import depth_guided_z_vals
from myslam_tpu.parallel.plane_shard import (
    ShardedPlaneLayout,
    atlas_sharding,
    make_sharded_sampler,
)


def make_sharded_mapper(cfg: dict, scene, cam, mesh: Mesh,
                        map_axis: str = "map", iters: int | None = None):
    """Build (map_step, shard_state, unshard_state) for map-block BA.

    map_step(state, poses7 (W,7), pose_mask (W,), slot_kf (W,), n_slots,
             kf_colors, kf_depths, key) -> (state, poses7, losses (iters,))

    ``state`` is a dict {sdf, color, decoder}: band-sharded atlases (via
    shard_state) + replicated decoder params.
    """
    m = cfg["mapping"]
    n_iters = int(iters if iters is not None else m["iters"])
    n_rays = int(m["pixels"])
    w_color, w_depth = float(m["w_color"]), float(m["w_depth"])
    w_fs, w_center, w_tail = (
        float(m["w_sdf_fs"]), float(m["w_sdf_center"]), float(m["w_sdf_tail"])
    )
    lr = m["lr"]
    lr_factor = float(m["lr_factor"])
    learnable_beta = bool(cfg["rendering"].get("learnable_beta", True))
    truncation = float(scene.truncation)
    bound = scene.bound_array

    n_shards = mesh.shape[map_axis]
    slayout_sdf = ShardedPlaneLayout(scene.sdf_layout, n_shards)
    slayout_color = ShardedPlaneLayout(scene.color_layout, n_shards)
    sample_sdf = make_sharded_sampler(mesh, map_axis, slayout_sdf)
    sample_color = make_sharded_sampler(mesh, map_axis, slayout_color)
    row_map_sdf = np.asarray(reduced_row_map(scene.sdf_layout))
    row_map_color = np.asarray(reduced_row_map(scene.color_layout))
    sharding = atlas_sharding(mesh, map_axis)
    repl = NamedSharding(mesh, P())

    label_tree = {
        "sdf": "planes",
        "color": "c_planes",
        "decoder": {
            "sdf": [["decoders", "decoders"], ["decoders", "decoders"]],
            "rgb": [["decoders", "decoders"], ["decoders", "decoders"]],
            "sdf_out": ["decoders", "decoders"],
            "rgb_out": ["decoders", "decoders"],
            "beta": "decoders" if learnable_beta else "frozen",
        },
        "poses": "poses",
    }
    optimizer = optax.multi_transform(
        {
            "decoders": optax.adam(float(lr["decoders_lr"]) * lr_factor),
            "planes": optax.adam(float(lr["planes_lr"]) * lr_factor),
            "c_planes": optax.adam(float(lr["c_planes_lr"]) * lr_factor),
            "poses": optax.adam(float(m["joint_opt_cam_lr"])),
            "frozen": optax.set_to_zero(),
        },
        label_tree,
    )

    HW = cam.H * cam.W

    def loss_fn(params, pose_mask, slot_kf, n_slots, kf_colors, kf_depths,
                key):
        decoder = params["decoder"]
        poses = jnp.where(
            pose_mask[:, None] > 0, params["poses"],
            jax.lax.stop_gradient(params["poses"]))
        c2ws = cam_pose_to_matrix(poses)

        k_px, k_z = jax.random.split(key)
        slot_of_ray = jnp.arange(n_rays) % n_slots
        kf_of_ray = slot_kf[slot_of_ray]
        ki, kj = jax.random.split(k_px)
        i = jax.random.randint(ki, (n_rays,), 0, cam.W).astype(jnp.float32)
        j = jax.random.randint(kj, (n_rays,), 0, cam.H).astype(jnp.float32)
        flat = (kf_of_ray * HW + j.astype(jnp.int32) * cam.W
                + i.astype(jnp.int32))
        px_depth = kf_depths.reshape(-1)[flat]
        px_color = kf_colors.reshape(-1, 3)[flat].astype(jnp.float32)

        rays_o, rays_d = rays_from_uv(
            i, j, c2ws[slot_of_ray], cam.fx, cam.fy, cam.cx, cam.cy)
        t_exit = ray_aabb_exit_t(
            jax.lax.stop_gradient(rays_o), jax.lax.stop_gradient(rays_d),
            bound)
        inside = t_exit >= px_depth

        z_vals = depth_guided_z_vals(
            k_z, px_depth, truncation, scene.n_stratified,
            scene.n_importance, scene.perturb)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        p_nor = normalize_3d_coordinate(pts.reshape(-1, 3), bound)

        sdf = decode_sdf_corners(
            decoder, sample_sdf(params["sdf"], p_nor), row_map_sdf
        ).reshape(z_vals.shape)
        rgb = decode_rgb_corners(
            decoder, sample_color(params["color"], p_nor), row_map_color
        ).reshape(z_vals.shape + (3,))
        alpha = sdf2alpha(sdf, decoder["beta"][0])
        depth, color, _ = composite(alpha, z_vals, rgb)

        dmask = inside & (px_depth > 0)
        loss = sdf_losses(sdf, z_vals, px_depth, dmask, truncation,
                          w_fs, w_center, w_tail)
        loss = loss + w_color * color_loss(px_color, color, inside)
        loss = loss + w_depth * depth_loss(px_depth, depth, dmask)
        return loss

    def run(state, poses, pose_mask, slot_kf, n_slots, kf_colors,
            kf_depths, key):
        params = {
            "sdf": jax.lax.with_sharding_constraint(state["sdf"], sharding),
            "color": jax.lax.with_sharding_constraint(
                state["color"], sharding),
            "decoder": state["decoder"],
            "poses": poses,
        }
        opt_state = optimizer.init(params)

        def step(carry, it):
            params, opt_state = carry
            k = jax.random.fold_in(key, it)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, pose_mask, slot_kf, n_slots, kf_colors, kf_depths, k)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, _), losses = jax.lax.scan(
            step, (params, opt_state), jnp.arange(n_iters))
        state = {"sdf": params["sdf"], "color": params["color"],
                 "decoder": params["decoder"]}
        return state, params["poses"], losses

    map_step = jax.jit(run, donate_argnums=(0,))

    def shard_state(ms):
        """MapState -> sharded state dict placed on the mesh."""
        return {
            "sdf": jax.device_put(
                jnp.asarray(slayout_sdf.shard_atlas(ms.sdf_atlas)), sharding),
            "color": jax.device_put(
                jnp.asarray(slayout_color.shard_atlas(ms.color_atlas)),
                sharding),
            # copy: map_step donates its state, and device_put may alias
            # an already-placed buffer (deleting the caller's decoder)
            "decoder": jax.device_put(
                jax.tree_util.tree_map(jnp.copy, ms.decoder), repl),
        }

    def unshard_state(state, ms):
        """Sharded state dict -> MapState (drops band padding rows)."""
        return type(ms)(
            sdf_atlas=jnp.asarray(
                slayout_sdf.unshard_atlas(np.asarray(state["sdf"]))),
            color_atlas=jnp.asarray(
                slayout_color.unshard_atlas(np.asarray(state["color"]))),
            decoder=state["decoder"],
        )

    return map_step, shard_state, unshard_state

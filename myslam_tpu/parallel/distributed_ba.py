"""Multi-host windowed BA: keyframe partitioning + Schur-style pose step.

The reference's "distributed" story is two processes on one GPU (SURVEY
§5.8).  This module is the pod-scale BA the north star asks for:

  * **Keyframe partitioning**: the keyframe imagery lives sharded across
    the ``kf`` mesh axis (each host stores and reads ONLY its own frames
    — on a real pod each host also loads only those frames from disk).
    Every shard draws its ray budget from the window slots it owns, so
    per-host work is n_rays / n_hosts and raw imagery never crosses the
    interconnect.
  * **Plane/decoder gradients**: the map is replicated here (compose with
    parallel/plane_shard.py for maps beyond one chip's HBM); the masked
    loss means are computed as psum'd (sum, count) pairs, so autodiff
    produces the exact global gradient with ONE psum of the per-term
    scalars' cotangents over ICI — identical to the single-chip mapper's
    loss for the same ray set.
  * **Schur-style pose marginalization**: instead of Adam on the poses,
    each iteration solves the REDUCED pose system: per-ray depth+color
    residuals give dense per-window-pose Gauss-Newton blocks
    H_w = Σ JᵀJ (7×7) and g_w = Σ Jᵀr, which are psum'd (the only pose
    communication, W×56 floats) and solved with Levenberg damping on
    every host.  The plane block is handled by the first-order psum'd
    Adam step — i.e. the pose block is eliminated from the joint system
    and the cross-coupling term is carried by re-rendering at the
    updated poses next iteration (a Gauss-Seidel Schur sweep, the
    standard large-scale BA decomposition).

Pose Jacobians are computed in reverse mode: one shared forward plus 4
pullbacks per ray (one per residual row) — cheaper than 7 forward
tangents, and it rides the hand-written-VJP sampling kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from myslam_tpu.core.geometry import (
    normalize_3d_coordinate,
    ray_aabb_exit_t,
    rays_from_uv,
)
from myslam_tpu.core.losses import color_loss, depth_loss, sdf_losses
from myslam_tpu.core.quaternion import cam_pose_to_matrix
from myslam_tpu.core.sampling import depth_guided_z_vals
from myslam_tpu.models.decoders import decode_rgb_corners, decode_sdf_corners
from myslam_tpu.models.planes import MapState
from myslam_tpu.ops.composite import composite, sdf2alpha
from myslam_tpu.ops.plane_sample import (
    pack_quad,
    reduced_row_map,
    sample_fused,
)


def kf_sharding(mesh: Mesh, axis: str = "kf") -> NamedSharding:
    """Slot-axis sharding for keyframe imagery buffers."""
    return NamedSharding(mesh, P(axis))


def shard_keyframes(mesh: Mesh, kf_colors, kf_depths, axis: str = "kf"):
    """Place (cap, H, W, ...) keyframe buffers sharded over hosts.
    cap must divide by the axis size."""
    sh = kf_sharding(mesh, axis)
    return jax.device_put(kf_colors, sh), jax.device_put(kf_depths, sh)


def make_local_ray_picker(cam, n_rays: int, kf_axis: str,
                          packed: bool = False, dp_axis: str | None = None):
    """Per-shard ray draw from the window slots this shard owns.

    Returns pick(slot_kf (W,), n_slots, kf_depths_l, kf_colors_l, key)
      -> (p (R,) window positions, i, j, px_depth, px_color, valid)
    where R = n_rays is the LOCAL ray budget.  Ownership: global slot s
    lives on shard s // cap_local (contiguous slot sharding) — each
    shard's rays read only its local imagery; raw pixels never cross the
    interconnect (SURVEY §5.7 north star).

    ``packed``: local buffers are the quantized store (u8 color;
    depths = (u16, inv_q) pytree) — sampled pixels dequantize here.

    ``dp_axis``: kf x ray-DP composition — imagery is sharded over
    ``kf_axis`` only (replicated along ``dp_axis``), and the kf row's
    ray budget splits over the dp columns by folding the dp index into
    the pixel draw (distinct i.i.d. pixels per column, same owned
    slots).  The psums then reduce over BOTH axes.
    """
    HW = cam.H * cam.W

    def pick(slot_kf, n_slots, kf_colors_l, kf_depths_l, key):
        me = jax.lax.axis_index(kf_axis)
        cap_l = kf_colors_l.shape[0]
        W = slot_kf.shape[0]
        pos = jnp.arange(W)
        owned = ((slot_kf // cap_l) == me) & (pos < n_slots)
        (owned_pos,) = jnp.nonzero(owned, size=W, fill_value=0)
        k_own = jnp.sum(owned.astype(jnp.int32))
        p = owned_pos[jnp.arange(n_rays) % jnp.maximum(k_own, 1)]  # (R,)
        valid = k_own > 0
        local_slot = (slot_kf % cap_l)[p]

        k_draw = jax.random.fold_in(key, me)
        if dp_axis is not None:
            k_draw = jax.random.fold_in(
                k_draw, jax.lax.axis_index(dp_axis))
        ki, kj = jax.random.split(k_draw)
        i = jax.random.randint(ki, (n_rays,), 0, cam.W).astype(jnp.float32)
        j = jax.random.randint(kj, (n_rays,), 0, cam.H).astype(jnp.float32)
        flat = (local_slot * HW + j.astype(jnp.int32) * cam.W
                + i.astype(jnp.int32))
        # row-aligned gathers: the TPU fast path (ops/pixel_gather.py)
        from myslam_tpu.ops.pixel_gather import gather_rgb, gather_scalar
        if packed:
            u16_l, invq_l = kf_depths_l
            px_depth = (gather_scalar(u16_l, flat).astype(jnp.float32)
                        * invq_l[local_slot])
            px_color = (gather_rgb(kf_colors_l, flat).astype(jnp.float32)
                        * (1.0 / 255.0))
        else:
            px_depth = gather_scalar(kf_depths_l, flat)
            px_color = gather_rgb(kf_colors_l, flat).astype(jnp.float32)
        return p, i, j, px_depth, px_color, valid

    return pick


def make_distributed_ba(cfg: dict, scene, cam, mesh: Mesh,
                        kf_axis: str = "kf", iters: int | None = None,
                        pose_solver: str = "schur",
                        lm_damping: float = 0.1,
                        schur_interval: int = 1):
    """Build ba_step(ms, poses7 (W,7), pose_mask (W,), slot_kf (W,),
    n_slots, kf_colors_sharded, kf_depths_sharded, key)
      -> (ms, poses7, losses (iters,)).

    ``pose_solver``: "schur" (damped Gauss-Newton on the psum'd reduced
    system) or "adam" (first-order, like the single-chip mapper).
    """
    m = cfg["mapping"]
    n_iters = int(iters if iters is not None else m["iters"])
    n_rays_total = int(m["pixels"])
    n_shards = mesh.shape[kf_axis]
    n_rays = max(n_rays_total // n_shards, 1)
    w_color, w_depth = float(m["w_color"]), float(m["w_depth"])
    w_fs, w_center, w_tail = (
        float(m["w_sdf_fs"]), float(m["w_sdf_center"]), float(m["w_sdf_tail"]))
    lr = m["lr"]
    lr_factor = float(m["lr_factor"])
    cam_lr = float(m["joint_opt_cam_lr"])
    learnable_beta = bool(cfg["rendering"].get("learnable_beta", True))
    truncation = float(scene.truncation)
    bound = scene.bound_array
    row_map_sdf = np.asarray(reduced_row_map(scene.sdf_layout))
    row_map_color = np.asarray(reduced_row_map(scene.color_layout))
    HW = cam.H * cam.W
    sqrt_wd = float(np.sqrt(w_depth))
    sqrt_wc = float(np.sqrt(w_color))
    # mapping.map_bf16 (engine/mapper.py): bf16 quad-atlas reads.
    quad_dtype = (jnp.bfloat16 if bool(m.get("map_bf16", False))
                  else None)

    def _pack(ms):
        q = (pack_quad(ms.sdf_atlas, scene.sdf_layout),
             pack_quad(ms.color_atlas, scene.color_layout))
        if quad_dtype is not None:
            q = (q[0].astype(quad_dtype), q[1].astype(quad_dtype))
        return q

    map_labels = MapState(
        sdf_atlas="planes",
        color_atlas="c_planes",
        decoder={
            "sdf": [["decoders", "decoders"], ["decoders", "decoders"]],
            "rgb": [["decoders", "decoders"], ["decoders", "decoders"]],
            "sdf_out": ["decoders", "decoders"],
            "rgb_out": ["decoders", "decoders"],
            "beta": "decoders" if learnable_beta else "frozen",
        },
    )
    map_opt = optax.multi_transform(
        {
            "decoders": optax.adam(float(lr["decoders_lr"]) * lr_factor),
            "planes": optax.adam(float(lr["planes_lr"]) * lr_factor),
            "c_planes": optax.adam(float(lr["c_planes_lr"]) * lr_factor),
            "frozen": optax.set_to_zero(),
        },
        map_labels,
    )
    pose_opt = optax.adam(cam_lr)

    def dmean(x, mask):
        """Masked mean whose sum/count reduce over ALL shards (exact
        global loss; autodiff turns the psums into gradient psums)."""
        mk = mask.astype(x.dtype)
        s = jax.lax.psum(jnp.sum(x * mk), kf_axis)
        c = jax.lax.psum(jnp.sum(mk), kf_axis)
        return s / jnp.maximum(c, 1.0)

    def render_batch(ms, quads, c2w_of_ray, i, j, z_vals):
        rays_o, rays_d = rays_from_uv(
            i, j, c2w_of_ray, cam.fx, cam.fy, cam.cx, cam.cy)
        pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., None]
        p_nor = normalize_3d_coordinate(pts.reshape(-1, 3), bound)
        sdf = decode_sdf_corners(
            ms.decoder, sample_fused(quads[0], scene.sdf_layout, p_nor),
            row_map_sdf).reshape(z_vals.shape)
        alpha = sdf2alpha(sdf, ms.decoder["beta"][0])
        K = int(getattr(scene, "color_topk", 0))
        if K and K < z_vals.shape[-1]:
            # Top-K color path: the shared ops/composite.composite_topk
            # helper (same source of truth as renderer.render_core), so
            # kf-sharded BA sees the same loss as the other mappers.
            from myslam_tpu.ops.composite import composite_topk

            def rgb_at(p):
                return decode_rgb_corners(
                    ms.decoder,
                    sample_fused(quads[1], scene.color_layout,
                                 normalize_3d_coordinate(p, bound)),
                    row_map_color)

            depth, color = composite_topk(alpha, z_vals, pts, rgb_at, K)
            return depth, color, sdf, rays_o, rays_d
        rgb = decode_rgb_corners(
            ms.decoder, sample_fused(quads[1], scene.color_layout, p_nor),
            row_map_color).reshape(z_vals.shape + (3,))
        depth, color, _ = composite(alpha, z_vals, rgb)
        return depth, color, sdf, rays_o, rays_d

    # Per-shard ray draw: the shared picker (one source of truth with
    # make_kf_frame_mapper).
    local_rays = make_local_ray_picker(cam, n_rays, kf_axis)

    def map_loss(ms, poses, pose_mask, p, i, j, px_depth, px_color,
                 z_vals, valid):
        quads = _pack(ms)
        poses = jnp.where(pose_mask[:, None] > 0, poses,
                          jax.lax.stop_gradient(poses))
        c2ws = cam_pose_to_matrix(poses)
        depth, color, sdf, rays_o, rays_d = render_batch(
            ms, quads, c2ws[p], i, j, z_vals)
        t_exit = ray_aabb_exit_t(
            jax.lax.stop_gradient(rays_o), jax.lax.stop_gradient(rays_d),
            bound)
        inside = (t_exit >= px_depth) & valid
        dmask = inside & (px_depth > 0)
        loss = sdf_losses(sdf, z_vals, px_depth, dmask, truncation,
                          w_fs, w_center, w_tail, mean_fn=dmean)
        loss = loss + w_color * color_loss(px_color, color, inside,
                                           mean_fn=dmean)
        loss = loss + w_depth * depth_loss(px_depth, depth, dmask,
                                           mean_fn=dmean)
        return loss

    def pose_system(ms, poses, p, i, j, px_depth, px_color, z_vals, valid):
        """psum'd reduced pose normal equations H (W,7,7), g (W,7)."""
        ms = jax.lax.stop_gradient(ms)
        quads = _pack(ms)

        def r_one(pose7, i1, j1, d1, c1, z1):
            c2w = cam_pose_to_matrix(pose7[None])[0]
            depth, color, _, ro, rd = render_batch(
                ms, quads, c2w, i1[None], j1[None], z1[None])
            t_exit = ray_aabb_exit_t(ro, rd, bound)[0]
            inside = (t_exit >= d1) & valid
            md = (inside & (d1 > 0)).astype(jnp.float32)
            mc = inside.astype(jnp.float32)
            return jnp.concatenate([
                (sqrt_wd * (depth[0] - d1) * md)[None],
                sqrt_wc * (color[0] - c1) * mc,
            ])

        def jac_and_res(pose7, i1, j1, d1, c1, z1):
            # ONE forward + 4 pullbacks (one per residual row): cheaper
            # than 7 forward-mode tangents for a 4-vector residual, and
            # reverse mode rides the hand-VJP sampling kernel.
            r1, pull = jax.vjp(
                lambda p7: r_one(p7, i1, j1, d1, c1, z1), pose7)
            J1 = jax.vmap(lambda e: pull(e)[0])(jnp.eye(4))  # (4, 7)
            return J1, r1

        pose_of_ray = poses[p]  # (R, 7)
        J, r = jax.vmap(jac_and_res)(
            pose_of_ray, i, j, px_depth, px_color, z_vals)  # (R,4,7),(R,4)
        W = poses.shape[0]
        H = jnp.zeros((W, 7, 7)).at[p].add(
            jnp.einsum("rij,rik->rjk", J, J))
        g = jnp.zeros((W, 7)).at[p].add(jnp.einsum("rij,ri->rj", J, r))
        return (jax.lax.psum(H, kf_axis), jax.lax.psum(g, kf_axis))

    def ba_local(ms, poses, pose_mask, slot_kf, n_slots, kf_colors_l,
                 kf_depths_l, key):
        opt_state = map_opt.init(ms)
        pose_state = pose_opt.init(poses)

        def step(carry, it):
            ms, poses, opt_state, pose_state = carry
            k = jax.random.fold_in(key, it)
            k_ray, k_z = jax.random.split(k)
            p, i, j, px_depth, px_color, valid = local_rays(
                slot_kf, n_slots, kf_colors_l, kf_depths_l, k_ray)
            z_vals = depth_guided_z_vals(
                k_z, px_depth, truncation, scene.n_stratified,
                scene.n_importance, scene.perturb)

            if pose_solver == "schur":
                # Pose solve FIRST: the first-order map step would
                # otherwise start absorbing the pose error (gauge
                # coupling) before the reduced system corrects it.
                def solve(poses):
                    H, g = pose_system(ms, poses, p, i, j, px_depth,
                                       px_color, z_vals, valid)
                    damp = lm_damping * jnp.maximum(
                        jnp.trace(H, axis1=1, axis2=2)[:, None] / 7.0,
                        1e-6)
                    Hd = H + damp[..., None] * jnp.eye(7)
                    delta = -jnp.linalg.solve(Hd, g[..., None])[..., 0]
                    return poses + delta * pose_mask[:, None]

                if schur_interval > 1:
                    # Amortized GN: poses move slowly vs the map, so the
                    # (1.26x-per-iteration) reduced solve can run every
                    # k-th iteration (tools/bench_pose_solver --interval).
                    poses = jax.lax.cond(
                        it % schur_interval == 0, solve,
                        lambda p: p, poses)
                else:
                    poses = solve(poses)
                loss, grads = jax.value_and_grad(map_loss)(
                    ms, jax.lax.stop_gradient(poses), pose_mask, p, i, j,
                    px_depth, px_color, z_vals, valid)
                # Gradients taken INSIDE shard_map (check_vma=False) are
                # per-shard partials — each shard saw only its own rays.
                # One explicit psum makes them the exact global gradient;
                # without it every shard's Adam applies a different update
                # and the "replicated" map silently diverges across shards.
                grads = jax.lax.psum(grads, kf_axis)
                updates, opt_state2 = map_opt.update(grads, opt_state, ms)
                ms = optax.apply_updates(ms, updates)
                return (ms, poses, opt_state2, pose_state), loss

            def joint(params):
                return map_loss(params["map"], params["poses"], pose_mask,
                                p, i, j, px_depth, px_color, z_vals, valid)

            loss, grads = jax.value_and_grad(joint)(
                {"map": ms, "poses": poses})
            grads = jax.lax.psum(grads, kf_axis)  # see schur branch note
            updates, opt_state2 = map_opt.update(grads["map"], opt_state, ms)
            ms = optax.apply_updates(ms, updates)
            pu, pose_state2 = pose_opt.update(grads["poses"], pose_state,
                                              poses)
            poses = optax.apply_updates(poses, pu)
            return (ms, poses, opt_state2, pose_state2), loss

        (ms, poses, _, _), losses = jax.lax.scan(
            step, (ms, poses, opt_state, pose_state),
            jnp.arange(n_iters))
        return ms, poses, losses

    smapped = partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(kf_axis), P(kf_axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(ba_local)

    return jax.jit(smapped, donate_argnums=(0,))


def make_kf_frame_mapper(cfg: dict, scene, cam, selector, w_max: int,
                         scratch_slot: int, mesh: Mesh,
                         kf_axis: str = "kf", importance: bool = True,
                         pose_solver: str = "adam",
                         lm_damping: float = 0.1,
                         packed: bool = False,
                         schur_interval: int = 1):
    """Keyframe-partitioned BA as the fused PRODUCT frame mapper.

    Same contract as engine/mapper.make_frame_mapper, with kf_colors /
    kf_depths sharded P(kf) over the slot axis (slot capacity must divide
    by the mesh size; the scheduler pads it).  Per chunk, one jitted
    program runs:

      * init (start == 0): scratch dequantization into the sharded
        buffers, device-side window selection on replicated poses, pose
        vector + optimizer init — plain-jit global view;
      * the iteration scan under shard_map over ``kf``: each shard draws
        its ray budget from the window slots it owns (imagery stays
        local), the masked loss means psum to the exact global loss
        (renderer.render_core — the importance branch included), map
        gradients psum once per iteration, poses step by Adam or by the
        damped Gauss-Newton solve of the psum'd reduced (Schur) system;
      * pose write-back + keyframe admission — plain-jit global view
        (admission writes the replicated scratch values, so no
        cross-shard imagery read).

    This is the product wiring of the library-level make_distributed_ba
    (VERDICT r1 item 1); the reference's counterpart is the whole
    2-process design (src/ESLAM.py:246-260).

    kf x ray-DP composition (VERDICT r4 item 5): pass a TWO-axis mesh
    ('kf', 'dp') — imagery shards over 'kf' only; each kf row's ray
    budget further splits over its 'dp' columns (distinct pixel draws
    per column via key folding), and every loss/gradient/pose psum
    reduces over BOTH axes.  This lifts pure ray-DP's gradient-ring
    saturation point: the per-device ray work divides by kf*dp while
    the slot ownership (and thus imagery locality) stays kf-only.
    """
    from myslam_tpu.core.quaternion import matrix_to_cam_pose
    from myslam_tpu.render.renderer import (
        build_z_vals_core,
        make_queries,
        render_core,
    )

    m = cfg["mapping"]
    dp_axis = "dp" if "dp" in mesh.axis_names else None
    red_axes = (kf_axis,) if dp_axis is None else (kf_axis, dp_axis)
    n_shards = mesh.shape[kf_axis]
    n_dp = mesh.shape[dp_axis] if dp_axis is not None else 1
    n_rays = max(int(m["pixels"]) // (n_shards * n_dp), 1)
    w_color, w_depth = float(m["w_color"]), float(m["w_depth"])
    w_fs, w_center, w_tail = (
        float(m["w_sdf_fs"]), float(m["w_sdf_center"]), float(m["w_sdf_tail"]))
    lr = m["lr"]
    learnable_beta = bool(cfg["rendering"].get("learnable_beta", True))
    truncation = float(scene.truncation)
    bound = scene.bound_array
    sqrt_wd = float(np.sqrt(w_depth))
    sqrt_wc = float(np.sqrt(w_color))
    # mapping.map_bf16 (engine/mapper.py): bf16 quad-atlas reads.
    quad_dtype = (jnp.bfloat16 if bool(m.get("map_bf16", False))
                  else None)

    label_tree = {
        "map": MapState(
            sdf_atlas="planes",
            color_atlas="c_planes",
            decoder={
                "sdf": [["decoders", "decoders"], ["decoders", "decoders"]],
                "rgb": [["decoders", "decoders"], ["decoders", "decoders"]],
                "sdf_out": ["decoders", "decoders"],
                "rgb_out": ["decoders", "decoders"],
                "beta": "decoders" if learnable_beta else "frozen",
            },
        ),
        # Schur mode: poses leave the first-order system entirely (their
        # loss gradient is stopped; the GN solve updates them instead).
        "poses": "poses" if pose_solver != "schur" else "frozen",
    }
    optimizer = optax.multi_transform(
        {
            "decoders": optax.adam(float(lr["decoders_lr"])),
            "planes": optax.adam(float(lr["planes_lr"])),
            "c_planes": optax.adam(float(lr["c_planes_lr"])),
            "poses": optax.adam(float(m["joint_opt_cam_lr"])),
            "frozen": optax.set_to_zero(),
        },
        label_tree,
    )
    pick_rays = make_local_ray_picker(cam, n_rays, kf_axis, packed=packed,
                                  dp_axis=dp_axis)

    def dmean(x, mask):
        mk = mask.astype(x.dtype)
        s = jax.lax.psum(jnp.sum(x * mk), red_axes)
        c = jax.lax.psum(jnp.sum(mk), red_axes)
        return s / jnp.maximum(c, 1.0)

    def loss_fn(params, pose_mask, p, i, j, px_depth, px_color, valid, key):
        ms = params["map"]
        poses = params["poses"]
        if pose_solver == "schur":
            poses = jax.lax.stop_gradient(poses)
        else:
            poses = jnp.where(pose_mask[:, None] > 0, poses,
                              jax.lax.stop_gradient(poses))
        c2ws = cam_pose_to_matrix(poses)
        rays_o, rays_d = rays_from_uv(
            i, j, c2ws[p], cam.fx, cam.fy, cam.cx, cam.cy)
        t_exit = ray_aabb_exit_t(
            jax.lax.stop_gradient(rays_o), jax.lax.stop_gradient(rays_d),
            bound)
        inside = (t_exit >= px_depth) & valid

        q = make_queries(ms, scene, quad_dtype=quad_dtype)
        depth, color, sdf, z_vals = render_core(
            key, scene, rays_o, rays_d, px_depth, importance, q)
        dmask = inside & (px_depth > 0)
        loss = sdf_losses(sdf, z_vals, px_depth, dmask, truncation,
                          w_fs, w_center, w_tail, mean_fn=dmean)
        loss = loss + w_color * color_loss(px_color, color, inside,
                                           mean_fn=dmean)
        loss = loss + w_depth * depth_loss(px_depth, depth, dmask,
                                           mean_fn=dmean)
        return loss

    def pose_system(ms, poses, pose_mask, p, i, j, px_depth, px_color,
                    valid, key):
        """psum'd reduced pose normal equations H (W,7,7), g (W,7).

        Reverse-mode Jacobians: one shared forward + 4 pullbacks per
        ray through the hand-VJP sampling kernel; z-values are built once
        per iteration (no pose gradient flows through them, matching the
        reference's no-grad z construction)."""
        ms = jax.lax.stop_gradient(ms)
        q = make_queries(ms, scene, quad_dtype=quad_dtype)
        c2ws = cam_pose_to_matrix(poses)
        rays_o, rays_d = rays_from_uv(
            i, j, c2ws[p], cam.fx, cam.fy, cam.cx, cam.cy)
        z_vals = build_z_vals_core(
            key, scene, rays_o, rays_d, px_depth, importance, q)

        def r_one(pose7, i1, j1, d1, c1, z1):
            # INTENTIONALLY exact-color (no top-K) even when the map
            # loss uses color_topk: the Schur residual is differentiated
            # wrt the POSE, and top-K's pose gradient is discontinuous
            # at index-set changes — the reduced system stays smooth by
            # compositing color at every sample (the per-ray cost is
            # paid once per pose-solve, not per map iteration).
            c2w = cam_pose_to_matrix(pose7[None])[0]
            ro, rd = rays_from_uv(
                i1[None], j1[None], c2w, cam.fx, cam.fy, cam.cx, cam.cy)
            pts = ro[:, None, :] + rd[:, None, :] * z1[None][..., None]
            p_nor = normalize_3d_coordinate(pts.reshape(-1, 3), bound)
            sdf = q.sdf(p_nor).reshape(1, -1)
            rgb = q.rgb(p_nor).reshape(1, -1, 3)
            alpha = sdf2alpha(sdf, q.beta)
            depth, color, _ = composite(alpha, z1[None], rgb)
            t_exit = ray_aabb_exit_t(ro, rd, bound)[0]
            ins = (t_exit >= d1) & valid
            md = (ins & (d1 > 0)).astype(jnp.float32)
            mc = ins.astype(jnp.float32)
            return jnp.concatenate([
                (sqrt_wd * (depth[0] - d1) * md)[None],
                sqrt_wc * (color[0] - c1) * mc,
            ])

        def jac_and_res(pose7, i1, j1, d1, c1, z1):
            r1, pull = jax.vjp(
                lambda p7: r_one(p7, i1, j1, d1, c1, z1), pose7)
            J1 = jax.vmap(lambda e: pull(e)[0])(jnp.eye(4))  # (4, 7)
            return J1, r1

        pose_of_ray = poses[p]
        J, r = jax.vmap(jac_and_res)(
            pose_of_ray, i, j, px_depth, px_color, z_vals)
        W = poses.shape[0]
        H = jnp.zeros((W, 7, 7)).at[p].add(jnp.einsum("rij,rik->rjk", J, J))
        g = jnp.zeros((W, 7)).at[p].add(jnp.einsum("rij,ri->rj", J, r))
        return jax.lax.psum(H, red_axes), jax.lax.psum(g, red_axes)

    def make_ba_scan(chunk: int):
        def ba_scan(params, opt_state, sel, kf_colors_l, kf_depths_l, key,
                    start, lr_scale):
            slot_kf, n_slots, pose_mask = sel

            def step(carry, it):
                params, opt_state = carry
                k = jax.random.fold_in(key, it)
                k_ray, k_z = jax.random.split(k)
                p, i, j, px_depth, px_color, valid = pick_rays(
                    slot_kf, n_slots, kf_colors_l, kf_depths_l, k_ray)

                if pose_solver == "schur":
                    # Pose solve FIRST (gauge coupling: the first-order
                    # map step would absorb pose error otherwise).
                    def solve(poses):
                        H, g = pose_system(
                            params["map"], poses, pose_mask, p, i, j,
                            px_depth, px_color, valid, k_z)
                        damp = lm_damping * jnp.maximum(
                            jnp.trace(H, axis1=1, axis2=2)[:, None] / 7.0,
                            1e-6)
                        Hd = H + damp[..., None] * jnp.eye(7)
                        delta = -jnp.linalg.solve(
                            Hd, g[..., None])[..., 0]
                        return poses + delta * pose_mask[:, None]

                    params = dict(params)
                    if schur_interval > 1:
                        params["poses"] = jax.lax.cond(
                            it % schur_interval == 0, solve,
                            lambda p: p, params["poses"])
                    else:
                        params["poses"] = solve(params["poses"])

                loss, grads = jax.value_and_grad(loss_fn)(
                    params, pose_mask, p, i, j, px_depth, px_color, valid,
                    k_z)
                # Per-shard partials -> exact global gradient (see
                # make_distributed_ba's ba_local note).
                grads = jax.lax.psum(grads, red_axes)
                updates, opt_state = optimizer.update(
                    grads, opt_state, params)
                updates = {
                    "map": jax.tree_util.tree_map(
                        lambda u: u * lr_scale, updates["map"]),
                    "poses": updates["poses"],
                }
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), start + jnp.arange(chunk))
            return params, opt_state, losses

        return shard_map(
            ba_scan, mesh=mesh,
            in_specs=(P(), P(), P(), P(kf_axis), P(kf_axis), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False)

    kf_sharding_ = NamedSharding(mesh, P(kf_axis))

    def run_chunk(params, opt_state, sel, est_dev, kf_est, kf_gt,
                  kf_colors, kf_depths, scr_color_u8, scr_depth_u16,
                  inv_q, gt_c2w, idx, count, key, start, lr_scale,
                  joint_opt, admit, chunk: int):
        scr_depth = scr_depth_u16.astype(jnp.float32) * inv_q
        if not packed:
            scr_color = (scr_color_u8.astype(jnp.float32) * (1.0 / 255.0)
                         ).astype(kf_colors.dtype)

        def write_scr(kf_colors, kf_depths, dst):
            if packed:
                d_u16, d_q = kf_depths
                return (kf_colors.at[dst].set(scr_color_u8),
                        (d_u16.at[dst].set(scr_depth_u16),
                         d_q.at[dst].set(inv_q)))
            return (kf_colors.at[dst].set(scr_color),
                    kf_depths.at[dst].set(scr_depth))

        def init_fn(op):
            params, opt_state, sel, kf_colors, kf_depths = op
            kf_colors, kf_depths = write_scr(kf_colors, kf_depths,
                                             scratch_slot)
            cur_c2w = est_dev[idx]
            slot_kf, n_slots, pose_mask = selector(
                kf_est, count, cur_c2w, scr_depth,
                jax.random.fold_in(key, 0x7FFFFFFF), joint_opt)
            c2ws = kf_est[slot_kf]
            is_cur = jnp.arange(w_max) == n_slots - 1
            c2ws = jnp.where(is_cur[:, None, None], cur_c2w[None], c2ws)
            params = {"map": params["map"],
                      "poses": matrix_to_cam_pose(c2ws)}
            opt_state = optimizer.init(params)
            return params, opt_state, (slot_kf, n_slots, pose_mask), \
                kf_colors, kf_depths

        params, opt_state, sel, kf_colors, kf_depths = jax.lax.cond(
            start == 0, init_fn, lambda op: op,
            (params, opt_state, sel, kf_colors, kf_depths))
        slot_kf, n_slots, pose_mask = sel

        params, opt_state, losses = make_ba_scan(chunk)(
            params, opt_state, sel, kf_colors, kf_depths, key, start,
            lr_scale)

        # Masked pose write-back + admission (global view; admission
        # writes the replicated scratch values so no cross-shard read).
        c2ws_out = cam_pose_to_matrix(params["poses"])
        old = kf_est[slot_kf]
        kf_est = kf_est.at[slot_kf].set(
            jnp.where(pose_mask[:, None, None] > 0, c2ws_out, old))
        cur = c2ws_out[n_slots - 1]
        est_dev = est_dev.at[idx].set(
            jnp.where(joint_opt > 0, cur, est_dev[idx]))

        dst = jnp.where(admit > 0, count, scratch_slot)
        kf_colors, kf_depths = write_scr(kf_colors, kf_depths, dst)
        kf_est = kf_est.at[dst].set(est_dev[idx])
        kf_gt = kf_gt.at[dst].set(gt_c2w)
        kf_colors = jax.lax.with_sharding_constraint(kf_colors, kf_sharding_)
        kf_depths = jax.lax.with_sharding_constraint(kf_depths, kf_sharding_)
        return (params, opt_state, sel, est_dev, kf_est, kf_gt,
                kf_colors, kf_depths, losses)

    chunk_iters = int(m.get("chunk_iters", 0)) or int(m["iters"])
    jit_chunk = jax.jit(
        run_chunk, static_argnames=("chunk",),
        donate_argnums=(0, 1, 3, 4, 5, 6, 7))
    jit_init = jax.jit(optimizer.init)

    def map_frame(ms, opt_buf, est_dev, kf_est, kf_gt, kf_colors,
                  kf_depths, scr_color_u8, scr_depth_u16, inv_q, gt_c2w,
                  idx, count, key, *, iters: int, lr_factor: float,
                  joint_opt: bool, admit: bool, on_chunk=None):
        params = {"map": ms, "poses": jnp.zeros((w_max, 7), jnp.float32)}
        sel = (jnp.zeros((w_max,), jnp.int32), jnp.int32(1),
               jnp.zeros((w_max,), jnp.float32))
        lr_scale = jnp.float32(lr_factor)
        jo = jnp.float32(1.0 if joint_opt else 0.0)
        ad = jnp.float32(1.0 if admit else 0.0)
        losses = []
        done = 0
        while done < iters:
            n = min(chunk_iters, iters - done)
            (params, opt_buf, sel, est_dev, kf_est, kf_gt, kf_colors,
             kf_depths, chunk_losses) = jit_chunk(
                params, opt_buf, sel, est_dev, kf_est, kf_gt, kf_colors,
                kf_depths, scr_color_u8, scr_depth_u16,
                jnp.float32(inv_q), gt_c2w, jnp.int32(idx),
                jnp.int32(count), key, jnp.int32(done), lr_scale, jo, ad,
                chunk=n)
            losses.append(chunk_losses)
            if on_chunk is not None:
                on_chunk(params, sel, done, done + n)
            done += n
        all_losses = (losses[0] if len(losses) == 1
                      else jnp.concatenate(losses, axis=0))
        return (params["map"], opt_buf, est_dev, kf_est, kf_gt, kf_colors,
                kf_depths, all_losses)

    map_frame.jit_init = jit_init
    map_frame.chunk_iters = chunk_iters
    return map_frame

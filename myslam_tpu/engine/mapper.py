"""Mapping / windowed bundle adjustment as one jitted device program.

Re-design of the reference Mapper's optimize_mapping
(src/Mapper.py:211-364): the whole multi-iteration joint optimization of
{plane atlases, decoders, (optionally) window poses} runs as a lax.scan
inside a single jit, with the keyframe window described by STATIC-shape
slot arrays:

  * the window has W_MAX slots; slot i holds an index into the keyframe
    store's image buffers (the current frame occupies a scratch slot);
  * the per-iteration ray budget N is split round-robin over the active
    slots (ray r reads from slot r % n_active), reproducing the
    reference's pixels-per-image split without shape specialization;
  * pose freezing (oldest window frame; all frames when joint_opt is
    off) is a per-slot 0/1 mask applied via stop_gradient.

The optimizer is rebuilt fresh per call (so Adam moments reset per mapped
frame, matching the reference constructing torch.optim.Adam per call) with
the reference's per-group learning rates (src/Mapper.py:291-306).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from myslam_tpu.core.geometry import ray_aabb_exit_t, rays_from_uv
from myslam_tpu.core.losses import color_loss, depth_loss, sdf_losses
from myslam_tpu.core.quaternion import cam_pose_to_matrix
from myslam_tpu.engine.camera import Camera
from myslam_tpu.models.planes import MapState
from myslam_tpu.ops.pixel_gather import gather_rgb, gather_scalar
from myslam_tpu.render.renderer import (
    SceneGeometry,
    make_queries,
    render_core,
)


def _cat_losses(losses, iters):
    """Concatenate per-chunk loss vectors; iters=0 ran no chunks."""
    if not losses:
        return jnp.zeros((0,), jnp.float32)
    out = losses[0] if len(losses) == 1 else jnp.concatenate(losses, 0)
    return out[:iters]


def make_row_sharder(opt_sharding, min_rows: int = 4096):
    """Constraint applied to atlas-shaped leaves ((rows, C), rows large)
    of gradient/optimizer pytrees: row-shard them over the DP mesh.

    ZeRO-style optimizer partitioning for ray DP: the dense Adam update
    of the plane atlases is REPLICATED work under plain DP (measured
    0.14 ms/iter on v5e at the Replica operating point — negligible
    there, but it grows linearly with atlas rows while everything else
    shards; see PERF.md/SCALING.md).  Row-sharding the Adam moments and
    the gradient feeding them makes XLA reduce-scatter the gradients,
    update 1/n of the rows per chip, and all-gather the updated params —
    the classic ZeRO-1 exchange, expressed purely as sharding
    constraints, mathematically identical to the replicated update.
    """
    import jax.tree_util as jtu

    def shard(tree):
        def f(x):
            if (hasattr(x, "ndim") and x.ndim == 2
                    and x.shape[0] >= min_rows):
                return jax.lax.with_sharding_constraint(x, opt_sharding)
            return x
        return jtu.tree_map(f, tree)

    return shard


def _build_core(cfg: dict, scene: SceneGeometry, cam: Camera,
                ray_sharding=None, importance: bool = True,
                queries_factory=None, packed: bool = False,
                ray_axis: str | None = None, n_ray_shards: int = 1):
    """Shared mapping internals: the per-iteration loss and the
    multi-transform optimizer (reference LR groups, src/Mapper.py:291-306).
    Used by both make_mapper (bare BA step) and make_frame_mapper (the
    whole mapped frame as one program).

    ``queries_factory(ms) -> FieldQueries`` selects the map backend the
    loss renders against; the default is the replicated quad-atlas
    backend (renderer.make_queries).  parallel/sharded_engine.py passes a
    band-sharded backend here, which makes the WHOLE fused frame program
    (selection, scan, write-back, admission) run against a map
    partitioned across the device mesh with no further changes."""
    m = cfg["mapping"]
    n_rays = int(m["pixels"])
    w_color, w_depth = float(m["w_color"]), float(m["w_depth"])
    w_fs, w_center, w_tail = (
        float(m["w_sdf_fs"]), float(m["w_sdf_center"]), float(m["w_sdf_tail"])
    )
    lr = m["lr"]
    learnable_beta = bool(cfg["rendering"].get("learnable_beta", True))

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
        "poses": "poses",
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

    bound = scene.bound_array
    HW = cam.H * cam.W
    if queries_factory is None:
        # mapping.map_bf16: pack the per-iteration quad atlases to
        # bfloat16 — halves the gather + pack-write HBM traffic of the
        # hot sample path (the same trick tracking defaults to,
        # tracker.py map_bf16).  Mapping differs from tracking in that
        # the map is BEING optimized: the bf16 cast sits between the
        # f32 master atlas and the sampler, so the forward reads (and
        # one rounding of the quad gradient, plane_sample.py
        # _sample_fused_bwd's final astype) are bf16 while Adam's
        # state, the master atlases, and all loss math stay f32.
        # Opt-in (default off = reference-exact f32 reads) — measured
        # A/B + ATE in PERF.md before any default flip.
        map_bf16 = bool(m.get("map_bf16", False))

        def queries_factory(ms):
            return make_queries(
                ms, scene,
                quad_dtype=jnp.bfloat16 if map_bf16 else None)

    if ray_axis is not None:
        # Explicit-collective ray DP (under shard_map): psum'd masked
        # means give the EXACT global loss from per-shard partials.
        # When the mesh size doesn't divide the ray budget, the draw is
        # padded up to rays_per_shard * n_shards and the tail rays are
        # masked out of every loss term (zero contribution).
        rays_per_shard = -(-n_rays // n_ray_shards)
        n_draw = rays_per_shard * n_ray_shards

        def mean_fn(x, mask):
            m = mask.astype(x.dtype)
            s = jax.lax.psum(jnp.sum(x * m), ray_axis)
            c = jax.lax.psum(jnp.sum(m), ray_axis)
            return s / jnp.maximum(c, 1.0)
    else:
        from myslam_tpu.core.losses import masked_mean as mean_fn

    def loss_fn(params, pose_mask, slot_kf, n_slots, kf_colors, kf_depths, key):
        # slot_kf may arrive as a host numpy constant (the window
        # mapper's identity ids — kept numpy so it never becomes a
        # device closure constant); it is tracer-indexed below.
        slot_kf = jnp.asarray(slot_kf)
        ms: MapState = params["map"]
        poses = params["poses"]
        # Freeze masked poses: identical values, zero gradient.
        poses = jnp.where(
            pose_mask[:, None] > 0, poses, jax.lax.stop_gradient(poses)
        )
        c2ws = cam_pose_to_matrix(poses)  # (W, 4, 4)

        k_px, k_render = jax.random.split(key)
        n_drawn = n_rays if ray_axis is None else n_draw
        slot_of_ray = jnp.arange(n_drawn) % n_slots
        kf_of_ray = slot_kf[slot_of_ray]

        ki, kj = jax.random.split(k_px)
        i = jax.random.randint(ki, (n_drawn,), 0, cam.W).astype(jnp.float32)
        j = jax.random.randint(kj, (n_drawn,), 0, cam.H).astype(jnp.float32)
        pad_ok = None
        if ray_axis is not None:
            # Every shard draws the IDENTICAL full ray set (same key)
            # and takes its contiguous slice — the union over shards is
            # exactly the single-device draw (when the budget divides),
            # so the psum'd losses and gradients match the one-chip run
            # draw-for-draw.  Padded tail rays are masked below.
            rl = rays_per_shard
            s0 = jax.lax.axis_index(ray_axis) * rl
            i = jax.lax.dynamic_slice(i, (s0,), (rl,))
            j = jax.lax.dynamic_slice(j, (s0,), (rl,))
            slot_of_ray = jax.lax.dynamic_slice(slot_of_ray, (s0,), (rl,))
            kf_of_ray = slot_kf[slot_of_ray]
            if n_draw != n_rays:
                pad_ok = (s0 + jnp.arange(rl)) < n_rays
        if ray_sharding is not None:
            # Data-parallel scale-out: the ray batch is sharded over the
            # device mesh; the map/pose gradients stay replicated, so XLA
            # inserts the psum over ICI automatically in the backward pass
            # (replaces the reference's single-GPU-only design, SURVEY §5.8).
            i = jax.lax.with_sharding_constraint(i, ray_sharding)
            j = jax.lax.with_sharding_constraint(j, ray_sharding)
            slot_of_ray = jax.lax.with_sharding_constraint(
                slot_of_ray, ray_sharding)
            kf_of_ray = jax.lax.with_sharding_constraint(
                kf_of_ray, ray_sharding)
        flat = (kf_of_ray * HW + j.astype(jnp.int32) * cam.W
                + i.astype(jnp.int32))
        if packed:
            kf_depths_u16, kf_inv_q = kf_depths
            px_depth = (gather_scalar(kf_depths_u16, flat)
                        .astype(jnp.float32) * kf_inv_q[kf_of_ray])
            px_color = (gather_rgb(kf_colors, flat)
                        .astype(jnp.float32) * (1.0 / 255.0))
        else:
            px_depth = gather_scalar(kf_depths, flat)
            px_color = gather_rgb(kf_colors, flat).astype(jnp.float32)

        c2w_of_ray = c2ws[slot_of_ray]
        rays_o, rays_d = rays_from_uv(
            i, j, c2w_of_ray, cam.fx, cam.fy, cam.cx, cam.cy
        )

        t_exit = ray_aabb_exit_t(
            jax.lax.stop_gradient(rays_o), jax.lax.stop_gradient(rays_d), bound
        )
        inside = t_exit >= px_depth  # depth-0 rays pass (reference Mapper.py:328)
        if pad_ok is not None:
            inside = inside & pad_ok  # padded tail rays contribute zero

        # ``importance`` is statically off when the caller knows every pixel
        # in the window has valid depth (then the reference's depth-less
        # sampling branch is provably dead and its coarse pass is skipped).
        depth, color, sdf, z_vals = render_core(
            k_render, scene, rays_o, rays_d, px_depth,
            importance, queries_factory(ms)
        )
        dmask = inside & (px_depth > 0)

        loss = sdf_losses(
            sdf, z_vals, px_depth, dmask, scene.truncation, w_fs,
            w_center, w_tail, mean_fn=mean_fn
        )
        loss = loss + w_color * color_loss(px_color, color, inside,
                                           mean_fn=mean_fn)
        loss = loss + w_depth * depth_loss(px_depth, depth, dmask,
                                           mean_fn=mean_fn)
        return loss

    return loss_fn, optimizer


def _scan_steps(loss_fn, optimizer, params, opt_state, pose_mask, slot_kf,
                n_slots, kf_colors, kf_depths, key, start, lr_scale,
                chunk: int, total=None, opt_sharder=None,
                ray_axis: str | None = None):
    """``chunk`` optimization iterations as one lax.scan.

    ``total`` (traced) caps the GLOBAL iteration count: iterations with
    index >= total are skipped via lax.cond (their loss reads 0).  This
    lets every schedule run in equal-size chunks — the first-frame
    schedule's ragged tail (reference iters_first=1000 with a 15-iter
    steady chunk) pads to a full chunk instead of compiling a second
    program variant; compile wall is a first-class cost here (each fused
    chunk program costs tens of seconds cold through the TPU tunnel).
    """

    def real_step(carry, it):
        params, opt_state = carry
        k = jax.random.fold_in(key, it)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, pose_mask, slot_kf, n_slots, kf_colors, kf_depths, k
        )
        if ray_axis is not None:
            # ONE collective per iteration: the per-shard partial
            # gradients sum to the exact global gradient here.  (The
            # with_sharding_constraint DP path lets the SPMD
            # partitioner place the reductions instead — measured 12x
            # this wire volume, tools/validate_scaling.py.)
            grads = jax.lax.psum(grads, ray_axis)
        if opt_sharder is not None:
            # ZeRO-style: row-shard the atlas grads so the Adam moment
            # update runs 1/n per chip (reduce-scatter + all-gather
            # instead of all-reduce + replicated update).
            grads = opt_sharder(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        if opt_sharder is not None:
            opt_state = opt_sharder(opt_state)
        # Traced lr factor: scales the map groups' updates (the pose
        # group's lr has no factor in the reference, Mapper.py:291-306).
        updates = {
            "map": jax.tree_util.tree_map(
                lambda u: u * lr_scale, updates["map"]),
            "poses": updates["poses"],
        }
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    if total is None:
        step = real_step
    else:
        def step(carry, it):
            return jax.lax.cond(
                it < total, real_step,
                lambda c, _it: (c, jnp.float32(0.0)), carry, it)

    (params, opt_state), losses = jax.lax.scan(
        step, (params, opt_state), start + jnp.arange(chunk)
    )
    return params, opt_state, losses


def make_mapper(
    cfg: dict,
    scene: SceneGeometry,
    cam: Camera,
    ray_sharding=None,
    importance: bool = True,
    queries_factory=None,
    opt_sharding=None,
    dp_mesh=None,
    dp_axis: str = "dp",
):
    """Build a jitted mapping step (bare BA: window described by caller).

    One compiled program covers both of the reference's schedules —
    (iters_first, lr_first_factor) for frame 0 and (iters, lr_factor)
    afterwards (src/Mapper.py:412-417): the iteration count is a host
    loop over fixed-size chunks, and the lr factor rides in as a traced
    scale on the Adam updates (Adam's update is -lr*m_hat/sqrt(v_hat), so
    scaling the update by f is exactly adam(lr*f)).

    Returns map_step(ms, poses7 (W,7), pose_mask (W,), slot_kf (W,),
                     n_slots, kf_colors, kf_depths, key, *,
                     iters, lr_factor)
      -> (ms, poses7, losses (iters,))
    """
    m = cfg["mapping"]
    if dp_mesh is not None:
        ray_sharding = None  # explicit collectives replace the constraint
        opt_sharding = None
    loss_fn, optimizer = _build_core(
        cfg, scene, cam, ray_sharding=ray_sharding, importance=importance,
        queries_factory=queries_factory,
        ray_axis=dp_axis if dp_mesh is not None else None,
        n_ray_shards=dp_mesh.shape[dp_axis] if dp_mesh is not None else 1)
    opt_sharder = (make_row_sharder(opt_sharding)
                   if opt_sharding is not None else None)

    def run_chunk(
        params,
        opt_state,
        pose_mask: jnp.ndarray,
        slot_kf: jnp.ndarray,
        n_slots: jnp.ndarray,
        kf_colors: jnp.ndarray,
        kf_depths: jnp.ndarray,
        key: jax.Array,
        start: jnp.ndarray,
        lr_scale: jnp.ndarray,
        total: jnp.ndarray,
        chunk: int,
    ):
        if dp_mesh is None:
            return _scan_steps(
                loss_fn, optimizer, params, opt_state, pose_mask, slot_kf,
                n_slots, kf_colors, kf_depths, key, start, lr_scale,
                chunk, total=total, opt_sharder=opt_sharder)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def body(params, opt_state, pose_mask, slot_kf, n_slots,
                 kf_colors, kf_depths, key, start, lr_scale, total):
            return _scan_steps(
                loss_fn, optimizer, params, opt_state, pose_mask, slot_kf,
                n_slots, kf_colors, kf_depths, key, start, lr_scale,
                chunk, total=total, ray_axis=dp_axis)

        return shard_map(
            body, mesh=dp_mesh, in_specs=(P(),) * 11,
            out_specs=(P(), P(), P()), check_vma=False)(
            params, opt_state, pose_mask, slot_kf, n_slots, kf_colors,
            kf_depths, key, start, lr_scale, total)

    # The optimization is executed in bounded-duration device programs
    # (<= chunk_iters iterations each) with the Adam state carried across
    # calls: one arbitrarily long first-frame schedule (reference
    # iters_first=1000, src/Mapper.py:412-417) would otherwise run as a
    # single ~minute-long XLA program, which trips runtime watchdogs.
    # The default chunk equals the steady schedule's iteration count so
    # the steady per-frame step and the first-frame schedule share one
    # compiled program (the first frame adds at most one shorter-chunk
    # compile for the remainder).
    chunk_iters = int(cfg["mapping"].get("chunk_iters", 0)) or int(m["iters"])
    jit_chunk = jax.jit(
        run_chunk, static_argnames=("chunk",), donate_argnums=(0, 1))
    jit_init = jax.jit(optimizer.init)

    def map_step(
        ms: MapState,
        poses: jnp.ndarray,
        pose_mask: jnp.ndarray,
        slot_kf: jnp.ndarray,
        n_slots: jnp.ndarray,
        kf_colors: jnp.ndarray,
        kf_depths: jnp.ndarray,
        key: jax.Array,
        *,
        iters: int,
        lr_factor: float,
    ):
        # Donation contract: ``ms`` is consumed (updated in place across
        # chunks); ``poses`` is copied so the caller's buffer stays valid.
        params = {"map": ms, "poses": jnp.copy(poses)}
        opt_state = jit_init(params)
        lr_scale = jnp.float32(lr_factor)
        total = jnp.int32(iters)
        losses = []
        # Equal-size chunks ALWAYS (the ragged tail is masked inside the
        # program via ``total``) -> exactly one compiled variant per
        # mapper across all schedules.
        for c in range(-(-iters // chunk_iters)):
            params, opt_state, chunk_losses = jit_chunk(
                params, opt_state, pose_mask, slot_kf, n_slots,
                kf_colors, kf_depths, key, jnp.int32(c * chunk_iters),
                lr_scale, total, chunk=chunk_iters)
            losses.append(chunk_losses)
        all_losses = _cat_losses(losses, iters)
        return params["map"], params["poses"], all_losses

    # Exposed for profiling / AOT tooling.
    map_step.jit_chunk = jit_chunk
    map_step.jit_init = jit_init
    map_step.chunk_iters = chunk_iters
    return map_step


def make_frame_mapper(
    cfg: dict,
    scene: SceneGeometry,
    cam: Camera,
    selector,
    w_max: int,
    scratch_slot: int,
    ray_sharding=None,
    importance: bool = True,
    queries_factory=None,
    opt_sharding=None,
    packed: bool = False,
    dp_mesh=None,
    dp_axis: str = "dp",
):
    """The WHOLE mapped frame as one device program (per iteration chunk).

    ``dp_mesh``: explicit-collective ray DP — the iteration scan runs
    under shard_map over this mesh with every shard drawing its slice of
    the (identical) ray set, psum'd masked-mean losses, and ONE psum of
    the gradient pytree per iteration.  Draw-for-draw identical to the
    single-device run.  The alternative ``ray_sharding``
    (with_sharding_constraint) path leaves collective placement to the
    SPMD partitioner, which was measured to all-reduce each atlas
    gradient ~3x (12x the wire volume — tools/validate_scaling.py);
    prefer ``dp_mesh``.

    ``packed=True``: the keyframe imagery buffers are the quantized
    device store (KeyframeStore ``device="packed"``): ``kf_colors`` is
    uint8 and ``kf_depths`` is the pytree ``(depths_u16, inv_q (cap,))``;
    scratch writes/admission copy raw wire bytes and the per-iteration
    loss dequantizes only its sampled pixels.  Same program structure,
    half the HBM — the TPU-native replacement for the reference's
    ``keyframe_device: cpu`` host store (src/Mapper.py:429-432).

    Everything the scheduler used to dispatch separately per mapped frame
    — scratch-imagery dequantization, BA-window selection + pose assembly,
    optimizer init, the iteration scan, the masked pose write-back, and
    keyframe admission — fuses into a single jit with donated buffers.
    On a remote device each extra dispatch costs ~3-5 ms of tunnel
    latency; this cuts ~7 dispatches per mapped frame to 1 in the steady
    schedule.

    Selection/init run under ``start == 0`` (lax.cond); write-back and
    admission run after every chunk, masked — they are idempotent, so
    multi-chunk first-frame schedules just rewrite the same values.

    Returns map_frame(ms, opt_buf, est_dev, kf_est, kf_gt, kf_colors,
                      kf_depths, scr_color_u8, scr_depth_u16, inv_q,
                      gt_c2w, idx, count, key, *, iters, lr_factor,
                      joint_opt, admit)
      -> (ms, opt_buf, est_dev, kf_est, kf_gt, kf_colors, kf_depths,
          losses (iters,))
    where opt_buf is a correctly-shaped optimizer-state pytree whose
    VALUES are ignored (the init branch overwrites them); callers keep it
    alive across mapped frames (donated through every call).
    """
    from myslam_tpu.core.quaternion import matrix_to_cam_pose

    m = cfg["mapping"]
    if dp_mesh is not None:
        ray_sharding = None  # explicit collectives replace the constraint
        opt_sharding = None
    loss_fn, optimizer = _build_core(
        cfg, scene, cam, ray_sharding=ray_sharding, importance=importance,
        queries_factory=queries_factory, packed=packed,
        ray_axis=dp_axis if dp_mesh is not None else None,
        n_ray_shards=dp_mesh.shape[dp_axis] if dp_mesh is not None else 1)
    opt_sharder = (make_row_sharder(opt_sharding)
                   if opt_sharding is not None else None)

    def scan_steps(params, opt_state, pose_mask, slot_kf, n_slots,
                   kf_colors, kf_depths, key, start, lr_scale, total,
                   chunk: int):
        if dp_mesh is None:
            return _scan_steps(
                loss_fn, optimizer, params, opt_state, pose_mask, slot_kf,
                n_slots, kf_colors, kf_depths, key, start, lr_scale,
                chunk, total=total, opt_sharder=opt_sharder)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def body(params, opt_state, pose_mask, slot_kf, n_slots,
                 kf_colors, kf_depths, key, start, lr_scale, total):
            return _scan_steps(
                loss_fn, optimizer, params, opt_state, pose_mask, slot_kf,
                n_slots, kf_colors, kf_depths, key, start, lr_scale,
                chunk, total=total, ray_axis=dp_axis)

        return shard_map(
            body, mesh=dp_mesh, in_specs=(P(),) * 11,
            out_specs=(P(), P(), P()), check_vma=False)(
            params, opt_state, pose_mask, slot_kf, n_slots, kf_colors,
            kf_depths, key, start, lr_scale, total)

    def run_chunk(params, opt_state, sel, est_dev, kf_est, kf_gt,
                  kf_colors, kf_depths, scr_color_u8, scr_depth_u16,
                  inv_q, gt_c2w, idx, count, key, start, lr_scale,
                  total, joint_opt, admit, chunk: int):
        def init_fn(op):
            params, opt_state, sel, kf_colors, kf_depths = op
            if packed:
                kf_colors = kf_colors.at[scratch_slot].set(scr_color_u8)
                d_u16, d_q = kf_depths
                d_u16 = d_u16.at[scratch_slot].set(scr_depth_u16)
                d_q = d_q.at[scratch_slot].set(inv_q)
                kf_depths = (d_u16, d_q)
                cur_depth = (d_u16[scratch_slot].astype(jnp.float32)
                             * d_q[scratch_slot])
            else:
                kf_colors = kf_colors.at[scratch_slot].set(
                    (scr_color_u8.astype(jnp.float32) * (1.0 / 255.0)
                     ).astype(kf_colors.dtype))
                kf_depths = kf_depths.at[scratch_slot].set(
                    scr_depth_u16.astype(jnp.float32) * inv_q)
                cur_depth = kf_depths[scratch_slot]
            cur_c2w = est_dev[idx]
            slot_kf, n_slots, pose_mask = selector(
                kf_est, count, cur_c2w, cur_depth,
                jax.random.fold_in(key, 0x7FFFFFFF), joint_opt)
            c2ws = kf_est[slot_kf]  # (w_max, 4, 4)
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

        params, opt_state, losses = scan_steps(
            params, opt_state, pose_mask, slot_kf, n_slots, kf_colors,
            kf_depths, key, start, lr_scale, total, chunk)

        # Masked pose write-back (reference Mapper.py:352-364,425-426:
        # keyframe entries for optimized window slots; the trajectory only
        # for the current frame, only under joint_opt).
        c2ws_out = cam_pose_to_matrix(params["poses"])  # (w_max, 4, 4)
        old = kf_est[slot_kf]
        kf_est = kf_est.at[slot_kf].set(
            jnp.where(pose_mask[:, None, None] > 0, c2ws_out, old))
        cur = c2ws_out[n_slots - 1]
        est_dev = est_dev.at[idx].set(
            jnp.where(joint_opt > 0, cur, est_dev[idx]))

        # Keyframe admission (reference Mapper.py:429-432): copy the
        # scratch slot's imagery/poses into slot ``count``.  When not
        # admitting, dst == scratch: a harmless self-rewrite.
        dst = jnp.where(admit > 0, count, scratch_slot)
        kf_colors = kf_colors.at[dst].set(kf_colors[scratch_slot])
        if packed:
            d_u16, d_q = kf_depths
            kf_depths = (d_u16.at[dst].set(d_u16[scratch_slot]),
                         d_q.at[dst].set(d_q[scratch_slot]))
        else:
            kf_depths = kf_depths.at[dst].set(kf_depths[scratch_slot])
        kf_est = kf_est.at[dst].set(est_dev[idx])
        kf_gt = kf_gt.at[dst].set(gt_c2w)
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
        total = jnp.int32(iters)
        jo = jnp.float32(1.0 if joint_opt else 0.0)
        ad = jnp.float32(1.0 if admit else 0.0)
        losses = []
        # Equal-size chunks always (ragged tail masked via ``total``):
        # one compiled variant per mapper across all schedules.
        for c in range(-(-iters // chunk_iters)):
            done = c * chunk_iters
            (params, opt_buf, sel, est_dev, kf_est, kf_gt, kf_colors,
             kf_depths, chunk_losses) = jit_chunk(
                params, opt_buf, sel, est_dev, kf_est, kf_gt, kf_colors,
                kf_depths, scr_color_u8, scr_depth_u16,
                jnp.float32(inv_q), gt_c2w, jnp.int32(idx),
                jnp.int32(count), key, jnp.int32(done), lr_scale, total,
                jo, ad, chunk=chunk_iters)
            losses.append(chunk_losses)
            if on_chunk is not None:
                # Mid-optimization hook at the chunk boundary (in-loop
                # visualization, reference Mapper.py:310) — sees the
                # CURRENT map/poses and the resolved window selection.
                on_chunk(params, sel, done,
                         min(done + chunk_iters, iters))
        all_losses = _cat_losses(losses, iters)
        return (params["map"], opt_buf, est_dev, kf_est, kf_gt, kf_colors,
                kf_depths, all_losses)

    map_frame.jit_init = jit_init
    map_frame.chunk_iters = chunk_iters
    return map_frame


def make_window_frame_mapper(
    cfg: dict,
    scene: SceneGeometry,
    cam: Camera,
    w_max: int,
    ray_sharding=None,
    importance: bool = True,
    opt_sharding=None,
):
    """Fused mapped frame over a HOST-side store with a DEVICE line-cache
    (keyframe_device: host_staged).

    Selection runs as its own small device program (it needs only poses
    and the current depth — reference Mapper.py:146-209); the host then
    ensures the selected slots' quantized imagery is resident in the
    store's cache slab (KeyframeStore.stage_lines — uploads only the
    slots NOT already cached, usually none) and this program runs the BA
    scan + pose write-back reading pixels straight from the slab via
    ``win_lines``, exactly the packed-store gather path (reference
    keyframe_device handling, Mapper.py:268-287).  Keyframe imagery
    admission is host-side (plus a device-side scratch-line bind); pose
    admission happens here.

    Returns window_map(ms, opt_buf, est_dev, kf_est, kf_gt, slot_kf,
                       n_slots, pose_mask, cache_colors, cache_depths,
                       cache_inv_q, win_lines (w_max,), gt_c2w, idx,
                       count, key, *, iters, lr_factor, joint_opt,
                       admit, on_chunk)
      -> (ms, opt_buf, est_dev, kf_est, kf_gt, losses)
    """
    from myslam_tpu.core.quaternion import matrix_to_cam_pose

    m = cfg["mapping"]
    loss_fn, optimizer = _build_core(
        cfg, scene, cam, ray_sharding=ray_sharding, importance=importance,
        packed=True)
    opt_sharder = (make_row_sharder(opt_sharding)
                   if opt_sharding is not None else None)

    def run_chunk(params, opt_state, est_dev, kf_est, kf_gt, slot_kf,
                  n_slots, pose_mask, cache_colors, cache_depths,
                  cache_inv_q, win_lines, gt_c2w, idx, count, key, start,
                  lr_scale, total, joint_opt, admit, chunk: int):
        def init_fn(op):
            params, opt_state = op
            c2ws = kf_est[slot_kf]
            is_cur = jnp.arange(w_max) == n_slots - 1
            c2ws = jnp.where(is_cur[:, None, None], est_dev[idx][None],
                             c2ws)
            params = {"map": params["map"],
                      "poses": matrix_to_cam_pose(c2ws)}
            return params, optimizer.init(params)

        params, opt_state = jax.lax.cond(
            start == 0, init_fn, lambda op: op, (params, opt_state))

        params, opt_state, losses = _scan_steps(
            loss_fn, optimizer, params, opt_state, pose_mask, win_lines,
            n_slots, cache_colors, (cache_depths, cache_inv_q), key,
            start, lr_scale, chunk, total=total, opt_sharder=opt_sharder)

        # Pose write-back (global slot ids) + pose-only admission; the
        # imagery admission happens host-side in the scheduler.
        c2ws_out = cam_pose_to_matrix(params["poses"])
        old = kf_est[slot_kf]
        kf_est = kf_est.at[slot_kf].set(
            jnp.where(pose_mask[:, None, None] > 0, c2ws_out, old))
        cur = c2ws_out[n_slots - 1]
        est_dev = est_dev.at[idx].set(
            jnp.where(joint_opt > 0, cur, est_dev[idx]))
        kf_est = kf_est.at[count].set(
            jnp.where(admit > 0, est_dev[idx], kf_est[count]))
        kf_gt = kf_gt.at[count].set(
            jnp.where(admit > 0, gt_c2w, kf_gt[count]))
        return params, opt_state, est_dev, kf_est, kf_gt, losses

    chunk_iters = int(m.get("chunk_iters", 0)) or int(m["iters"])
    jit_chunk = jax.jit(
        run_chunk, static_argnames=("chunk",),
        donate_argnums=(0, 1, 2, 3, 4))
    jit_init = jax.jit(optimizer.init)

    def window_map(ms, opt_buf, est_dev, kf_est, kf_gt, slot_kf, n_slots,
                   pose_mask, cache_colors, cache_depths, cache_inv_q,
                   win_lines, gt_c2w, idx, count, key, *, iters: int,
                   lr_factor: float, joint_opt: bool, admit: bool,
                   on_chunk=None):
        params = {"map": ms, "poses": jnp.zeros((w_max, 7), jnp.float32)}
        sel = (slot_kf, n_slots, pose_mask)
        lr_scale = jnp.float32(lr_factor)
        total = jnp.int32(iters)
        jo = jnp.float32(1.0 if joint_opt else 0.0)
        ad = jnp.float32(1.0 if admit else 0.0)
        losses = []
        for c in range(-(-iters // chunk_iters)):
            done = c * chunk_iters
            (params, opt_buf, est_dev, kf_est, kf_gt,
             chunk_losses) = jit_chunk(
                params, opt_buf, est_dev, kf_est, kf_gt, slot_kf,
                n_slots, pose_mask, cache_colors, cache_depths,
                cache_inv_q, win_lines, gt_c2w, jnp.int32(idx),
                jnp.int32(count), key, jnp.int32(done), lr_scale, total,
                jo, ad, chunk=chunk_iters)
            losses.append(chunk_losses)
            if on_chunk is not None:
                on_chunk(params, sel, done, min(done + chunk_iters, iters))
        all_losses = _cat_losses(losses, iters)
        return (params["map"], opt_buf, est_dev, kf_est, kf_gt, all_losses)

    window_map.jit_init = jit_init
    window_map.chunk_iters = chunk_iters
    return window_map

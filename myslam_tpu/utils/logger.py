"""Checkpointing: full-state save/load (genuine resume).

The reference's Logger (src/utils/Logger.py:39-47) saves only decoder
weights + pose lists — feature planes and keyframes are lost, so a run
cannot actually resume.  Here a checkpoint captures the COMPLETE SLAM
state: map atlases + decoder params, both pose lists, the keyframe store
(imagery included), and the PRNG key, as a single compressed npz.  The
reference's consumers (trajectory eval, visualization) read the same
fields by name.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from myslam_tpu.models.planes import MapState


def save_checkpoint(path: str, slam, idx: int) -> str:
    """Serialize the full SLAM state at frame idx."""
    store = slam.store
    decoder = slam.map_state.decoder
    flat, treedef = jax.tree_util.tree_flatten(decoder)
    # Keyframe imagery crosses the ~11 MB/s D2H tunnel: quantize ON
    # DEVICE to uint8 color (store holds f16 in [0,1]; u8 is the sensor
    # precision anyway) and uint16 depth (per-checkpoint scale, <0.1 mm
    # quantization) so the fetch is ~130 MB instead of ~260 MB.
    n = store.count
    if getattr(store, "host_mode", False):
        # keyframe_device: host_staged — imagery already quantized host-side
        colors_u8 = store.colors_u8[:n]
        depths_u16 = store.depths_u16[:n]
        inv_q = store.depth_inv_q[:n].astype(np.float32)
    elif getattr(store, "packed", False):
        # packed device store IS the checkpoint wire format already
        colors_u8 = store.colors[:n]
        depths_u16 = store.depths[0][:n]
        inv_q = store.depths[1][:n]
    else:
        colors_u8 = jnp.clip(jnp.round(
            store.colors[:n].astype(jnp.float32) * 255.0), 0, 255
        ).astype(jnp.uint8)
        dmax = float(jnp.max(store.depths[:n])) if n else 1.0
        dq = 60000.0 / max(dmax, 1e-3)
        # valid (>0) depths never quantize to 0 (0 encodes "no depth")
        depths_u16 = jnp.where(
            store.depths[:n] > 0,
            jnp.clip(jnp.round(store.depths[:n] * dq), 1, 65535),
            0).astype(jnp.uint16)
        inv_q = np.float32(1.0 / dq)
    # Uncompressed npz: zlib over the (mostly incompressible) imagery
    # costs seconds per save on a 2-core host for <2x size.
    # CRASH-ATOMIC: a SIGKILL mid-write must never leave a truncated
    # file where latest_checkpoint would find it (the auto-restart
    # supervisor resumes from the newest checkpoint unconditionally) —
    # write to a .tmp sibling, fsync, then rename into place.
    tmp = path + ".tmp.npz"
    np.savez(
        tmp,
        idx=idx,
        sdf_atlas=np.asarray(slam.map_state.sdf_atlas),
        color_atlas=np.asarray(slam.map_state.color_atlas),
        decoder_leaves=np.asarray(
            [np.asarray(l, np.float32) for l in flat], dtype=object),
        estimate_c2w_list=slam.estimates,
        gt_c2w_list=slam.gt_poses,
        keyframe_list=np.asarray(store.frame_ids, np.int64),
        kf_colors_u8=np.asarray(colors_u8),
        kf_depths_u16=np.asarray(depths_u16),
        kf_depth_inv_q=np.asarray(inv_q),
        kf_est_c2w=np.asarray(store.est_c2w[:n]),
        kf_gt_c2w=np.asarray(store.gt_c2w[:n]),
        kf_has_depthless=np.asarray(store.has_depthless[:n]),
        rng_key=np.asarray(slam.key),
        allow_pickle=True,
    )
    with open(tmp, "rb") as f:
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, slam) -> int:
    """Restore a checkpoint into a freshly-constructed SLAMSystem.

    Returns the frame index at which to resume (first unprocessed frame).
    """
    data = np.load(path, allow_pickle=True)
    decoder = slam.map_state.decoder
    _, treedef = jax.tree_util.tree_flatten(decoder)
    leaves = [jnp.asarray(l) for l in data["decoder_leaves"]]
    slam.map_state = MapState(
        sdf_atlas=jnp.asarray(data["sdf_atlas"]),
        color_atlas=jnp.asarray(data["color_atlas"]),
        decoder=jax.tree_util.tree_unflatten(treedef, leaves),
    )
    slam.estimates = data["estimate_c2w_list"]
    slam.gt_poses = data["gt_c2w_list"]
    store = slam.store
    n = len(data["keyframe_list"])
    store.count = 0
    store.frame_ids = []
    inv_q = np.broadcast_to(
        np.asarray(data.get("kf_depth_inv_q", 1.0), np.float32), (n,)) \
        if n else np.zeros((0,), np.float32)
    if getattr(store, "host_mode", False):
        for k in range(n):
            store.add_host(
                int(data["keyframe_list"][k]), data["kf_colors_u8"][k],
                data["kf_depths_u16"][k], float(inv_q[k]),
                has_depthless=bool(data["kf_has_depthless"][k]))
        store.est_c2w = store.est_c2w.at[:n].set(
            jnp.asarray(data["kf_est_c2w"]))
        store.gt_c2w = store.gt_c2w.at[:n].set(
            jnp.asarray(data["kf_gt_c2w"]))
    elif getattr(store, "packed", False):
        for k in range(n):
            store.write_imagery_packed(
                store.count, data["kf_colors_u8"][k],
                data["kf_depths_u16"][k], float(inv_q[k]))
            store.note_admitted(
                int(data["keyframe_list"][k]),
                has_depthless=bool(data["kf_has_depthless"][k]))
        store.est_c2w = store.est_c2w.at[:n].set(
            jnp.asarray(data["kf_est_c2w"]))
        store.gt_c2w = store.gt_c2w.at[:n].set(
            jnp.asarray(data["kf_gt_c2w"]))
    else:
        if "kf_colors_u8" in data:
            colors = data["kf_colors_u8"].astype(np.float32) / 255.0
            depths = (data["kf_depths_u16"].astype(np.float32)
                      * inv_q[:, None, None])
        else:  # pre-quantization checkpoints
            colors, depths = data["kf_colors"], data["kf_depths"]
        for k in range(n):
            store.add(
                int(data["keyframe_list"][k]),
                jnp.asarray(colors[k]),
                jnp.asarray(depths[k]),
                jnp.asarray(data["kf_est_c2w"][k]),
                jnp.asarray(data["kf_gt_c2w"][k]),
                has_depthless=bool(data["kf_has_depthless"][k]),
            )
    slam.key = jnp.asarray(data["rng_key"])
    return int(data["idx"]) + 1


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = sorted(
        f for f in os.listdir(ckpt_dir)
        if f.endswith(".npz") and not f.endswith(".tmp.npz"))
    return os.path.join(ckpt_dir, ckpts[-1]) if ckpts else None

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
    # Uncompressed npz: zlib over the (mostly incompressible) f16 keyframe
    # imagery costs seconds per save on a 2-core host for <2x size.
    np.savez(
        path,
        idx=idx,
        sdf_atlas=np.asarray(slam.map_state.sdf_atlas),
        color_atlas=np.asarray(slam.map_state.color_atlas),
        decoder_leaves=np.asarray(
            [np.asarray(l, np.float32) for l in flat], dtype=object),
        estimate_c2w_list=slam.estimates,
        gt_c2w_list=slam.gt_poses,
        keyframe_list=np.asarray(store.frame_ids, np.int64),
        kf_colors=np.asarray(store.colors[:store.count]),
        kf_depths=np.asarray(store.depths[:store.count]),
        kf_est_c2w=np.asarray(store.est_c2w[:store.count]),
        kf_gt_c2w=np.asarray(store.gt_c2w[:store.count]),
        kf_has_depthless=np.asarray(store.has_depthless[:store.count]),
        rng_key=np.asarray(slam.key),
        allow_pickle=True,
    )
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
    for k in range(n):
        store.add(
            int(data["keyframe_list"][k]),
            jnp.asarray(data["kf_colors"][k]),
            jnp.asarray(data["kf_depths"][k]),
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
        f for f in os.listdir(ckpt_dir) if f.endswith(".npz"))
    return os.path.join(ckpt_dir, ckpts[-1]) if ckpts else None

#!/usr/bin/env python
"""Time the jitted tracking / mapping step programs in isolation.

Usage: python -m myslam_tpu.tools.profile_steps [--config PATH]

Reports steady-state ms per step program (a whole per-frame optimization:
8 tracking iters / 15 mapping iters) with completion forced by host
fetches, which `block_until_ready` does not guarantee through the remote
TPU tunnel.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.asarray(leaves[0]).ravel()[0].astype(jnp.float32))


def main():
    parser = argparse.ArgumentParser()
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    parser.add_argument("--config", default=os.path.join(
        repo, "configs", "Synthetic", "room.yaml"))
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    from myslam_tpu.engine.scheduler import SLAMSystem
    from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config

    cfg = load_config(args.config, DEFAULT_CONFIG)
    cfg["data"]["n_frames"] = 9
    slam = SLAMSystem(cfg, output="/tmp/profile_steps", seed=0)

    pkt = slam._make_packet(slam.dataset, 0)
    gt_c2w = pkt.gt_c2w
    color = jnp.asarray(pkt.color_u8)
    depth = jnp.asarray(pkt.depth_u16).astype(jnp.float32) * pkt.depth_inv_q
    slam._est_dev = slam._est_dev.at[0].set(jnp.asarray(gt_c2w))
    slam.gt_poses[0] = gt_c2w
    targs = (jnp.asarray(pkt.px_i), jnp.asarray(pkt.px_j),
             jnp.asarray(pkt.px_color), jnp.asarray(pkt.px_depth))

    # --- tracking step (full fused frame program) ---
    key = jax.random.PRNGKey(0)
    est = slam._est_dev
    est, c2w, lf, lb, _ = slam.tracker(
        slam.map_state, est, jnp.int32(1), *targs, key)
    fetch(lb)
    t0 = time.time()
    for k in range(args.iters):
        est, c2w, lf, lb, _ = slam.tracker(
            slam.map_state, est, jnp.int32(1), *targs,
            jax.random.fold_in(key, k))
    fetch(lb)
    t_iters = int(cfg["tracking"]["iters"])
    dt = (time.time() - t0) / args.iters
    print(f"tracking step ({t_iters} iters x "
          f"{cfg['tracking']['pixels']} px): {dt*1e3:8.2f} ms "
          f"({dt*1e3/t_iters:6.2f} ms/iter)")

    # --- mapping step (normal schedule) ---
    slam.store.write_imagery_packed(
        slam.scratch_slot, color, jnp.asarray(pkt.depth_u16),
        pkt.depth_inv_q)
    for s in range(3):
        slam.store.add_from_slot(s * 4, slam.scratch_slot,
                                 jnp.asarray(gt_c2w), jnp.asarray(gt_c2w))
    w_max = slam.w_max
    poses_pad = np.zeros((w_max, 7), np.float32)
    poses_pad[:, 0] = 1.0
    from myslam_tpu.core.quaternion import matrix_to_cam_pose
    pose7 = np.asarray(matrix_to_cam_pose(jnp.asarray(gt_c2w)[None])[0])
    for s in range(4):
        poses_pad[s] = pose7
    slot_kf = np.zeros((w_max,), np.int32)
    slot_kf[:4] = [0, 1, 2, slam.scratch_slot]
    pose_mask = np.zeros((w_max,), np.float32)
    pose_mask[1:4] = 1.0

    margs = (jnp.asarray(poses_pad), jnp.asarray(pose_mask),
             jnp.asarray(slot_kf), jnp.int32(4),
             slam.store.colors, slam.store.depths)
    m_iters = int(cfg["mapping"]["iters"])
    for imp in (True, False):
        mapper = slam._mappers[imp]
        mkw = dict(iters=m_iters, lr_factor=1.0)
        # the mapper donates its MapState input — time on a fresh copy
        ms0 = jax.tree_util.tree_map(jnp.copy, slam.map_state)
        ms0, poses_out, mlosses = mapper(ms0, *margs, key, **mkw)
        fetch(mlosses)
        t0 = time.time()
        for k in range(args.iters):
            ms0, poses_out, mlosses = mapper(
                ms0, *margs, jax.random.fold_in(key, k), **mkw)
        fetch(mlosses)
        dt = (time.time() - t0) / args.iters
        print(f"mapping step imp={int(imp)} ({m_iters} iters x "
              f"{cfg['mapping']['pixels']} px):  {dt*1e3:8.2f} ms "
              f"({dt*1e3/m_iters:6.2f} ms/iter)")


if __name__ == "__main__":
    main()

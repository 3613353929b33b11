#!/usr/bin/env python
"""Offline trajectory/mesh replay visualization.

Equivalent of the reference's Open3D GUI replay (visualizer.py +
src/tools/visualizer_util.py): loads the newest checkpoint of a run,
replays estimated (red) vs ground-truth (green) trajectories over the
reconstruction, swapping in each per-frame culled mesh as the replay
reaches the frame that produced it (reference visualizer_util.py:100-140),
and writes per-frame images (and an mp4 when ffmpeg is available).
Headless-friendly: renders with the framework's z-buffer rasterizer +
matplotlib instead of an interactive window.

CLI: python visualizer.py <config> [--output DIR] [--top_view]
     [--save_rendering] [--every N]
"""

import argparse
import glob
import os
import re
import subprocess

import numpy as np


def _mesh_schedule(output: str, n: int):
    """[(first frame index at which to show it, path)] for every culled
    mesh of the run, ascending (reference shows mesh {i:05d} once the
    replay reaches frame i; the final mesh belongs to the last frame)."""
    sched = []
    for p in glob.glob(os.path.join(output, "mesh", "*_culled.ply")):
        m = re.match(r"^(\d+)_", os.path.basename(p))
        sched.append((int(m.group(1)) if m else n - 1, p))
    return sorted(sched)


def replay(cfg: dict, output: str, top_view: bool = False,
           save_rendering: bool = False, every: int = 10) -> list:
    """Render the replay frames; returns the written image paths."""
    from myslam_tpu.utils.logger import latest_checkpoint
    from myslam_tpu.utils.meshmath import (
        make_depth_rasterizer,
        subdivide_to_edge,
    )
    from myslam_tpu.utils.ply import read_ply

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ckpt = latest_checkpoint(os.path.join(output, "ckpts"))
    if ckpt is None:
        raise SystemExit(f"no checkpoints under {output}/ckpts")
    data = np.load(ckpt, allow_pickle=True)
    n = int(data["idx"]) + 1
    est = data["estimate_c2w_list"][:n]
    gt = data["gt_c2w_list"][:n]

    meshes = _mesh_schedule(output, n)
    H = W = 600
    render = None
    w2c = None
    if meshes:
        # Fixed camera framing from the final mesh so the view does not
        # jump as meshes swap in.
        verts, _faces, _ = read_ply(meshes[-1][1])
        center = verts.mean(0)
        extent = (verts.max(0) - verts.min(0)).max()
        if top_view:
            eye = center + np.array([0.0, 0.0, 1.8 * extent])
            fwd = np.array([0.0, 0.0, -1.0])
            right = np.array([1.0, 0.0, 0.0])
        else:
            eye = center + np.array([0.0, -1.4 * extent, 0.9 * extent])
            fwd = center - eye
            fwd = fwd / np.linalg.norm(fwd)
            right = np.cross(fwd, np.array([0.0, 0.0, 1.0]))
            right = right / np.linalg.norm(right)
        down = np.cross(fwd, right)
        c2w_vis = np.eye(4)
        c2w_vis[:3, :3] = np.stack([right, down, fwd], 1)
        c2w_vis[:3, 3] = eye
        w2c = np.linalg.inv(c2w_vis)
        render = make_depth_rasterizer(H, W, 500.0, 500.0, W / 2, H / 2)

        def project(pts):
            cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
            return (500.0 * cam[:, 0] / cam[:, 2] + W / 2,
                    500.0 * cam[:, 1] / cam[:, 2] + H / 2)
    else:
        def project(pts):
            return pts[:, 0], pts[:, 1]

    bg_cache: dict = {}

    def background(i: int):
        """Depth render of the newest mesh at or before frame i (rendered
        once per mesh, reused until the next mesh swaps in)."""
        current = None
        for at, path in meshes:
            if at <= i:
                current = path
        if current is None:
            return None, None
        if current not in bg_cache:
            v, f, _ = read_ply(current)
            v, f = subdivide_to_edge(v, f, 0.05)
            bg_cache[current] = render(v[f], w2c)
        return bg_cache[current], os.path.basename(current)

    vis_dir = os.path.join(output, "vis")
    os.makedirs(vis_dir, exist_ok=True)
    frames = []
    for i in range(0, n, max(every, 1)):
        depth_img, mesh_name = background(i)
        fig, ax = plt.subplots(figsize=(7, 7))
        if depth_img is not None:
            ax.imshow(depth_img, cmap="gray_r", alpha=0.7)
        ex, ey = project(est[: i + 1, :3, 3])
        gx, gy = project(gt[: i + 1, :3, 3])
        ax.plot(gx, gy, "-", color="green", linewidth=1.5,
                label="ground truth")
        ax.plot(ex, ey, "-", color="red", linewidth=1.5, label="estimated")
        ax.scatter([ex[-1]], [ey[-1]], color="red", s=30, marker="o")
        ax.legend(loc="upper right")
        title = f"frame {i}"
        if mesh_name:
            title += f"  ({mesh_name})"
        ax.set_title(title)
        ax.set_xticks([])
        ax.set_yticks([])
        out = os.path.join(vis_dir, f"{i:05d}.jpg")
        fig.savefig(out, dpi=90, bbox_inches="tight")
        plt.close(fig)
        frames.append(out)

    print(f"Wrote {len(frames)} frames to {vis_dir} "
          f"({len(bg_cache)} mesh swaps)")
    if save_rendering and frames:
        mp4 = os.path.join(vis_dir, "replay.mp4")
        try:
            subprocess.run(
                ["ffmpeg", "-y", "-framerate", "10", "-pattern_type", "glob",
                 "-i", os.path.join(vis_dir, "*.jpg"), "-c:v", "libx264",
                 "-pix_fmt", "yuv420p", mp4],
                check=True, capture_output=True)
            print(f"Wrote {mp4}")
        except (FileNotFoundError, subprocess.CalledProcessError) as e:
            print(f"ffmpeg unavailable/failed ({e}); frames kept as jpgs")
    return frames


def replay_interactive(output: str, save_rendering: bool = False,
                       every: int = 1, backend: str = "auto") -> None:
    """Drive the interactive frontend (myslam_tpu.utils.frontend) with
    the run's poses and mesh schedule — the reference's GUI replay
    (visualizer.py:36-107 feeding SLAMFrontend).  Falls back to the
    headless recorder when no display/open3d exists."""
    from myslam_tpu.utils.frontend import SLAMFrontend
    from myslam_tpu.utils.logger import latest_checkpoint

    ckpt = latest_checkpoint(os.path.join(output, "ckpts"))
    if ckpt is None:
        raise SystemExit(f"no checkpoints under {output}/ckpts")
    data = np.load(ckpt, allow_pickle=True)
    n = int(data["idx"]) + 1
    est = data["estimate_c2w_list"][:n]
    gt = data["gt_c2w_list"][:n]
    meshes = _mesh_schedule(output, n)

    frontend = SLAMFrontend(output, save_rendering=save_rendering,
                            backend=backend).start()
    print(f"frontend backend: {frontend.backend}")
    mi = 0
    for i in range(0, n, max(every, 1)):
        while mi < len(meshes) and meshes[mi][0] <= i:
            frontend.update_mesh(meshes[mi][1])
            mi += 1
        frontend.update_pose(i, est[i], gt[i])
    frontend.join()


def main():
    from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config

    parser = argparse.ArgumentParser(description="Replay a SLAM run.")
    parser.add_argument("config", type=str)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--top_view", action="store_true")
    parser.add_argument("--save_rendering", action="store_true",
                        help="also encode vis/replay.mp4 when ffmpeg exists")
    parser.add_argument("--every", type=int, default=10,
                        help="render every Nth frame")
    parser.add_argument("--interactive", action="store_true",
                        help="live window replay (open3d or matplotlib "
                        "backend when a display exists; headless frame "
                        "recorder otherwise)")
    args = parser.parse_args()

    cfg = load_config(args.config, DEFAULT_CONFIG)
    output = args.output or cfg["data"]["output"]
    if args.interactive:
        replay_interactive(output, save_rendering=args.save_rendering,
                           every=args.every)
        return
    replay(cfg, output, top_view=args.top_view,
           save_rendering=args.save_rendering, every=args.every)


if __name__ == "__main__":
    main()

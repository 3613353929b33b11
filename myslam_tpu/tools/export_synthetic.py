"""Export the synthetic analytic scene to REAL dataset layouts on disk.

Writes the exact directory/file formats the reference's readers consume
(Replica: results/frame*.jpg + depth*.png + traj.txt,
reference src/utils/datasets.py:117-138; TUM: rgb/ + depth/ + rgb.txt +
depth.txt + groundtruth.txt with timestamp association,
reference src/utils/datasets.py:169-256), so the full
disk -> reader -> engine path — including jpg decode, u16 depth
quantization, pose-column flips, TUM timestamp association and
first-pose rebasing — can be validated end-to-end without downloading
datasets (and CAN be compared against a dataset-free synthetic run,
since the generating poses/geometry are known analytically).

Usage:
    python -m myslam_tpu.tools.export_synthetic <config.yaml> \
        --layout replica|tum --output DIR [--n-frames N] [--holes]
"""

from __future__ import annotations

import os

import numpy as np


def _unflip(c2w: np.ndarray) -> np.ndarray:
    """Negate rotation columns 1,2 — the involution the readers apply
    (datasets.py Replica._load_poses / TUMRGBD._load_tum), so that
    reader(unflip(p)) == p."""
    out = c2w.copy()
    out[:3, 1] *= -1
    out[:3, 2] *= -1
    return out


def _punch_hole(depth: np.ndarray, idx: int) -> np.ndarray:
    """Deterministic per-frame depth hole (sensor-dropout analog) so the
    engine's depth-less importance branch is exercised from disk data."""
    H, W = depth.shape
    rng = np.random.default_rng(idx)
    ch = int(rng.integers(H // 4, H // 2))
    cw = int(rng.integers(W // 4, W // 2))
    h = H // 8
    w = W // 6
    depth = depth.copy()
    depth[ch:ch + h, cw:cw + w] = 0.0
    return depth


def export_replica(cfg: dict, out_dir: str, n_frames: int | None = None,
                   png_depth_scale: float = 6553.5,
                   holes: bool = False) -> None:
    """Replica layout: results/frame%06d.jpg, results/depth%06d.png,
    traj.txt (flattened c2w rows, reader-flip pre-applied)."""
    import cv2

    from myslam_tpu.utils.datasets import Synthetic

    ds = Synthetic(cfg)
    n = min(n_frames or len(ds), len(ds))
    res = os.path.join(out_dir, "results")
    os.makedirs(res, exist_ok=True)
    lines = []
    for i in range(n):
        color, depth, pose = ds.get_frame(i)
        if holes:
            depth = _punch_hole(depth, i)
        bgr = cv2.cvtColor(
            (np.clip(color, 0, 1) * 255).astype(np.uint8),
            cv2.COLOR_RGB2BGR)
        cv2.imwrite(os.path.join(res, f"frame{i:06d}.jpg"), bgr,
                    [cv2.IMWRITE_JPEG_QUALITY, 98])
        d16 = np.clip(depth * png_depth_scale, 0, 65535).astype(np.uint16)
        cv2.imwrite(os.path.join(res, f"depth{i:06d}.png"), d16)
        lines.append(" ".join(f"{v:.9f}" for v in _unflip(pose).reshape(-1)))
    with open(os.path.join(out_dir, "traj.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def export_scannet(cfg: dict, out_dir: str, n_frames: int | None = None,
                   png_depth_scale: float = 1000.0,
                   invalid_frames: tuple = (),
                   holes: bool = False) -> None:
    """ScanNet layout: color/{i}.jpg, depth/{i}.png, pose/{i}.txt
    (4x4 text matrices, reader-flip pre-applied, numeric-sort names —
    reference datasets.py:140-167).  ``invalid_frames`` get -inf pose
    files, the real-ScanNet sensor-dropout quirk whose frames
    eval_ate's convert_poses must mask (reference eval_ate.py:262-281).
    """
    import cv2

    from myslam_tpu.utils.datasets import Synthetic

    ds = Synthetic(cfg)
    n = min(n_frames or len(ds), len(ds))
    for sub in ("color", "depth", "pose"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    for i in range(n):
        color, depth, pose = ds.get_frame(i)
        if holes:
            depth = _punch_hole(depth, i)
        bgr = cv2.cvtColor(
            (np.clip(color, 0, 1) * 255).astype(np.uint8),
            cv2.COLOR_RGB2BGR)
        cv2.imwrite(os.path.join(out_dir, "color", f"{i}.jpg"), bgr,
                    [cv2.IMWRITE_JPEG_QUALITY, 98])
        d16 = np.clip(depth * png_depth_scale, 0, 65535).astype(np.uint16)
        cv2.imwrite(os.path.join(out_dir, "depth", f"{i}.png"), d16)
        p = (np.full((4, 4), -np.inf) if i in invalid_frames
             else _unflip(pose))
        np.savetxt(os.path.join(out_dir, "pose", f"{i}.txt"), p)


def export_tum(cfg: dict, out_dir: str, n_frames: int | None = None,
               png_depth_scale: float = 5000.0, fps: float = 30.0,
               holes: bool = True) -> None:
    """TUM layout: rgb/, depth/, rgb.txt, depth.txt, groundtruth.txt.

    NOTE the reader rebases the first pose to identity and applies the
    column flip AFTER rebasing, so the trajectory the engine sees lives
    in the frame ``A = flip(I) @ inv(unflip(p0))`` of the synthetic
    world; tum_world_transform(cfg) returns A for transforming
    scene-bound corners when configuring a run against this export.
    """
    import cv2

    from myslam_tpu.utils.datasets import Synthetic

    ds = Synthetic(cfg)
    n = min(n_frames or len(ds), len(ds))
    os.makedirs(os.path.join(out_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
    rgb_lines, depth_lines, gt_lines = [], [], []
    from scipy.spatial.transform import Rotation

    for i in range(n):
        t = i / fps
        color, depth, pose = ds.get_frame(i)
        if holes:
            depth = _punch_hole(depth, i)
        bgr = cv2.cvtColor(
            (np.clip(color, 0, 1) * 255).astype(np.uint8),
            cv2.COLOR_RGB2BGR)
        cv2.imwrite(os.path.join(out_dir, "rgb", f"{t:.6f}.png"), bgr)
        d16 = np.clip(depth * png_depth_scale, 0, 65535).astype(np.uint16)
        cv2.imwrite(os.path.join(out_dir, "depth", f"{t:.6f}.png"), d16)
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t:.6f} depth/{t:.6f}.png")
        q = _unflip(pose)
        quat = Rotation.from_matrix(q[:3, :3]).as_quat()  # x, y, z, w
        gt_lines.append(
            f"{t:.6f} " + " ".join(f"{v:.9f}" for v in q[:3, 3])
            + " " + " ".join(f"{v:.9f}" for v in quat))
    with open(os.path.join(out_dir, "rgb.txt"), "w") as f:
        f.write("\n".join(rgb_lines) + "\n")
    with open(os.path.join(out_dir, "depth.txt"), "w") as f:
        f.write("\n".join(depth_lines) + "\n")
    with open(os.path.join(out_dir, "groundtruth.txt"), "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n")
        f.write("\n".join(gt_lines) + "\n")


def tum_world_transform(cfg: dict) -> np.ndarray:
    """Rigid A with engine_pose_i = A @ synthetic_pose_i for a TUM export
    (the reader's first-pose rebase + column flip)."""
    from myslam_tpu.utils.datasets import Synthetic

    p0 = Synthetic(cfg).poses[0].astype(np.float64)
    flip_eye = np.diag([1.0, -1.0, -1.0, 1.0])
    return flip_eye @ np.linalg.inv(_unflip(p0))


def transform_bound(bound, A: np.ndarray, pad: float = 0.1) -> list:
    """AABB of a transformed AABB's corners (+pad), as [[lo, hi], ...]."""
    bound = np.asarray(bound, np.float64)
    corners = np.stack(np.meshgrid(*bound, indexing="ij"),
                       axis=-1).reshape(-1, 3)
    tc = corners @ A[:3, :3].T + A[:3, 3]
    lo = tc.min(axis=0) - pad
    hi = tc.max(axis=0) + pad
    return [[float(a), float(b)] for a, b in zip(lo, hi)]


def main():
    import argparse

    from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config

    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--layout", choices=("replica", "tum"),
                    default="replica")
    ap.add_argument("--output", required=True)
    ap.add_argument("--n-frames", type=int, default=None)
    ap.add_argument("--holes", action="store_true")
    args = ap.parse_args()
    cfg = load_config(args.config, DEFAULT_CONFIG)
    if args.layout == "replica":
        export_replica(cfg, args.output, args.n_frames, holes=args.holes)
    else:
        export_tum(cfg, args.output, args.n_frames, holes=True)
    print(f"exported {args.layout} layout to {args.output}")


if __name__ == "__main__":
    main()

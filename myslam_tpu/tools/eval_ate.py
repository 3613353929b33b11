#!/usr/bin/env python
"""Absolute trajectory error (ATE) evaluation.

Re-derivation of the reference tool (src/tools/eval_ate.py): Horn
closed-form SVD alignment of estimated vs ground-truth trajectories,
RMSE/mean/median/std/min/max of the translational error, optional plot,
and nan/inf GT-pose masking (ScanNet).  The CLI loads the newest
checkpoint of a run.

CLI: python -m myslam_tpu.tools.eval_ate <config> [--output DIR] [--plot P]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def horn_align(model: np.ndarray, data: np.ndarray):
    """Horn's closed-form alignment; model/data are (3, n).

    Returns rot (3,3), trans (3,1), per-point translational error (n,).
    Reference src/tools/eval_ate.py:66-100.
    """
    model_zc = model - model.mean(1, keepdims=True)
    data_zc = data - data.mean(1, keepdims=True)
    W = model_zc @ data_zc.T
    U, _, Vh = np.linalg.svd(W.T)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vh) < 0:
        S[2, 2] = -1
    rot = U @ S @ Vh
    trans = data.mean(1, keepdims=True) - rot @ model.mean(1, keepdims=True)
    err = rot @ model + trans - data
    return rot, trans, np.sqrt((err * err).sum(0))


def evaluate_ate(gt_traj: np.ndarray, est_traj: np.ndarray,
                 plot: str | None = None) -> dict:
    """gt_traj/est_traj: (n, 4, 4) pose arrays (already associated)."""
    gt_xyz = gt_traj[:, :3, 3].T
    est_xyz = est_traj[:, :3, 3].T
    rot, trans, err = horn_align(gt_xyz, est_xyz)
    result = {
        "compared_pose_pairs": int(err.shape[0]),
        "absolute_translational_error.rmse": float(np.sqrt(np.mean(err ** 2))),
        "absolute_translational_error.mean": float(np.mean(err)),
        "absolute_translational_error.median": float(np.median(err)),
        "absolute_translational_error.std": float(np.std(err)),
        "absolute_translational_error.min": float(np.min(err)),
        "absolute_translational_error.max": float(np.max(err)),
    }
    if plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        aligned = (rot @ gt_xyz + trans).T
        fig, ax = plt.subplots()
        ax.plot(aligned[:, 0], aligned[:, 1], "-", color="black",
                label="ground truth")
        ax.plot(est_xyz.T[:, 0], est_xyz.T[:, 1], "-", color="blue",
                label="estimated")
        ax.legend()
        ax.set_xlabel("x [m]")
        ax.set_ylabel("y [m]")
        ax.set_title(f"ATE RMSE: {result['absolute_translational_error.rmse']:.4f} m")
        fig.savefig(plot, dpi=90)
        plt.close(fig)
    return result


def convert_poses(c2w_list: np.ndarray, scale: float = 1.0):
    """Mask invalid (nan/inf) GT poses — ScanNet quirk
    (reference eval_ate.py:262-281).  Returns (poses, mask)."""
    poses = c2w_list.copy().astype(np.float64)
    mask = np.ones(len(poses), bool)
    for i, p in enumerate(poses):
        if np.isinf(p).any() or np.isnan(p).any():
            mask[i] = False
        poses[i, :3, 3] /= scale
    return poses[mask], mask


def evaluate_run(estimates: np.ndarray, gt_poses: np.ndarray,
                 scale: float = 1.0, plot: str | None = None) -> dict:
    gt, mask = convert_poses(gt_poses, scale)
    est, _ = convert_poses(estimates[mask], scale)
    return evaluate_ate(gt, est, plot)


def main():
    from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config
    from myslam_tpu.utils.logger import latest_checkpoint

    parser = argparse.ArgumentParser(description="Evaluate ATE of a run.")
    parser.add_argument("config", type=str)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--plot", type=str, default=None)
    args = parser.parse_args()

    cfg = load_config(args.config, DEFAULT_CONFIG)
    output = args.output or cfg["data"]["output"]
    ckpt = latest_checkpoint(os.path.join(output, "ckpts"))
    if ckpt is None:
        raise SystemExit(f"no checkpoints under {output}/ckpts")
    data = np.load(ckpt, allow_pickle=True)
    n = int(data["idx"]) + 1
    result = evaluate_run(
        data["estimate_c2w_list"][:n], data["gt_c2w_list"][:n],
        scale=cfg.get("scale", 1), plot=args.plot)
    for k, v in result.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()

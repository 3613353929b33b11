"""Masked losses vs the reference's boolean-filtered means (torch oracle)."""

import jax.numpy as jnp
import numpy as np
import torch

from myslam_tpu.core.losses import (
    color_loss,
    depth_loss,
    masked_mean,
    masked_median,
    sdf_losses,
)

TRUNC = 0.06


def torch_sdf_losses(sdf, z_vals, gt_depth, w_fs, w_center, w_tail):
    """Reference src/Tracker.py:114-148."""
    sdf = torch.from_numpy(sdf)
    z_vals = torch.from_numpy(z_vals)
    gt_depth = torch.from_numpy(gt_depth)
    front_mask = (z_vals < (gt_depth[:, None] - TRUNC))
    back_mask = (z_vals > (gt_depth[:, None] + TRUNC))
    center_mask = (z_vals > (gt_depth[:, None] - 0.4 * TRUNC)) & (
        z_vals < (gt_depth[:, None] + 0.4 * TRUNC))
    tail_mask = (~front_mask) & (~back_mask) & (~center_mask)
    fs = torch.mean(torch.square(sdf[front_mask] - 1.0))
    est = z_vals + sdf * TRUNC
    tgt = gt_depth[:, None].expand(z_vals.shape)
    center = torch.mean(torch.square(est[center_mask] - tgt[center_mask]))
    tail = torch.mean(torch.square(est[tail_mask] - tgt[tail_mask]))
    return (w_fs * fs + w_center * center + w_tail * tail).item()


def test_sdf_losses_match_reference():
    rng = np.random.default_rng(0)
    R, N = 64, 40
    sdf = rng.uniform(-1, 1, size=(R, N)).astype(np.float32)
    d = rng.uniform(0.5, 4.0, size=(R,)).astype(np.float32)
    z = np.sort(rng.uniform(0, 5.0, size=(R, N)).astype(np.float32), axis=-1)
    theirs = torch_sdf_losses(sdf, z, d, 10.0, 200.0, 50.0)
    ours = float(sdf_losses(
        jnp.asarray(sdf), jnp.asarray(z), jnp.asarray(d),
        jnp.ones(R, bool), TRUNC, 10.0, 200.0, 50.0))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_sdf_losses_respects_ray_mask():
    rng = np.random.default_rng(1)
    R, N = 32, 16
    sdf = rng.uniform(-1, 1, size=(R, N)).astype(np.float32)
    d = rng.uniform(0.5, 4.0, size=(R,)).astype(np.float32)
    z = np.sort(rng.uniform(0, 5.0, size=(R, N)).astype(np.float32), axis=-1)
    keep = rng.uniform(size=R) > 0.4
    # masked version over all rays == unmasked over kept subset
    ours = float(sdf_losses(
        jnp.asarray(sdf), jnp.asarray(z), jnp.asarray(d),
        jnp.asarray(keep), TRUNC, 10.0, 200.0, 50.0))
    sub = float(sdf_losses(
        jnp.asarray(sdf[keep]), jnp.asarray(z[keep]), jnp.asarray(d[keep]),
        jnp.ones(int(keep.sum()), bool), TRUNC, 10.0, 200.0, 50.0))
    np.testing.assert_allclose(ours, sub, rtol=1e-5)


def test_color_depth_losses_match_subset_mean():
    rng = np.random.default_rng(2)
    R = 100
    gt_c = rng.uniform(size=(R, 3)).astype(np.float32)
    c = rng.uniform(size=(R, 3)).astype(np.float32)
    gt_d = rng.uniform(0.5, 3, size=R).astype(np.float32)
    dd = rng.uniform(0.5, 3, size=R).astype(np.float32)
    keep = rng.uniform(size=R) > 0.3
    np.testing.assert_allclose(
        float(color_loss(jnp.asarray(gt_c), jnp.asarray(c), jnp.asarray(keep))),
        np.mean(np.square(gt_c - c)[keep]), rtol=1e-5)
    np.testing.assert_allclose(
        float(depth_loss(jnp.asarray(gt_d), jnp.asarray(dd), jnp.asarray(keep))),
        np.mean(np.square(gt_d - dd)[keep]), rtol=1e-5)


def test_masked_median_torch_convention():
    rng = np.random.default_rng(3)
    for n in (5, 6, 101, 100):
        x = rng.normal(size=128).astype(np.float32)
        mask = np.zeros(128, bool)
        mask[:n] = True
        expected = torch.median(torch.from_numpy(x[:n])).item()
        got = float(masked_median(jnp.asarray(x), jnp.asarray(mask)))
        np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_masked_mean_empty():
    assert float(masked_mean(jnp.ones(4), jnp.zeros(4, bool))) == 0.0

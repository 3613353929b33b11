#!/usr/bin/env python
"""Frustum (+ occlusion) mesh culling before reconstruction eval.

Re-derivation of the reference tool (src/tools/cull_mesh.py:36-114): a
mesh vertex survives if some frame sees it — inside the image bounds, in
front of the camera, and (eval_rec mode) not occluded beyond the observed
depth + truncation.  Faces whose three vertices are never seen are
removed.  The per-frame projection + depth test runs on device; frames
stream through a prefetch thread.

Quirks kept: raw (un-cropped) cfg intrinsics are used for projection
while depth maps are the preprocessed ones, and the depth lookup uses
grid_sample-style normalization u*(W-1)/W with zero padding.

CLI: python -m myslam_tpu.tools.cull_mesh <config> --input_mesh mesh.ply
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from myslam_tpu.core.geometry import invert_pose, project_points
from myslam_tpu.utils.ply import read_ply, write_ply


def _bilinear_zeros(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """grid_sample(bilinear, zeros padding, align_corners=True) lookup.

    img: (H, W); x, y already in pixel units of the align_corners grid.
    """
    H, W = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        return jnp.where(inb, img[yi_c, xi_c], 0.0)

    return ((1 - wy) * (1 - wx) * tap(x0, y0)
            + (1 - wy) * wx * tap(x0 + 1, y0)
            + wy * (1 - wx) * tap(x0, y0 + 1)
            + wy * wx * tap(x0 + 1, y0 + 1))


def make_frame_culler(H, W, fx, fy, cx, cy, truncation, eval_rec: bool):
    """seen(verts (N,3), depth (Hd,Wd), c2w (4,4)) -> (N,) bool."""

    def seen(verts, depth, c2w):
        w2c = invert_pose(c2w)
        u, v, z = project_points(verts, w2c, fx, fy, cx, cy)
        # grid_sample normalization of the reference (u/W*2-1, align_corners)
        Hd, Wd = depth.shape
        ds = _bilinear_zeros(depth, u * (Wd - 1) / W, v * (Hd - 1) / H)
        mask = (0 <= -z) & (u < W) & (u > 0) & (v < H) & (v > 0)
        if eval_rec:
            mask = mask & (ds + truncation >= -z)
        return mask

    return jax.jit(seen)


def make_batch_culler(H, W, fx, fy, cx, cy, truncation, eval_rec: bool):
    """seen_any(ever (N,), verts (N,3), depths (B,Hd,Wd), c2ws (B,4,4),
    valid (B,)) -> (N,) bool — one program per B frames.

    A per-frame program costs one dispatch + one H2D each through a
    remote-device tunnel (~3-5 ms dispatch); at thousands of frames that
    dominated the finalize wall.  Batching B frames per program cuts the
    dispatch count by B; the OR-reduction stays on device (``ever`` is
    donated and accumulated across batches).  Tail frames are masked
    with ``valid`` rather than compiling a second variant.
    """

    def seen_one(verts, depth, c2w):
        w2c = invert_pose(c2w)
        u, v, z = project_points(verts, w2c, fx, fy, cx, cy)
        Hd, Wd = depth.shape
        ds = _bilinear_zeros(depth, u * (Wd - 1) / W, v * (Hd - 1) / H)
        mask = (0 <= -z) & (u < W) & (u > 0) & (v < H) & (v > 0)
        if eval_rec:
            mask = mask & (ds + truncation >= -z)
        return mask

    def seen_any(ever, verts, depths, c2ws, valid):
        per_frame = jax.vmap(seen_one, in_axes=(None, 0, 0))(
            verts, depths, c2ws)  # (B, N)
        return ever | (per_frame & valid[:, None]).any(axis=0)

    return jax.jit(seen_any, donate_argnums=(0,))


def vertex_visibility(verts: np.ndarray, cfg: dict, frames,
                      estimate_c2w_list: np.ndarray | None = None,
                      frames_per_program: int = 16) -> np.ndarray:
    """(N,) bool: is each vertex seen by at least one frame (frustum +
    eval_rec occlusion test)?  The core of cull_mesh, also used to derive
    the GT 'unseen' point set for the 2-D depth-L1 protocol (the
    reference ships *_pc_unseen.npy with its datasets, README.md:100-103;
    for the synthetic scene we compute it from the trajectory)."""
    cam = cfg["cam"]
    verts_d = jnp.asarray(np.asarray(verts, np.float32))
    seen_fn = make_batch_culler(
        cam["H"], cam["W"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
        cfg["model"]["truncation"], bool(cfg["meshing"]["eval_rec"]))

    B = frames_per_program
    ever_seen = jnp.zeros((len(verts),), bool)
    batch: list[tuple[np.ndarray, np.ndarray]] = []

    def flush(batch):
        n = len(batch)
        depths = np.stack([d for d, _ in batch]
                          + [batch[0][0]] * (B - n))
        c2ws = np.stack([p for _, p in batch]
                        + [batch[0][1]] * (B - n))
        valid = np.arange(B) < n
        return seen_fn(ever_seen, verts_d, jnp.asarray(depths),
                       jnp.asarray(c2ws), jnp.asarray(valid))

    for i, (depth, c2w) in enumerate(frames):
        if estimate_c2w_list is not None:
            c2w = estimate_c2w_list[i]
        batch.append((np.asarray(depth), np.asarray(c2w)))
        if len(batch) == B:
            ever_seen = flush(batch)
            batch = []
    if batch:
        ever_seen = flush(batch)
    return np.asarray(ever_seen)


def cull_mesh(mesh_file: str, cfg: dict, frames, out_file: str | None = None,
              estimate_c2w_list: np.ndarray | None = None,
              frames_per_program: int = 16) -> str:
    """frames: iterable of (depth (H,W) np, c2w (4,4) np) per frame."""
    verts, faces, colors = read_ply(mesh_file)
    ever = vertex_visibility(verts, cfg, frames, estimate_c2w_list,
                             frames_per_program)
    keep_face = ever[faces].any(axis=1)  # drop faces with all-unseen verts
    faces = faces[keep_face]

    # drop unreferenced vertices, remap indices
    used = np.zeros(len(verts), bool)
    used[faces.reshape(-1)] = True
    remap = np.cumsum(used) - 1
    verts = verts[used]
    colors = colors[used] if colors is not None else None
    faces = remap[faces]

    if out_file is None:
        ext = mesh_file.split(".")[-1]
        out_file = mesh_file[: -len(ext) - 1] + "_culled." + ext
    write_ply(out_file, verts, faces,
              colors.astype(np.float32) / 255.0 if colors is not None else None)
    return out_file


def main():
    from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config
    from myslam_tpu.utils.datasets import Prefetcher, get_dataset

    parser = argparse.ArgumentParser(description="Cull a mesh with GT poses.")
    parser.add_argument("config", type=str)
    parser.add_argument("--input_mesh", type=str, required=True)
    parser.add_argument("--input_folder", type=str, default=None)
    parser.add_argument("--output_mesh", type=str, default=None)
    args = parser.parse_args()

    cfg = load_config(args.config, DEFAULT_CONFIG)
    dataset = get_dataset(cfg, args.input_folder)
    frames = ((d, p) for _, (c, d, p) in
              Prefetcher(dataset, range(len(dataset))))
    out = cull_mesh(args.input_mesh, cfg, frames, args.output_mesh)
    print(f"Culled mesh written to {out}")


if __name__ == "__main__":
    main()

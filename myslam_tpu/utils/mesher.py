"""Mesh extraction: scene bound hull, SDF volume query, isosurface, colors.

Re-design of the reference Mesher (src/utils/Mesher.py):

  * The observed-space bound — reference: Open3D TSDF-fuse all keyframes,
    extract a mesh, take the convex hull of its vertices + camera centers
    scaled 1.02 (Mesher.py:63-128) — is redesigned as the convex hull of
    the back-projected keyframe depth point cloud + camera centers
    (identical hull up to TSDF smoothing; the TSDF step only denoised the
    points feeding qhull).  Hull from scipy/qhull on host; containment as
    a half-space test on device.
  * The SDF volume is queried in large chunks on device into a
    preallocated dense grid (reference batches 500k points to the GPU).
  * Isosurface extraction runs on device (ops/marching.py) instead of
    CPU skimage.
  * Vertex colors come from the color decoder at vertex positions
    (Mesher.py:248-256).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import ConvexHull

from myslam_tpu.core.geometry import normalize_3d_coordinate
from myslam_tpu.ops.marching import extract_isosurface_device
from myslam_tpu.ops.plane_sample import pack_quad
from myslam_tpu.render.renderer import SceneGeometry, query_rgb, query_sdf
from myslam_tpu.utils.ply import write_ply


@partial(jax.jit, static_argnames=("H", "W", "stride"))
def _backproject_all(c2ws, depths, fx, fy, cx, cy, H, W, stride):
    """(cap, h, w, 3) back-projected points + (cap, h, w) depths for all
    store slots in one device program (fixed shapes for any count).

    Rays are generated directly on the strided pixel grid: materializing
    full-resolution ray fields for every slot and then slicing faulted the
    TPU runtime at store scale (32 x 680 x 1200 x 3 intermediates) and
    wastes stride^2 of the work.
    """
    from myslam_tpu.core.geometry import rays_from_uv

    j, i = jnp.meshgrid(
        jnp.arange(0, H, stride, dtype=jnp.float32),
        jnp.arange(0, W, stride, dtype=jnp.float32), indexing="ij")

    def one(c2w, depth):
        rays_o, rays_d = rays_from_uv(i, j, c2w, fx, fy, cx, cy)
        d = depth[::stride, ::stride]
        return rays_o + rays_d * d[..., None], d

    return jax.vmap(one)(c2ws, depths)


@partial(jax.jit, static_argnames=("H", "W", "stride", "dims"))
def _voxel_votes(c2ws, depths, count, fx, fy, cx, cy, H, W, stride,
                 origin, inv_voxel, dims):
    """Back-project all store slots and scatter VOTES into a coarse
    dense voxel grid — entirely on device.  Returns (dims,) int32.

    The hull construction used to fetch the raw subsampled point cloud
    (~6.5 MB); device-to-host through the remote-TPU tunnel has been
    measured as low as ~0.1 MB/s in degraded states, which turned the
    bound-hull phase into minutes.  The occupancy grid is ~50 KB and the
    voxel quantization is conservative-ized host-side by hulling voxel
    CORNERS (reference context: the bound hull comes from a TSDF fused
    at comparable resolution, src/utils/Mesher.py:63-128, so quantized
    occupancy is if anything closer to the reference than raw points).
    """
    from myslam_tpu.core.geometry import rays_from_uv

    j, i = jnp.meshgrid(
        jnp.arange(0, H, stride, dtype=jnp.float32),
        jnp.arange(0, W, stride, dtype=jnp.float32), indexing="ij")
    nx, ny, nz = dims

    def one(slot, votes):
        c2w = c2ws[slot]
        depth = depths[slot][::stride, ::stride]
        rays_o, rays_d = rays_from_uv(i, j, c2w, fx, fy, cx, cy)
        pts = rays_o + rays_d * depth[..., None]
        cell = jnp.floor((pts - origin) * inv_voxel).astype(jnp.int32)
        inb = (jnp.all((cell >= 0), axis=-1)
               & (cell[..., 0] < nx) & (cell[..., 1] < ny)
               & (cell[..., 2] < nz) & (depth > 0) & (slot < count))
        flat = (cell[..., 0] * ny + cell[..., 1]) * nz + cell[..., 2]
        flat = jnp.where(inb, flat, nx * ny * nz)  # OOB bucket, dropped
        return votes.at[flat.reshape(-1)].add(1, mode="drop")

    votes = jnp.zeros((nx * ny * nz,), jnp.int32)
    votes = jax.lax.fori_loop(0, c2ws.shape[0], one, votes)
    return votes


def hull_points_device(store, cam, bound: np.ndarray, stride: int = 8,
                       voxel: float = 0.1, min_votes: int = 1,
                       margin: float = 0.3) -> np.ndarray:
    """Observed-space point set for the bound hull, device-reduced.

    Votes accumulate on device into a coarse grid over bound+margin;
    the host fetches only the ~50 KB grid, keeps cells with >=
    min_votes (the voxel-vote denoise that replaces the reference's
    TSDF smoothing), and emits the 8 CORNERS of each occupied voxel —
    a superset hull of the contained points — plus the camera centers
    (reference includes them, Mesher.py:114)."""
    lo = bound[:, 0] - margin
    hi = bound[:, 1] + margin
    dims = tuple(int(np.ceil((hi[a] - lo[a]) / voxel)) for a in range(3))
    votes = _voxel_votes(
        store.est_c2w, store.depths_float(), jnp.int32(store.count),
        cam.fx, cam.fy, cam.cx, cam.cy, cam.H, cam.W, stride,
        jnp.asarray(lo, jnp.float32), jnp.float32(1.0 / voxel), dims)
    v = np.asarray(votes).reshape(dims)
    occ = np.argwhere(v >= max(min_votes, 1))
    if len(occ) == 0:
        occ = np.zeros((1, 3), np.int64)
    corners = occ[:, None, :] + np.array(
        [[a, b, c] for a in (0, 1) for b in (0, 1) for c in (0, 1)])
    pts = lo[None, None, :] + corners * voxel
    cams = np.asarray(store.est_c2w[:store.count, :3, 3])
    return np.concatenate([pts.reshape(-1, 3), cams], axis=0)


def backproject_keyframes(store, cam, stride: int = 8) -> np.ndarray:
    """Point cloud of keyframe depths (subsampled) + camera centers.

    One jitted program + one fetch for the whole store (per-slot host
    round-trips cost ~30 ms each through the remote-device link).
    With keyframe_device: cpu the depths live host-side quantized —
    dequantize + subsample in numpy (no device staging needed; the
    backprojection is trivial next to hull construction)."""
    if getattr(store, "host_mode", False):
        n = store.count
        est = np.asarray(store.est_c2w)[:n]
        d = (store.depths_u16[:n, ::stride, ::stride].astype(np.float32)
             * store.depth_inv_q[:n, None, None])
        j, i = np.meshgrid(
            np.arange(0, cam.H, stride, dtype=np.float32),
            np.arange(0, cam.W, stride, dtype=np.float32), indexing="ij")
        dirs = np.stack([(i - cam.cx) / cam.fx, -(j - cam.cy) / cam.fy,
                         -np.ones_like(i)], axis=-1)  # (h, w, 3)
        pts = (np.einsum("khwj,kij->khwi", dirs[None] * d[..., None],
                         est[:, :3, :3]) + est[:, None, None, :3, 3])
        cams = est[:, :3, 3]
        return np.concatenate([pts[d > 0], cams], axis=0)
    pts_all, d_all = _backproject_all(
        store.est_c2w, store.depths_float(), cam.fx, cam.fy, cam.cx, cam.cy,
        cam.H, cam.W, stride)
    pts_np = np.asarray(pts_all)[:store.count]
    d_np = np.asarray(d_all)[:store.count]
    cams = np.asarray(store.est_c2w)[:store.count, :3, 3]
    return np.concatenate([pts_np[d_np > 0], cams], axis=0)


def denoise_observed_points(pts: np.ndarray, n_cams: int,
                            voxel: float = 0.1,
                            min_votes: int = 3) -> np.ndarray:
    """Voxel-vote outlier rejection before hull construction.

    The reference denoises the observed-space point set by TSDF-fusing
    all keyframes before hulling (src/utils/Mesher.py:78-112), which
    averages away isolated depth spikes; with raw backprojected points a
    single noisy TUM depth sample would otherwise inflate the convex
    hull and admit spurious geometry.  Equivalent vote: only points in
    voxels holding >= min_votes backprojected samples survive (true
    surfaces are dense under the stride-subsampled backprojection;
    spikes are isolated).  The trailing ``n_cams`` rows are the camera
    centers and always survive (reference includes them, Mesher.py:114).
    """
    if min_votes <= 1 or len(pts) <= n_cams:
        return pts
    surf = pts[:len(pts) - n_cams]
    cams = pts[len(pts) - n_cams:]
    keys = np.floor(surf / voxel).astype(np.int64)
    # pack 3 x int21 -> single int64 key for fast uniquing
    packed = ((keys[:, 0] & 0x1FFFFF) << 42 | (keys[:, 1] & 0x1FFFFF) << 21
              | (keys[:, 2] & 0x1FFFFF))
    uniq, inv, counts = np.unique(packed, return_inverse=True,
                                  return_counts=True)
    keep = counts[inv] >= min_votes
    return np.concatenate([surf[keep], cams], axis=0)


class HullBound:
    """Convex hull of observed space with device-side containment test.

    The half-space set is padded to a fixed capacity (repeating the last
    plane) so every containment test compiles to one stable shape no
    matter how complex the hull is.
    """

    def __init__(self, points: np.ndarray, scale: float = 1.02,
                 capacity: int = 256):
        hull = ConvexHull(points)
        verts = points[hull.vertices]
        center = verts.mean(axis=0)
        scaled = center + (verts - center) * scale
        hull2 = ConvexHull(scaled)
        # half-spaces A @ x + b <= 0
        A = hull2.equations[:, :3].astype(np.float32)
        b = hull2.equations[:, 3].astype(np.float32)
        if len(A) > capacity:  # extremely complex hull: keep every k-th
            keep = np.linspace(0, len(A) - 1, capacity).astype(int)
            A, b = A[keep], b[keep]
        pad = capacity - len(A)
        self.A = jnp.asarray(np.concatenate([A, np.repeat(A[-1:], pad, 0)]))
        self.b = jnp.asarray(np.concatenate([b, np.repeat(b[-1:], pad, 0)]))

    def contains(self, pts: jnp.ndarray, tol: float = 1e-6) -> jnp.ndarray:
        """(N, 3) -> (N,) bool."""
        side = pts @ self.A.T + self.b[None, :]
        return jnp.all(side <= tol, axis=-1)


class Mesher:
    """Extract a colored triangle mesh from the map state."""

    def __init__(self, cfg: dict, scene: SceneGeometry, cam,
                 points_batch_size: int = 500_000):
        self.scene = scene
        self.cam = cam
        self.resolution = float(cfg["meshing"]["resolution"])
        self.level_set = float(cfg["meshing"]["level_set"])
        self.mesh_bound_scale = float(cfg["meshing"]["mesh_bound_scale"])
        # voxel-vote denoising of the hull point set (the reference's
        # TSDF-fusion step served this role); 1 disables.  Off by
        # default: clean-depth datasets can have legitimately sparse
        # single-view coverage; the TUM configs (noisy Kinect depth)
        # turn it on.
        self.bound_min_votes = int(cfg["meshing"].get("bound_min_votes", 1))
        self.scale = cfg.get("scale", 1)
        self.mc_bound = np.array(
            cfg["mapping"]["marching_cubes_bound"], np.float64) * self.scale
        self.points_batch_size = points_batch_size
        self.verbose = cfg.get("verbose", False)

        # Vertex colors only need the color decoder path.  Chunked scan on
        # device over the padded vertex buffer; colors return as uint8
        # (3 B/vertex through the ~11 MB/s D2H tunnel vs 12 B as f32).
        @partial(jax.jit, static_argnames=("n_chunks",))
        def _rgb_u8(ms, pts_pad, n_chunks):
            color_quad = pack_quad(
                ms.color_atlas, self.scene.color_layout).astype(jnp.bfloat16)

            def chunk(carry, p):
                p_nor = normalize_3d_coordinate(p, self.scene.bound_array)
                rgb = query_rgb(ms, self.scene, p_nor, color_quad)
                return carry, jnp.clip(
                    jnp.round(rgb * 255.0), 0, 255).astype(jnp.uint8)

            _, out = jax.lax.scan(
                chunk, 0, pts_pad.reshape(n_chunks, -1, 3))
            return out.reshape(-1, 3)

        self._rgb_u8 = _rgb_u8

        bound = self.scene.bound_array

        @partial(jax.jit, static_argnames=("use_hull", "n_slabs"))
        def _build_volume(ms, xs_pad, ys_d, zs_d, A, b, use_hull, n_slabs):
            """Dense SDF volume as ONE device program (scan over x-slabs);
            out-of-hull / out-of-bound points forced to -1 (reference
            Mesher.py:146-153, 210-217).  The volume stays on device — it
            feeds the on-device isosurface extraction; a host round-trip
            would cost ~17 s both ways through the tunnel at room scale.

            SDF only: the volume pass must not touch the (4x larger)
            color atlas (reference Mesher.py:146 likewise queries color
            only at the final vertices).  The quad atlas is packed once,
            in bfloat16 (no gradients here), halving gather traffic.
            """
            sdf_quad = pack_quad(
                ms.sdf_atlas, self.scene.sdf_layout).astype(jnp.bfloat16)

            def slab(carry, xs_slab):
                g = jnp.stack(
                    jnp.meshgrid(xs_slab, ys_d, zs_d, indexing="ij"),
                    axis=-1).reshape(-1, 3)
                p_nor = normalize_3d_coordinate(g, self.scene.bound_array)
                sdf = query_sdf(ms, self.scene, p_nor, sdf_quad)
                inb = jnp.all((g > bound[:, 0]) & (g < bound[:, 1]), axis=-1)
                if use_hull:
                    side = g @ A.T + b[None, :]
                    inb = inb & jnp.all(side <= 1e-6, axis=-1)
                out = jnp.where(inb, sdf, -1.0)
                return carry, out.reshape(
                    xs_slab.shape[0], ys_d.shape[0], zs_d.shape[0])

            _, vol = jax.lax.scan(slab, 0, xs_pad.reshape(n_slabs, -1))
            return vol.reshape(-1, ys_d.shape[0], zs_d.shape[0])

        self._build_volume = _build_volume

    def grid_axes(self):
        """Reference get_grid_uniform axes (Mesher.py:159-186): linspace
        over the marching-cubes bound padded by 5 cm."""
        padding = 0.05
        axes = []
        for a in range(3):
            lo, hi = self.mc_bound[a]
            n = int(round((hi - lo + 2 * padding) / self.resolution))
            axes.append(np.linspace(lo - padding, hi + padding, n,
                                    dtype=np.float32))
        return axes

    def eval_sdf_volume(self, ms, hull: HullBound | None):
        """Dense SDF volume over the grid, DEVICE-resident; out-of-hull /
        out-of-bound points forced to -1 (reference Mesher.py:146-153,
        210-217).  Returns (device (nx, ny, nz) f32, (xs, ys, zs))."""
        xs, ys, zs = self.grid_axes()
        nx, ny, nz = len(xs), len(ys), len(zs)
        rows = max(self.points_batch_size // (ny * nz), 1)
        n_slabs = -(-nx // rows)
        xs_pad = np.concatenate(
            [xs, np.full(n_slabs * rows - nx, xs[-1], np.float32)])
        if hull is None:
            A = jnp.zeros((1, 3), jnp.float32)
            b = jnp.zeros((1,), jnp.float32)
        else:
            A, b = hull.A, hull.b
        vol = self._build_volume(
            ms, jnp.asarray(xs_pad), jnp.asarray(ys), jnp.asarray(zs),
            A, b, use_hull=hull is not None, n_slabs=n_slabs)[:nx]
        return vol, (xs, ys, zs)

    def vertex_colors_u8_device(self, ms, verts_dev) -> jnp.ndarray:
        """uint8 vertex colors for a device (V, 3) WORLD-coordinate vertex
        buffer (padded rows included; they cost nothing extra)."""
        n = verts_dev.shape[0]
        B = min(self.points_batch_size, 1 << 20)
        n_chunks = max(-(-n // B), 1)
        pad = n_chunks * B - n
        pts = jnp.concatenate(
            [verts_dev, jnp.zeros((pad, 3), jnp.float32)], axis=0)
        return self._rgb_u8(ms, pts, n_chunks=n_chunks)[:n]

    def get_mesh(self, out_file: str, ms, store, color: bool = True) -> str:
        """Extract + save the mesh (reference Mesher.get_mesh).

        The entire pipeline — volume query, marching tetrahedra, vertex
        weld, vertex colors — runs on device; the only D2H transfers are
        the final compact arrays (verts f32, faces i32, colors u8).
        """
        import sys
        import time as _time
        timing = os.environ.get("MYSLAM_TIMING", "0") == "1" or self.verbose
        marks = [("start", _time.time())]

        def mark(name, *sync):
            from myslam_tpu.utils.timing import barrier
            barrier(*sync)
            marks.append((name, _time.time()))
            if timing:
                print(f"[mesher] {name}: "
                      f"{marks[-1][1] - marks[-2][1]:.1f} s",
                      file=sys.stderr, flush=True)

        hull = None
        if store is not None and store.count > 0:
            if getattr(store, "host_mode", False):
                pts = backproject_keyframes(store, self.cam)
                pts = denoise_observed_points(
                    pts, store.count, min_votes=self.bound_min_votes)
            else:
                # Device-reduced: only the ~50 KB occupancy grid crosses
                # the (slow, sometimes pathologically slow) D2H link.
                pts = hull_points_device(
                    store, self.cam, np.asarray(self.scene.bound_array),
                    min_votes=self.bound_min_votes)
            hull = HullBound(pts, self.mesh_bound_scale)
        mark("hull")
        vol, (xs, ys, zs) = self.eval_sdf_volume(ms, hull)
        mark("sdf_volume", vol)
        verts_d, faces_d, n_verts, n_tris = extract_isosurface_device(
            vol, level=self.level_set)
        mark("marching")
        if n_tris == 0:
            write_ply(out_file, np.zeros((0, 3), np.float32),
                      np.zeros((0, 3), np.int32), None)
            return out_file
        origin = jnp.asarray([xs[0], ys[0], zs[0]], jnp.float32)
        spacing = jnp.asarray(
            [xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0]], jnp.float32)
        verts_world = origin + verts_d * spacing
        colors = None
        if color:
            # Slice to the real counts ON DEVICE before fetching: the
            # capacity-padded buffers can be 2x the real mesh and D2H
            # through the tunnel runs at ~11 MB/s.
            colors = np.asarray(
                self.vertex_colors_u8_device(ms, verts_world)[:n_verts])
            mark("vertex_colors")
        verts = np.asarray(verts_world[:n_verts])
        faces = np.asarray(faces_d[:n_tris])
        mark("fetch")
        write_ply(out_file, verts / self.scale, faces, colors)
        mark("write_ply")
        if self.verbose:
            print(f"Saved mesh ({n_verts} verts, {n_tris} faces) "
                  f"at {out_file}")
        return out_file

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

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import ConvexHull

from myslam_tpu.core.geometry import normalize_3d_coordinate
from myslam_tpu.ops.marching import extract_isosurface
from myslam_tpu.render.renderer import SceneGeometry, query_sdf
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


def backproject_keyframes(store, cam, stride: int = 8) -> np.ndarray:
    """Point cloud of keyframe depths (subsampled) + camera centers.

    One jitted program + one fetch for the whole store (per-slot host
    round-trips cost ~30 ms each through the remote-device link)."""
    pts_all, d_all = _backproject_all(
        store.est_c2w, store.depths, cam.fx, cam.fy, cam.cx, cam.cy,
        cam.H, cam.W, stride)
    pts_np = np.asarray(pts_all)[:store.count]
    d_np = np.asarray(d_all)[:store.count]
    cams = np.asarray(store.est_c2w)[:store.count, :3, 3]
    return np.concatenate([pts_np[d_np > 0], cams], axis=0)


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
        self.scale = cfg.get("scale", 1)
        self.mc_bound = np.array(
            cfg["mapping"]["marching_cubes_bound"], np.float64) * self.scale
        self.points_batch_size = points_batch_size
        self.verbose = cfg.get("verbose", False)

        # Vertex colors only need the color decoder path.
        from myslam_tpu.render.renderer import query_rgb

        def _rgb(ms, pts):
            p_nor = normalize_3d_coordinate(
                pts.reshape(-1, 3), self.scene.bound_array)
            return query_rgb(ms, self.scene, p_nor)

        self._query_rgb = jax.jit(_rgb)

        bound = self.scene.bound_array

        @partial(jax.jit, static_argnames=("use_hull",))
        def _slab_sdf(ms, xs_slab, ys_d, zs_d, A, b, use_hull):
            g = jnp.stack(jnp.meshgrid(xs_slab, ys_d, zs_d, indexing="ij"),
                          axis=-1).reshape(-1, 3)
            # SDF only: the volume pass must not touch the (4x larger)
            # color atlas (reference Mesher.py:146 likewise queries
            # color only at the final vertices).
            p_nor = normalize_3d_coordinate(
                g.reshape(-1, 3), self.scene.bound_array)
            sdf = query_sdf(ms, self.scene, p_nor)
            inb = jnp.all((g > bound[:, 0]) & (g < bound[:, 1]), axis=-1)
            if use_hull:
                side = g @ A.T + b[None, :]
                inb = inb & jnp.all(side <= 1e-6, axis=-1)
            return jnp.where(inb, sdf, -1.0).reshape(
                xs_slab.shape[0], ys_d.shape[0], zs_d.shape[0])

        self._slab_sdf = _slab_sdf

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
        """Dense SDF volume over the grid; out-of-hull / out-of-bound
        points forced to -1 (reference Mesher.py:146-153, 210-217)."""
        xs, ys, zs = self.grid_axes()
        nx, ny, nz = len(xs), len(ys), len(zs)
        bound = self.scene.bound_array
        xs_d, ys_d, zs_d = map(jnp.asarray, (xs, ys, zs))

        # chunk over x-slabs of the grid (padded to one fixed slab height
        # so the query program compiles exactly once per grid shape)
        vol = np.empty((nx, ny, nz), np.float32)
        rows_per_slab = max(self.points_batch_size // (ny * nz), 1)
        if hull is None:
            A = jnp.zeros((1, 3), jnp.float32)
            b = jnp.zeros((1,), jnp.float32)
        else:
            A, b = hull.A, hull.b

        for x0 in range(0, nx, rows_per_slab):
            xs_slab = xs_d[x0:x0 + rows_per_slab]
            n_rows = xs_slab.shape[0]
            if n_rows < rows_per_slab:  # pad the last slab
                xs_slab = jnp.concatenate(
                    [xs_slab,
                     jnp.full((rows_per_slab - n_rows,), xs_slab[-1])])
            out = self._slab_sdf(ms, xs_slab, ys_d, zs_d, A, b,
                                 use_hull=hull is not None)
            vol[x0:x0 + n_rows] = np.asarray(out[:n_rows])
        return vol, (xs, ys, zs)

    def vertex_colors(self, ms, vertices: np.ndarray) -> np.ndarray:
        out = np.empty((len(vertices), 3), np.float32)
        B = min(self.points_batch_size, 1 << 20)
        for i in range(0, len(vertices), B):
            chunk = vertices[i:i + B]
            n = len(chunk)
            if n < B:  # pad so the query compiles for one shape
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], B - n, axis=0)])
            rgb = self._query_rgb(ms, jnp.asarray(chunk))
            out[i:i + n] = np.asarray(rgb[:n])
        return out

    def get_mesh(self, out_file: str, ms, store, color: bool = True) -> str:
        """Extract + save the mesh (reference Mesher.get_mesh)."""
        hull = None
        if store is not None and store.count > 0:
            pts = backproject_keyframes(store, self.cam)
            hull = HullBound(pts, self.mesh_bound_scale)
        vol, (xs, ys, zs) = self.eval_sdf_volume(ms, hull)
        verts, faces = extract_isosurface(
            vol, origin=[xs[0], ys[0], zs[0]],
            spacing=[xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0]],
            level=self.level_set)
        colors = self.vertex_colors(ms, verts) if (color and len(verts)) \
            else None
        verts_out = verts / self.scale
        write_ply(out_file, verts_out, faces, colors)
        if self.verbose:
            print(f"Saved mesh ({len(verts)} verts, {len(faces)} faces) "
                  f"at {out_file}")
        return out_file

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

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import ConvexHull

from myslam_tpu.core.geometry import rays_full_image
from myslam_tpu.ops.marching import extract_isosurface
from myslam_tpu.render.renderer import SceneGeometry, query_raw
from myslam_tpu.utils.ply import write_ply


def backproject_keyframes(store, cam, stride: int = 8) -> np.ndarray:
    """Point cloud of keyframe depths (subsampled) + camera centers."""
    pts = []
    for slot in range(store.count):
        c2w = store.est_c2w[slot]
        depth = store.depths[slot, ::stride, ::stride]
        rays_o, rays_d = rays_full_image(
            cam.H, cam.W, cam.fx, cam.fy, cam.cx, cam.cy, c2w)
        rays_o = rays_o[::stride, ::stride]
        rays_d = rays_d[::stride, ::stride]
        p = rays_o + rays_d * depth[..., None]
        valid = np.asarray(depth) > 0
        pts.append(np.asarray(p)[valid])
        pts.append(np.asarray(c2w[:3, 3])[None])
    return np.concatenate(pts, axis=0)


class HullBound:
    """Convex hull of observed space with device-side containment test."""

    def __init__(self, points: np.ndarray, scale: float = 1.02):
        hull = ConvexHull(points)
        verts = points[hull.vertices]
        center = verts.mean(axis=0)
        scaled = center + (verts - center) * scale
        hull2 = ConvexHull(scaled)
        # half-spaces A @ x + b <= 0
        self.A = jnp.asarray(hull2.equations[:, :3], jnp.float32)
        self.b = jnp.asarray(hull2.equations[:, 3], jnp.float32)

    def contains(self, pts: jnp.ndarray, tol: float = 1e-6) -> jnp.ndarray:
        """(N, 3) -> (N,) bool."""
        side = pts @ self.A.T + self.b[None, :]
        return jnp.all(side <= tol, axis=-1)


class Mesher:
    """Extract a colored triangle mesh from the map state."""

    def __init__(self, cfg: dict, scene: SceneGeometry, cam,
                 points_batch_size: int = 2_000_000):
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

        self._query = jax.jit(
            lambda ms, pts: query_raw(ms, self.scene, pts))

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

        # chunk over x-slabs of the grid
        vol = np.empty((nx, ny, nz), np.float32)
        rows_per_slab = max(self.points_batch_size // (ny * nz), 1)

        @jax.jit
        def slab_sdf(ms, xs_slab):
            g = jnp.stack(jnp.meshgrid(xs_slab, ys_d, zs_d, indexing="ij"),
                          axis=-1).reshape(-1, 3)
            raw = query_raw(ms, self.scene, g)
            sdf = raw[:, -1]
            inb = jnp.all((g > bound[:, 0]) & (g < bound[:, 1]), axis=-1)
            keep = inb if hull is None else inb & hull.contains(g)
            return jnp.where(keep, sdf, -1.0).reshape(
                xs_slab.shape[0], ny, nz)

        for x0 in range(0, nx, rows_per_slab):
            xs_slab = xs_d[x0:x0 + rows_per_slab]
            vol[x0:x0 + xs_slab.shape[0]] = np.asarray(slab_sdf(ms, xs_slab))
        return vol, (xs, ys, zs)

    def vertex_colors(self, ms, vertices: np.ndarray) -> np.ndarray:
        out = np.empty((len(vertices), 3), np.float32)
        B = self.points_batch_size
        for i in range(0, len(vertices), B):
            raw = self._query(ms, jnp.asarray(vertices[i:i + B]))
            out[i:i + B] = np.asarray(raw[:, :3])
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

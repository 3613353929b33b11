"""On-device isosurface extraction (marching tetrahedra).

Replaces the reference's CPU skimage marching_cubes (Mesher.py:219-240)
with a TPU-native, static-shape pipeline: the volume is processed in
slabs; per slab, every cell is split into 6 tetrahedra, active tets are
compacted with a fixed-capacity nonzero, and each yields up to two
triangles with vertices linearly interpolated on crossing edges.

Marching tetrahedra is chosen over classic marching cubes deliberately:
its 16-entry case table is derived programmatically (no 4096-entry magic
table to transcribe), it has no ambiguous cases, and it vectorizes
cleanly with static shapes.  Vertices lie on the same sign-change edges
at the same linear interpolation as marching cubes, so surface accuracy
at a given grid resolution is equivalent (triangle count is ~2x).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Cube corners in binary (x, y, z) bit order; main diagonal 0-7.
_CORNERS = np.array([
    [0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
    [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]], np.int32)

# 6-tetrahedra decomposition around the 0-7 diagonal.
_TETS = np.array([
    [0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7],
    [0, 6, 4, 7], [0, 4, 5, 7], [0, 5, 1, 7]], np.int32)

_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32)


def _build_tet_table() -> np.ndarray:
    """(16, 6) triangle table: up to 2 triangles as edge ids, -1 padded."""
    def eid(a, b):
        return int(np.where(
            (_TET_EDGES == sorted((a, b))).all(axis=1))[0][0])

    table = -np.ones((16, 6), np.int32)
    for case in range(1, 15):
        inside = [i for i in range(4) if case >> i & 1]
        outside = [i for i in range(4) if not case >> i & 1]
        if len(inside) == 1:
            v = inside[0]
            table[case, :3] = [eid(v, o) for o in outside]
        elif len(inside) == 3:
            v = outside[0]
            table[case, :3] = [eid(v, o) for o in inside]
        else:  # 2-2: quad on 4 crossing edges, cyclic, split into 2 tris
            a, b = inside
            c, d = outside
            q = [eid(a, c), eid(a, d), eid(b, d), eid(b, c)]
            table[case, :3] = [q[0], q[1], q[2]]
            table[case, 3:] = [q[0], q[2], q[3]]
    return table


_TET_TABLE = _build_tet_table()


def _extract_slab(vol_slab, x0, level: float, max_tris: int):
    """Triangles for cells [x0, x0+sx) of the volume.

    vol_slab: (sx+1, ny, nz) sdf values; returns (tris (max_tris, 3, 3) in
    GRID coordinates, valid (max_tris,), n_tris).
    """
    sxp, ny, nz = vol_slab.shape
    sx = sxp - 1
    cx, cy, cz = sx, ny - 1, nz - 1

    # (8, cx, cy, cz) corner values
    corners = jnp.stack([
        vol_slab[bx:bx + cx, by:by + cy, bz:bz + cz]
        for bx, by, bz in _CORNERS], axis=0)
    vals = corners.reshape(8, -1)  # (8, N)
    n_cells = vals.shape[1]

    tet_vals = vals[jnp.asarray(_TETS).reshape(-1)]  # (24, N)
    tet_vals = tet_vals.reshape(6, 4, n_cells)
    inside = (tet_vals < level).astype(jnp.int32)
    case = (inside[:, 0] + 2 * inside[:, 1] + 4 * inside[:, 2]
            + 8 * inside[:, 3])  # (6, N)
    active = (case > 0) & (case < 15)

    flat_active = active.reshape(-1)  # (6N,) tet-major
    (sel,) = jnp.nonzero(flat_active, size=max_tris, fill_value=0)
    n_active = jnp.sum(flat_active)
    valid_tet = jnp.arange(max_tris) < n_active

    sel_tet = sel // n_cells  # which of the 6 tets
    sel_cell = sel % n_cells
    sel_case = case.reshape(-1)[sel]

    # cell grid coords
    gz = sel_cell % cz
    gy = (sel_cell // cz) % cy
    gx = sel_cell // (cz * cy)

    # the 4 tet corner ids in cube numbering -> positions + values
    tet_corner = jnp.asarray(_TETS)[sel_tet]  # (M, 4)
    corner_off = jnp.asarray(_CORNERS)[tet_corner]  # (M, 4, 3)
    pos = (jnp.stack([gx + x0, gy, gz], axis=-1)[:, None, :]
           + corner_off).astype(vol_slab.dtype)  # (M, 4, 3)
    # tet corner values: tet_vals (6, 4, N) -> tet-major flat (6N, 4)
    v4 = tet_vals.transpose(0, 2, 1).reshape(-1, 4)[sel]

    # edge interpolation for all 6 tet edges
    ea = jnp.asarray(_TET_EDGES[:, 0])
    eb = jnp.asarray(_TET_EDGES[:, 1])
    va = v4[:, ea]  # (M, 6)
    vb = v4[:, eb]
    denom = vb - va
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = jnp.clip((level - va) / denom, 0.0, 1.0)  # (M, 6)
    pa = pos[:, ea]  # (M, 6, 3)
    pb = pos[:, eb]
    edge_pts = pa + t[..., None] * (pb - pa)  # (M, 6, 3)

    tri_edges = jnp.asarray(_TET_TABLE)[sel_case]  # (M, 6)
    tri1 = jnp.take_along_axis(
        edge_pts, jnp.maximum(tri_edges[:, :3], 0)[..., None], axis=1)
    tri2 = jnp.take_along_axis(
        edge_pts, jnp.maximum(tri_edges[:, 3:], 0)[..., None], axis=1)
    has2 = tri_edges[:, 3] >= 0

    tris = jnp.concatenate([tri1, tri2], axis=0)  # (2M, 3, 3)
    valid = jnp.concatenate([valid_tet, valid_tet & has2], axis=0)
    return tris, valid, n_active


_extract_slab_jit = jax.jit(_extract_slab, static_argnames=("max_tris",))


def extract_isosurface(
    volume,
    origin,
    spacing,
    level: float = 0.0,
    slab_cells: int = 2_000_000,
    max_tris_per_slab: int = 1 << 18,
):
    """Extract a triangle mesh from a dense SDF volume.

    volume: (nx, ny, nz) array (device or host); origin (3,), spacing (3,)
    map grid coords to world.  Returns (vertices (V, 3) f64-free f32,
    faces (F, 3) i32) as numpy arrays, vertices welded.
    """
    volume = jnp.asarray(volume)
    nx, ny, nz = volume.shape
    per_x = max((ny - 1) * (nz - 1), 1)
    sx = max(min(slab_cells // per_x, nx - 1), 1)

    slab_fn = _extract_slab_jit

    all_tris = []
    x0 = 0
    max_tris = max_tris_per_slab
    while x0 < nx - 1:
        cur_sx = min(sx, nx - 1 - x0)
        # Adaptive capacity: on overflow halve the slab extent (cheap — the
        # smaller shape often already exists in the jit cache); at a single
        # x-layer grow the tet capacity instead.  Each shrink sticks for the
        # rest of the volume so dense surfaces pay the recompile once.
        while True:
            slab = volume[x0:x0 + cur_sx + 1]
            tris, valid, n_active = slab_fn(
                slab, jnp.float32(x0), level, max_tris=max_tris)
            n = int(n_active)
            if n <= max_tris:
                break
            if cur_sx > 1:
                cur_sx = max(cur_sx // 2, 1)
                sx = cur_sx
            else:
                max_tris *= 2
        v = np.asarray(valid)
        if v.any():
            all_tris.append(np.asarray(tris)[v])
        x0 += cur_sx

    if not all_tris:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    soup = np.concatenate(all_tris, axis=0)  # (F, 3, 3) grid coords
    origin = np.asarray(origin, np.float32)
    spacing = np.asarray(spacing, np.float32)
    soup = origin + soup * spacing

    # weld vertices (quantize to a small fraction of the cell size)
    eps = float(spacing.min()) * 1e-3
    flat = soup.reshape(-1, 3)
    keys = np.round(flat / eps).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    # representative position: first occurrence of each unique key
    uniq_first = np.zeros(len(uniq), np.int64)
    uniq_first[inv[::-1]] = np.arange(len(flat))[::-1]
    vertices = flat[uniq_first]
    faces = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2]))
    return vertices.astype(np.float32), faces[good]

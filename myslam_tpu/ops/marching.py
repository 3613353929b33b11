"""On-device isosurface extraction (marching tetrahedra).

Replaces the reference's CPU skimage marching_cubes (Mesher.py:219-240)
with a TPU-native, static-shape pipeline designed around the remote
device's transfer profile (D2H ~11 MB/s, ~90 ms per fetch round-trip):

  1. COUNT pass (one program, one small fetch): exact triangle count,
     exact unique-vertex count (= sign-crossing grid edges), and per-slab
     active-tet counts.  These size the fixed-capacity buffers, so the
     extraction program compiles once per capacity bucket — no adaptive
     overflow-retry recompiles (each compile through the tunnel is tens
     of seconds).
  2. EXTRACT+WELD pass (one program): a lax.scan over x-slabs compacts
     each slab's triangles into global fixed-capacity buffers, then the
     vertices are welded ON DEVICE by exact edge identity — every
     marching-tet vertex lies on a unique grid edge (canonical low node,
     direction code), so a two-key sort + neighbor-compare + scatter
     yields the indexed mesh with no floating-point quantization.  Only
     the compact final mesh (verts f32, faces i32) is fetched.

Marching tetrahedra is chosen over classic marching cubes deliberately:
its 16-entry case table is derived programmatically (no 4096-entry magic
table to transcribe), it has no ambiguous cases, and it vectorizes
cleanly with static shapes.  Vertices lie on the same sign-change edges
at the same linear interpolation as marching cubes, so surface accuracy
at a given grid resolution is equivalent (triangle count is ~2x).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Cube corners in binary (x, y, z) bit order; main diagonal 0-7.
_CORNERS = np.array([
    [0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
    [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]], np.int32)

# 6-tetrahedra decomposition around the 0-7 diagonal.  All face-diagonal
# edges pass through corner 0 or corner 7, so the decomposition is
# conforming across neighboring cells (shared faces use the same
# diagonal) — which makes edge-identity vertex welding exact.
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


def _build_edge_tables():
    """Canonical (low-node offset, direction code, swapped) per (tet, edge).

    A tet edge connects two cube corners whose offset delta is
    single-signed for this decomposition (asserted), so canonicalizing to
    a non-negative delta gives every geometric grid edge ONE identity:
    (low node, direction code in 1..7).  That identity is the weld key.
    """
    lo = np.zeros((6, 6, 3), np.int32)
    code = np.zeros((6, 6), np.int32)
    swap = np.zeros((6, 6), bool)
    for t in range(6):
        for e in range(6):
            ca = _TETS[t][_TET_EDGES[e][0]]
            cb = _TETS[t][_TET_EDGES[e][1]]
            oa, ob = _CORNERS[ca], _CORNERS[cb]
            d = ob - oa
            assert (d >= 0).all() or (d <= 0).all(), (t, e, d)
            if (d < 0).any():
                oa, ob = ob, oa
                d = -d
                swap[t, e] = True
            lo[t, e] = oa
            code[t, e] = d[0] * 4 + d[1] * 2 + d[2]
    return lo, code, swap


_EDGE_LO, _EDGE_CODE, _EDGE_SWAP = _build_edge_tables()
# direction code -> (dx, dy, dz)
_DIR_VEC = np.stack([np.array([c >> 2 & 1, c >> 1 & 1, c & 1], np.int32)
                     for c in range(8)])


def _pad_x(vol, nxp: int):
    """Replicate the last x-layer to nxp layers: padded cells have equal
    corner values -> no active tets, no crossing edges."""
    nx = vol.shape[0]
    if nxp == nx:
        return vol
    tail = jnp.broadcast_to(vol[-1:], (nxp - nx,) + vol.shape[1:])
    return jnp.concatenate([vol, tail], axis=0)


def _slab_cases(vol_p, s, sx: int, level):
    """Corner values + per-tet case codes for cells [s*sx, s*sx+sx)."""
    nxp, ny, nz = vol_p.shape
    cy, cz = ny - 1, nz - 1
    sl = jax.lax.dynamic_slice_in_dim(vol_p, s * sx, sx + 1, axis=0)
    corners = jnp.stack([
        jax.lax.dynamic_slice(sl, (bx, by, bz), (sx, cy, cz))
        for bx, by, bz in _CORNERS], axis=0)  # (8, sx, cy, cz)
    vals = corners.reshape(8, -1)
    tet_vals = vals[jnp.asarray(_TETS).reshape(-1)].reshape(6, 4, -1)
    inside = (tet_vals < level).astype(jnp.int32)
    case = (inside[:, 0] + 2 * inside[:, 1] + 4 * inside[:, 2]
            + 8 * inside[:, 3])  # (6, N)
    return tet_vals, case


@partial(jax.jit, static_argnames=("sx", "nxp"))
def _surface_counts(vol, level, sx: int, nxp: int):
    """Exact (per-slab active tets, total triangles, total unique verts).

    Unique verts = sign-crossing grid edges over the 7 within-cell
    directions: the 6-tet decomposition uses every cube edge, one
    diagonal per face (consistent across neighbors), and the main
    diagonal, so each crossing edge yields exactly one welded vertex.
    """
    nx, ny, nz = vol.shape
    sign = vol < level

    n_edges = jnp.int32(0)
    for c in range(1, 8):
        dx, dy, dz = c >> 2 & 1, c >> 1 & 1, c & 1
        a = sign[:nx - dx or None, :ny - dy or None, :nz - dz or None]
        b = sign[dx:, dy:, dz:]
        n_edges += jnp.sum(a != b)

    vol_p = _pad_x(vol, nxp)
    n_slabs = (nxp - 1) // sx

    def body(s, acc):
        tets, tris = acc
        _, case = _slab_cases(vol_p, s, sx, level)
        active = (case > 0) & (case < 15)
        pc = (case & 1) + (case >> 1 & 1) + (case >> 2 & 1) + (case >> 3 & 1)
        two = active & (pc == 2)
        n_act = jnp.sum(active, dtype=jnp.int32)
        tets = tets.at[s].set(n_act)
        tris = tris + n_act + jnp.sum(two, dtype=jnp.int32)
        return tets, tris

    tets0 = jnp.zeros((n_slabs,), jnp.int32)
    tets, n_tris = jax.lax.fori_loop(0, n_slabs, body, (tets0, jnp.int32(0)))
    return tets, n_tris, n_edges


@partial(jax.jit, static_argnames=("sx", "nxp", "tet_cap", "f_cap", "v_cap"))
def _extract_weld(vol, level, sx: int, nxp: int, tet_cap: int, f_cap: int,
                  v_cap: int):
    """Triangle soup (compacted across slabs) + exact edge-identity weld.

    Returns (verts (v_cap, 3) grid coords, faces (f_cap, 3) int32,
    n_verts, n_tris); rows past the counts are padding.
    """
    vol_p = _pad_x(vol, nxp)
    _, ny, nz = vol_p.shape
    cy, cz = ny - 1, nz - 1
    ncell = sx * cy * cz
    n_slabs = (nxp - 1) // sx

    ea = jnp.asarray(_TET_EDGES[:, 0])
    eb = jnp.asarray(_TET_EDGES[:, 1])
    edge_lo = jnp.asarray(_EDGE_LO)      # (6, 6, 3)
    edge_code = jnp.asarray(_EDGE_CODE)  # (6, 6)
    edge_swap = jnp.asarray(_EDGE_SWAP)  # (6, 6)
    dir_vec = jnp.asarray(_DIR_VEC)      # (8, 3)
    tet_table = jnp.asarray(_TET_TABLE)  # (16, 6)

    kn0 = jnp.full((3 * f_cap,), 0xFFFFFFFF, jnp.uint32)
    pos0 = jnp.zeros((3 * f_cap, 3), jnp.float32)

    def slab(carry, s):
        kn, pos_buf, ptr = carry
        tet_vals, case = _slab_cases(vol_p, s, sx, level)
        active = (case > 0) & (case < 15)
        flat = active.reshape(-1)  # (6*ncell,) tet-major
        (sel,) = jnp.nonzero(flat, size=tet_cap, fill_value=0)
        m = jnp.arange(tet_cap) < jnp.sum(flat)
        sel_tet = sel // ncell
        sel_cell = sel % ncell
        sel_case = case.reshape(-1)[sel]

        gz = sel_cell % cz
        gy = (sel_cell // cz) % cy
        gx = sel_cell // (cy * cz) + s * sx
        cell = jnp.stack([gx, gy, gz], axis=-1)  # (T, 3)

        v4 = tet_vals.transpose(0, 2, 1).reshape(-1, 4)[sel]  # (T, 4)
        va = v4[:, ea]  # (T, 6) per tet edge
        vb = v4[:, eb]
        denom = vb - va
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        t = jnp.clip((level - va) / denom, 0.0, 1.0)  # (T, 6)

        lo = edge_lo[sel_tet]                      # (T, 6, 3)
        node = cell[:, None, :] + lo               # (T, 6, 3)
        # Edge identity as ONE uint32: node_id * 8 + direction code.
        # Max value = nx*ny*nz*8 + 7; a Replica-scale 1 cm grid (~315M
        # nodes) needs the unsigned range (2.5e9 < 2^32).
        code = edge_code[sel_tet]                  # (T, 6)
        ekey = (((node[..., 0] * ny + node[..., 1]) * nz + node[..., 2]
                 ).astype(jnp.uint32) * jnp.uint32(8)
                + code.astype(jnp.uint32))         # (T, 6)
        tc = jnp.where(edge_swap[sel_tet], 1.0 - t, t)
        epos = node.astype(jnp.float32) + tc[..., None] * dir_vec[code]

        te = tet_table[sel_case]                   # (T, 6) edge ids, -1 pad
        tesafe = jnp.maximum(te, 0)
        vkn = jnp.take_along_axis(ekey, tesafe, axis=1)      # (T, 6)
        vp = jnp.take_along_axis(epos, tesafe[..., None], axis=1)  # (T,6,3)

        tri_valid = jnp.stack([m, m & (te[:, 3] >= 0)], axis=1)  # (T, 2)
        tv = tri_valid.reshape(-1)  # (2T,) tet-major, tri-minor
        rank = jnp.cumsum(tv.astype(jnp.int32)) - 1
        dest_tri = jnp.where(tv, ptr + rank, f_cap)  # OOB -> dropped
        vslot = (dest_tri[:, None] * 3
                 + jnp.arange(3, dtype=jnp.int32)).reshape(-1)  # (6T,)

        kn = kn.at[vslot].set(vkn.reshape(-1), mode="drop")
        pos_buf = pos_buf.at[vslot].set(vp.reshape(-1, 3), mode="drop")
        ptr = ptr + jnp.sum(tv, dtype=jnp.int32)
        return (kn, pos_buf, ptr), None

    (kn, pos_buf, n_tris), _ = jax.lax.scan(
        slab, (kn0, pos0, jnp.int32(0)),
        jnp.arange(n_slabs, dtype=jnp.int32))

    # ---- weld: sort by edge key (sentinel keys sink to the end) ----
    slot = jnp.arange(3 * f_cap, dtype=jnp.int32)
    kn_s, slot_s = jax.lax.sort_key_val(kn, slot)
    real = kn_s != jnp.uint32(0xFFFFFFFF)
    prev_differs = jnp.concatenate([
        jnp.ones((1,), bool), kn_s[1:] != kn_s[:-1]])
    newv = prev_differs & real
    vid_sorted = jnp.cumsum(newv.astype(jnp.int32)) - 1
    n_verts = jnp.sum(newv, dtype=jnp.int32)

    verts = jnp.zeros((v_cap, 3), jnp.float32)
    verts = verts.at[jnp.where(real, vid_sorted, v_cap)].set(
        pos_buf[slot_s], mode="drop")
    vids = jnp.zeros((3 * f_cap,), jnp.int32).at[slot_s].set(
        jnp.where(real, vid_sorted, 0), mode="drop")
    faces = vids.reshape(f_cap, 3)
    return verts, faces, n_verts, n_tris


def _bucket(n: int, minimum: int = 4096) -> int:
    """Round up to {2^k, 1.5*2^k}: bounds padded-buffer fetch waste at 33%
    while keeping the set of compiled capacities small."""
    b = minimum
    while b < n:
        b2 = b * 3 // 2 if (b & (b - 1)) == 0 else b * 4 // 3
        b = b2
    return b


def extract_isosurface_device(
    volume,
    level: float = 0.0,
    slab_cells: int = 2_000_000,
):
    """Device-side extraction: returns (verts (v_cap, 3) device f32 in GRID
    coordinates, faces (f_cap, 3) device i32, n_verts, n_tris) with host
    ints for the counts.  Rows past the counts are padding (faces padded
    with (0,0,0)); callers slice after fetching."""
    volume = jnp.asarray(volume)
    nx, ny, nz = volume.shape
    per_x = max((ny - 1) * (nz - 1), 1)
    sx = max(min(slab_cells // per_x, nx - 1), 1)
    nxp = -(-(nx - 1) // sx) * sx + 1

    tets, n_tris, n_edges = _surface_counts(volume, level, sx=sx, nxp=nxp)
    tets, n_tris, n_edges = (np.asarray(tets), int(n_tris), int(n_edges))
    if n_tris == 0:
        return (jnp.zeros((0, 3), jnp.float32), jnp.zeros((0, 3), jnp.int32),
                0, 0)
    tet_cap = _bucket(int(tets.max()))
    f_cap = _bucket(n_tris)
    v_cap = _bucket(n_edges)
    verts, faces, n_v, n_t = _extract_weld(
        volume, level, sx=sx, nxp=nxp, tet_cap=tet_cap, f_cap=f_cap,
        v_cap=v_cap)
    return verts, faces, int(n_v), int(n_t)


def extract_isosurface(
    volume,
    origin,
    spacing,
    level: float = 0.0,
    slab_cells: int = 2_000_000,
):
    """Extract a triangle mesh from a dense SDF volume.

    volume: (nx, ny, nz) array (device or host); origin (3,), spacing (3,)
    map grid coords to world.  Returns (vertices (V, 3) f32, faces (F, 3)
    i32) as numpy arrays, vertices welded exactly by grid-edge identity.
    """
    verts_d, faces_d, n_verts, n_tris = extract_isosurface_device(
        volume, level=level, slab_cells=slab_cells)
    if n_tris == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    verts = np.asarray(verts_d)[:n_verts]
    faces = np.asarray(faces_d)[:n_tris]
    origin = np.asarray(origin, np.float32)
    spacing = np.asarray(spacing, np.float32)
    return (origin + verts * spacing).astype(np.float32), faces

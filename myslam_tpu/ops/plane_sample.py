"""Fused tri-plane bilinear sampling from a feature atlas.

Semantics are exactly those of the reference's per-plane
``F.grid_sample(..., mode='bilinear', padding_mode='border',
align_corners=True)`` followed by per-level summation over the three
orientations and concatenation across levels
(reference src/networks/decoders.py:64-85):

  * align_corners=True: pixel coord = (coord_norm + 1)/2 * (size - 1)
  * border padding: coords clamped to [0, size-1] — which also zeroes the
    coordinate gradient outside the border, like the CUDA kernel.

TPU-native, two-stage design driven by the hardware's gather cost model
(measured: gather/scatter throughput on v5e is bound by ROW COUNT, and
rows narrower than the 128-lane vector width waste most of each access):

  1. ``pack_quad`` densely rewrites the (S, 32) atlas into a (S, 128)
     "quad atlas" whose row r holds the 2x2 bilinear corner neighborhood
     [A[y,x] | A[y,x+1] | A[y+1,x] | A[y+1,x+1]] (edges clamped, which
     reproduces grid_sample border padding for free).  This is a cheap
     dense shuffle (slice+concat) executed once per program.
  2. ``sample_quad`` then needs ONE perfectly lane-aligned 128-wide row
     gather per (point, level, orientation) — 6 rows/point instead of 24.

Under autodiff the atlas gradient becomes a scatter-add of 4x fewer,
4x wider rows into the quad layout followed by a dense shifted-slice
reduction back to the true atlas — measured ~4x faster than the naive
layout's backward.  The coordinate gradient (pose optimization) falls out
of the same formulation.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from myslam_tpu.models.planes import ORIENTATIONS, PlaneLayout

# Combine the per-plane row gathers (forward) and fine-plane scatter-adds
# (backward) of one atlas into single calls with concatenated plane-major
# indices.  MEASURED SLOWER on v5e (tools/bench_fusion.py: 6 separate
# 160k-row gathers 4.9 ms vs one 960k-row gather 7.0 ms; the combined
# 960k-row scatter's XLA compile also degenerates to tens of minutes), so
# the default stays per-plane calls — XLA pipelines the independent calls
# better than one long stream.  Kept as a trace-time switch with a parity
# test so the experiment is reproducible from the repo.
FUSE_PLANE_CALLS = os.environ.get("MYSLAM_FUSE_CALLS", "0") == "1"


def pack_quad(atlas: jnp.ndarray, layout: PlaneLayout) -> jnp.ndarray:
    """(S, C) atlas -> (S, 4C) quad atlas of 2x2 corner neighborhoods."""
    parts = []
    C = atlas.shape[-1]
    for lvl in range(layout.n_levels):
        for ori in range(3):
            H, W = layout.shapes[lvl][ori]
            off = layout.offsets[lvl][ori]
            a = atlas[off:off + H * W].reshape(H, W, C)
            right = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
            down = jnp.concatenate([a[1:], a[-1:]], axis=0)
            down_right = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
            q = jnp.concatenate([a, right, down, down_right], axis=-1)
            parts.append(q.reshape(H * W, 4 * C))
    return jnp.concatenate(parts, axis=0)


def _cell_index_and_lane_weights(p_nor: jnp.ndarray, layout: PlaneLayout):
    """Quad-atlas row indices plus bilinear weights already broadcast into
    the 128-lane corner layout.

    Building (N, P, 4C) weights directly in lane space keeps every array
    4C(=128)-lane wide; a (..., 4, C) reshape would force a padded C-lane
    relayout that costs more than the gather itself (measured).  The
    per-corner select is written algebraically —
        w = (0.5 + (wx-0.5)*sx) * (0.5 + (wy-0.5)*sy)
    with constant sign vectors sx/sy — so XLA fuses the whole weighting
    into a single elementwise pass over the gathered rows (the
    where-based form materialized two full-size selects, ~7 ms/iter).

    Returns idx (N, P) int32 and w (N, P, 4C); corner order
    [tl, tr, bl, br] matches pack_quad.
    """
    idx_parts, wx_parts, wy_parts = [], [], []
    for lvl in range(layout.n_levels):
        for ori, (au, av) in enumerate(ORIENTATIONS):
            H, W = layout.shapes[lvl][ori]
            off = layout.offsets[lvl][ori]
            u = p_nor[:, au]
            v = p_nor[:, av]
            x = jnp.clip((u + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
            y = jnp.clip((v + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
            x0f = jnp.floor(x)
            y0f = jnp.floor(y)
            idx_parts.append(
                off + y0f.astype(jnp.int32) * W + x0f.astype(jnp.int32))
            wx_parts.append(x - x0f)
            wy_parts.append(y - y0f)
    idx = jnp.stack(idx_parts, axis=-1)  # (N, P)
    wx = jnp.stack(wx_parts, axis=-1)[..., None]  # (N, P, 1)
    wy = jnp.stack(wy_parts, axis=-1)[..., None]
    C = layout.c_dim
    C4 = 4 * C
    lane = np.arange(C4)
    # numpy constants (not jnp): device-array constants closed over a
    # jit are fetched D2H during MLIR lowering (see
    # renderer.SceneGeometry.bound_array).
    sx = np.where((lane // C) % 2 == 1, 1.0, -1.0).astype(np.float32)
    sy = np.where(lane >= C4 // 2, 1.0, -1.0).astype(np.float32)
    w = (0.5 + (wx - 0.5) * sx) * (0.5 + (wy - 0.5) * sy)
    return idx, w


def corner_row_map(layout: PlaneLayout) -> np.ndarray:
    """Constant map from expanded corner-feature rows (P*4C) to feature
    rows (L*C): corner row (p, c, k) -> level(p)*C + k.

    Lets consumers fold the corner/orientation/level reduction into their
    own first matmul: for any (L*C, D) matrix W,
        corners @ W[corner_row_map] == (corners @ reduce_matrix) @ W,
    skipping the explicit reduction (see decoders.decode_*_corners).
    """
    C = layout.c_dim
    P = layout.n_levels * 3
    r = np.arange(P * 4 * C)
    level = r // (4 * C * 3)
    k = r % C
    return level * C + k


def sample_quad_corners(
    quad: jnp.ndarray, layout: PlaneLayout, p_nor: jnp.ndarray
) -> jnp.ndarray:
    """Weighted corner features, unreduced: (N, P*4C).

    The hot-path form: one row gather + one fused elementwise weighting.
    ``corners @ _reduce_matrix`` equals sample_quad's output; consumers
    should instead fold the reduction into their first matmul via
    corner_row_map.
    """
    n = p_nor.shape[0]
    P = layout.n_levels * 3
    C4 = quad.shape[-1]
    idx, w = _cell_index_and_lane_weights(p_nor, layout)
    g = jnp.take(quad, idx.reshape(-1), axis=0).reshape(n, P, C4)
    return (g * w.astype(quad.dtype)).reshape(n, P * C4)


def reduced_row_map(layout: PlaneLayout) -> np.ndarray:
    """Constant map from orientation-summed corner rows (L*4C) to feature
    rows (L*C): row (l, corner, k) -> l*C + k.  Companion of
    sample_quad_reduced, same folding contract as corner_row_map."""
    C = layout.c_dim
    r = np.arange(layout.n_levels * 4 * C)
    return (r // (4 * C)) * C + (r % C)


def sample_quad_reduced(
    quad: jnp.ndarray, layout: PlaneLayout, p_nor: jnp.ndarray
) -> jnp.ndarray:
    """Weighted, orientation-summed corner features: (N, L*4C).

    The preferred hot-path form.  Computed plane-by-plane so every array
    in the program is a flat lane-aligned (N, 4C): a batched
    (N, L, 3, 4C) formulation forces XLA into T(2,128)/T(4,128) tilings
    whose reshape/broadcast relayouts cost more than the gathers
    themselves (profiled ~9 ms/iter at the mapping operating point).
    The orientation sum is a plain (N, 4C) add that fuses into the
    gather's consumer.  Consumers fold the remaining corner+level
    reduction into their first matmul via reduced_row_map.
    """
    sx, sy = _lane_signs(layout)
    reds = []
    for lvl, ori, au, av, H, W, off in _plane_list(layout):
        cell, wx, wy, _, _ = _plane_coords(p_nor, au, av, H, W)
        g = jnp.take(quad, off + cell, axis=0)
        # Weighting in f32 regardless of atlas dtype: a bfloat16 quad
        # halves the gather traffic, weights stay exact.
        w = _lane_w(wx[:, None], wy[:, None], sx, sy)
        term = g.astype(w.dtype) * w
        if ori == 0:
            reds.append(term)
        else:
            reds[lvl] = reds[lvl] + term
    return jnp.concatenate(reds, axis=-1)


def _reduce_matrix(layout: PlaneLayout, dtype) -> jnp.ndarray:
    """Constant (P*4C, L*C) block matrix summing corners + orientations and
    concatenating levels — the whole feature reduction as ONE MXU matmul."""
    C = layout.c_dim
    L = layout.n_levels
    P = L * 3
    m = np.zeros((P * 4 * C, L * C), np.float32)
    eye = np.eye(C, dtype=np.float32)
    for lvl in range(L):
        for ori in range(3):
            p = lvl * 3 + ori
            for corner in range(4):
                r = p * 4 * C + corner * C
                m[r:r + C, lvl * C:(lvl + 1) * C] = eye
    # numpy constant (not jnp): see SceneGeometry.bound_array.
    return m.astype(dtype)


def sample_quad(
    quad: jnp.ndarray, layout: PlaneLayout, p_nor: jnp.ndarray
) -> jnp.ndarray:
    """Sample a pre-packed quad atlas at normalized points.

    quad: (S, 4C); p_nor: (N, 3) in [-1, 1].
    Returns (N, L*C): per-level orientation-summed features, concatenated
    coarse-to-fine (reference src/networks/decoders.py:77-83).

    Pipeline: one lane-aligned row gather, lane-space bilinear weighting,
    and a matmul against a constant block-identity matrix for the
    corner/orientation/level reduction.  NOTE: hot paths should prefer
    sample_quad_corners + corner_row_map folding (skips this matmul).
    """
    weighted = sample_quad_corners(quad, layout, p_nor)
    reduce_m = _reduce_matrix(layout, quad.dtype)
    return jnp.dot(weighted, reduce_m, preferred_element_type=jnp.float32)


# Planes with at most this many rows take the MXU one-hot path for their
# gradient scatter (see _scatter_grad): below this size the dense
# (N, rows) bf16 one-hot matmul beats XLA's row-serialized scatter-add
# (measured on v5e: ~2.3 ms per 160k-row scatter vs ~0.6 ms one-hot for a
# few-hundred-row coarse plane; break-even near ~2k rows).  Tests that
# need bitwise scatter parity can set this to 0.
ONEHOT_MAX_ROWS = 2048


def _plane_list(layout: PlaneLayout):
    """Static per-plane (lvl, ori, au, av, H, W, off) tuples, layout order."""
    out = []
    for lvl in range(layout.n_levels):
        for ori, (au, av) in enumerate(ORIENTATIONS):
            H, W = layout.shapes[lvl][ori]
            out.append((lvl, ori, au, av, H, W, layout.offsets[lvl][ori]))
    return out


def _plane_coords(p_nor, au, av, H, W):
    """Per-plane cell index + bilinear fractions + in-range masks, all flat
    (N,) — grid_sample align_corners=True / border-padding semantics."""
    u = p_nor[:, au]
    v = p_nor[:, av]
    xr = (u + 1.0) * 0.5 * (W - 1.0)
    yr = (v + 1.0) * 0.5 * (H - 1.0)
    x = jnp.clip(xr, 0.0, W - 1.0)
    y = jnp.clip(yr, 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    cell = (y0 * W + x0).astype(jnp.int32)
    in_x = ((xr >= 0.0) & (xr <= W - 1.0)).astype(jnp.float32)
    in_y = ((yr >= 0.0) & (yr <= H - 1.0)).astype(jnp.float32)
    return cell, x - x0, y - y0, in_x, in_y


def _lane_signs(layout: PlaneLayout):
    C = layout.c_dim
    C4 = 4 * C
    lane = np.arange(C4)
    sx = np.where((lane // C) % 2 == 1, 1.0, -1.0).astype(np.float32)
    sy = np.where(lane >= C4 // 2, 1.0, -1.0).astype(np.float32)
    return sx, sy


def _lane_w(wx, wy, sx, sy):
    """(N,P,1) fractions -> (N,P,4C) corner weights in lane layout."""
    return (0.5 + (wx - 0.5) * sx) * (0.5 + (wy - 0.5) * sy)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def sample_fused(quad: jnp.ndarray, layout: PlaneLayout,
                 p_nor: jnp.ndarray) -> jnp.ndarray:
    """sample_quad_reduced with a hand-written VJP.

    Forward math is identical to sample_quad_reduced.  The backward is
    written plane-by-plane in the same flat (N, 4C) discipline as the
    forward — autodiff's (N, L, 3, 4C) broadcast/reshape chain cost more
    in layout copies than the scatters themselves — and routes each
    plane's atlas gradient either through XLA's scatter-add (large
    planes) or through a dense one-hot MXU matmul (planes with
    <= ONEHOT_MAX_ROWS rows, i.e. the coarse levels), which turns the
    row-serialized scatter into two streaming passes + a matmul.
    """
    return sample_quad_reduced(quad, layout, p_nor)


def _sample_fused_fwd(quad, layout, p_nor):
    sx, sy = _lane_signs(layout)
    planes = _plane_list(layout)
    cells, wxs, wys, inxs, inys = [], [], [], [], []
    for lvl, ori, au, av, H, W, off in planes:
        cell, wx, wy, in_x, in_y = _plane_coords(p_nor, au, av, H, W)
        cells.append(cell)
        wxs.append(wx)
        wys.append(wy)
        inxs.append(in_x)
        inys.append(in_y)
    n = p_nor.shape[0]
    if FUSE_PLANE_CALLS:
        # ONE row gather per atlas: plane-major concatenated indices give
        # the transaction engine a single long pipeline; the per-plane
        # views below are static row slices (fused, no copies).
        idx_all = jnp.concatenate(
            [off + c for (_, _, _, _, _, _, off), c in zip(planes, cells)])
        g_all = jnp.take(quad, idx_all, axis=0)
        gs = [g_all[p * n:(p + 1) * n] for p in range(len(planes))]
    else:
        gs = [jnp.take(quad, off + c, axis=0)
              for (_, _, _, _, _, _, off), c in zip(planes, cells)]
    reds = [None] * layout.n_levels
    for p, (lvl, ori, au, av, H, W, off) in enumerate(planes):
        w = _lane_w(wxs[p][:, None], wys[p][:, None], sx, sy)
        term = gs[p].astype(w.dtype) * w
        reds[lvl] = term if ori == 0 else reds[lvl] + term
    red = jnp.concatenate(reds, axis=-1)
    return red, (tuple(gs), tuple(cells), tuple(wxs), tuple(wys),
                 tuple(inxs), tuple(inys))


def _scatter_grad(quad_grad, off, rows, cell, upd):
    """Accumulate one plane's (N, 4C) updates at cell indices into the
    quad-gradient buffer rows [off, off+rows)."""
    if rows <= ONEHOT_MAX_ROWS:
        # Dense route: one-hot^T @ upd on the MXU.  One-hot entries are
        # exact in bf16; updates lose ~2^-8 relative — gradient noise far
        # below Adam's own stochasticity (pixel sampling).
        oh = (cell[:, None] == jnp.arange(rows, dtype=jnp.int32)[None, :]
              ).astype(jnp.bfloat16)
        pg = jnp.dot(oh.T, upd.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        return quad_grad.at[off:off + rows].add(pg.astype(quad_grad.dtype))
    return quad_grad.at[off + cell].add(upd.astype(quad_grad.dtype))


def _sample_fused_bwd(layout, res, gbar):
    gs, cells, wxs, wys, inxs, inys = res
    n = gbar.shape[0]
    C4 = gs[0].shape[-1]
    sx, sy = _lane_signs(layout)

    quad_grad = jnp.zeros((layout.total_rows, C4), jnp.float32)
    pg_cols = [jnp.zeros((n,), jnp.float32) for _ in range(3)]
    fine_cells, fine_upds = [], []
    for p, (lvl, ori, au, av, H, W, off) in enumerate(_plane_list(layout)):
        gl = gbar[:, lvl * C4:(lvl + 1) * C4]  # (N, 4C)
        wxl = wxs[p][:, None]
        wyl = wys[p][:, None]
        fx = 0.5 + (wxl - 0.5) * sx
        fy = 0.5 + (wyl - 0.5) * sy
        upd = gl * (fx * fy)
        if FUSE_PLANE_CALLS and H * W > ONEHOT_MAX_ROWS:
            # Deferred: all large-plane updates ride ONE combined
            # scatter-add after the loop (coarse planes keep the one-hot
            # MXU route either way).
            fine_cells.append(off + cells[p])
            fine_upds.append(upd)
        else:
            quad_grad = _scatter_grad(quad_grad, off, H * W, cells[p], upd)

        # Coordinate gradient: dL/dwx = sum_lanes g*gl * sx*fy (dwy dual).
        ggl = gs[p].astype(jnp.float32) * gl
        dwx = jnp.sum(ggl * (sx * fy), axis=-1)
        dwy = jnp.sum(ggl * (sy * fx), axis=-1)
        pg_cols[au] = pg_cols[au] + dwx * inxs[p] * (0.5 * (W - 1.0))
        pg_cols[av] = pg_cols[av] + dwy * inys[p] * (0.5 * (H - 1.0))
    if fine_upds:
        quad_grad = quad_grad.at[jnp.concatenate(fine_cells)].add(
            jnp.concatenate(fine_upds))
    p_grad = jnp.stack(pg_cols, axis=-1)
    return quad_grad.astype(gs[0].dtype), p_grad


sample_fused.defvjp(_sample_fused_fwd, _sample_fused_bwd)


def sample_atlas(
    atlas: jnp.ndarray, layout: PlaneLayout, p_nor: jnp.ndarray
) -> jnp.ndarray:
    """Sample the (unpacked) plane atlas: pack_quad + sample_quad.

    Callers issuing several sample calls against the same atlas in one
    program (renderer, mesher) should pack once and call sample_quad.
    """
    return sample_quad(pack_quad(atlas, layout), layout, p_nor)

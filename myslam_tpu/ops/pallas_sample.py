"""Pallas TPU kernels for fused tri-plane sampling (the grid_sample slot).

The north-star asks for the hot ops as Pallas kernels; this module holds
the hand-written alternatives to ops/plane_sample.sample_fused (XLA
gather + fused weighting), benchmarked by tools/bench_scatter.py.
Status on the current toolchain (jax 0.9 Mosaic, v5e, 2026-08):

  * ``make_sample_quad_pallas_dma`` — WORKS.  The supported TPU
    sparse-gather idiom: per tile of points, a scalar loop issues one
    ``make_async_copy`` row DMA per (point, plane) from the
    HBM-resident atlas into VMEM scratch (dynamic ``pl.ds`` offsets are
    legal on DMA descriptors), then the bilinear weighting and
    orientation reduction run vectorized, all 2-D.  Exact-parity with
    the XLA path; measured 31.5 ms vs XLA's 5.2 ms per 160 k points x 6
    planes (f32) — row-DMA issue latency bound, so the XLA gather
    remains the product path.  Toolchain constraints found the hard
    way: single-row bf16 DMAs and >512-point tiles crash the Mosaic
    compile helper (HTTP 500, no diagnostics); keep f32 rows and
    tile <= 512.
  * ``make_sample_quad_pallas_vmem`` — RETIRED by the jax upgrade: its
    whole-atlas-in-VMEM design reads rows with scalar ``ref[idx]``
    indexing, whose Pallas TC lowering (dynamic_slice) was removed.
    Kept for the interpret-mode math tests and as the design record —
    when it ran (earlier jax) it measured 5.8 ms vs XLA's then-4.1 ms.
  * the XLA path (plane_sample.sample_fused) — one lane-aligned row
    gather per (point, plane) + fused elementwise weighting; the
    winner at every shape measured, and the default.

Forward-only: the backward runs through the XLA scatter path either way
(sample_fused's hand VJP).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from myslam_tpu.models.planes import ORIENTATIONS, PlaneLayout

try:  # pallas is TPU-only at runtime; import lazily for CPU test envs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def plane_indices_and_fracs(layout: PlaneLayout, p_nor: jnp.ndarray):
    """Quad-atlas row index + bilinear fractions per (point, plane).

    Returns idx (N, P) i32, wx (N, P), wy (N, P) — identical coordinate
    math to plane_sample._plane_coords (align_corners=True, border clamp).
    """
    idxs, wxs, wys = [], [], []
    for lvl in range(layout.n_levels):
        for ori, (au, av) in enumerate(ORIENTATIONS):
            H, W = layout.shapes[lvl][ori]
            off = layout.offsets[lvl][ori]
            u = p_nor[:, au]
            v = p_nor[:, av]
            x = jnp.clip((u + 1.0) * 0.5 * (W - 1.0), 0.0, W - 1.0)
            y = jnp.clip((v + 1.0) * 0.5 * (H - 1.0), 0.0, H - 1.0)
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            idxs.append(off + (y0 * W + x0).astype(jnp.int32))
            wxs.append(x - x0)
            wys.append(y - y0)
    return (jnp.stack(idxs, -1), jnp.stack(wxs, -1), jnp.stack(wys, -1))


def _lane_sign_consts(c_dim: int):
    C4 = 4 * c_dim
    lane = np.arange(C4)
    sx = np.where((lane // c_dim) % 2 == 1, 1.0, -1.0).astype(np.float32)
    sy = np.where(lane >= C4 // 2, 1.0, -1.0).astype(np.float32)
    return sx, sy


def make_sample_quad_pallas_vmem(layout: PlaneLayout, n_points: int,
                                 tile: int = 512,
                                 atlas_dtype=jnp.bfloat16):
    """Build sample(quad (S, 4C), idx (N, P), wx, wy) -> (N, L*4C).

    Whole-atlas-in-VMEM design; ``n_points`` and the layout are static.
    The quad is cast to ``atlas_dtype`` (bf16 halves VMEM pressure; the
    weighting runs in f32 regardless, like the XLA path).
    """
    if not HAVE_PALLAS:
        raise RuntimeError("pallas unavailable")
    L = layout.n_levels
    C = layout.c_dim
    C4 = 4 * C
    P = L * 3
    S = layout.total_rows
    n_tiles = -(-n_points // tile)

    def kernel(quad_ref, idx_ref, wx_ref, wy_ref, out_ref):
        # (tile, P) index/frac blocks; quad pinned whole in VMEM.
        # Lane sign vectors built in-kernel (constants may not be
        # captured by a pallas kernel closure).
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C4), 1)
        sx = jnp.where((lane // C) % 2 == 1, 1.0, -1.0)[0]
        sy = jnp.where(lane >= C4 // 2, 1.0, -1.0)[0]
        wxt = wx_ref[:]  # (tile, P)
        wyt = wy_ref[:]

        def body(i, _):
            acc = jnp.zeros((L, C4), jnp.float32)
            for p in range(P):  # static: 6 planes
                # pl.ds indexing: newer Pallas TC lowering dropped plain
                # scalar dynamic_slice indexing on VMEM refs (and jax
                # 0.9 removed pl.load in favor of ref[pl.ds(...)]).
                row = quad_ref[pl.ds(idx_ref[i, p], 1), :][0].astype(
                    jnp.float32)
                fx = 0.5 + (wxt[i, p] - 0.5) * sx
                fy = 0.5 + (wyt[i, p] - 0.5) * sy
                acc = acc.at[p // 3].add(row * (fx * fy))
            out_ref[i, :] = acc.reshape(L * C4)
            return 0

        jax.lax.fori_loop(0, tile, body, 0)

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((S, C4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, L * C4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )

    def sample(quad, idx, wx, wy):
        n = idx.shape[0]
        pad = n_tiles * tile - n
        if pad:
            idx = jnp.pad(idx, ((0, pad), (0, 0)))
            wx = jnp.pad(wx, ((0, pad), (0, 0)))
            wy = jnp.pad(wy, ((0, pad), (0, 0)))
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_tiles * tile, L * C4),
                                           jnp.float32),
            grid_spec=grid_spec,
        )(quad.astype(atlas_dtype), idx, wx, wy)
        return out[:n]

    return sample


def make_sample_quad_pallas_dma(layout: PlaneLayout, n_points: int,
                                tile: int = 256,
                                atlas_dtype=jnp.float32):
    """Tri-plane gather via MANUAL DMA — the supported TPU sparse-gather
    idiom on current Pallas (the older VMEM kernel's scalar
    ``ref[idx]`` indexing stopped lowering after a jax upgrade:
    dynamic_slice on VMEM refs is no longer implemented for TC).

    Per grid step (one tile of points): a scalar fori_loop issues
    ``pltpu.make_async_copy`` row DMAs from the HBM-resident quad atlas
    (dynamic ``pl.ds`` offsets are supported on DMA descriptors) into a
    (tile, P, 4C) VMEM scratch — double-buffered at the row level by
    issuing all copies before waiting — then the bilinear weighting and
    orientation reduction run vectorized on the VPU.

    Returns sample(quad (S, 4C), idx (N, P), wx, wy) -> (N, L*4C).
    """
    if not HAVE_PALLAS:
        raise RuntimeError("pallas unavailable")
    L = layout.n_levels
    C = layout.c_dim
    C4 = 4 * C
    P = L * 3
    n_tiles = -(-n_points // tile)

    def kernel(idx_ref, quad_ref, wx_ref, wy_ref, out_ref, rows_ref,
               sem_ref):
        # Plane-major scratch layout (k = p*tile + i) so the weighting
        # below slices each plane's rows as a STATIC 2-D block — every
        # in-kernel op stays 2-D (higher-rank reshapes/reductions have
        # been observed to crash this Mosaic toolchain outright).
        def copy_k(k):
            r = idx_ref[k % tile, k // tile]
            return pltpu.make_async_copy(
                quad_ref.at[pl.ds(r, 1), :],
                rows_ref.at[pl.ds(k, 1), :],
                sem_ref,
            )

        # Issue every row DMA (all signal the one shared semaphore so
        # they overlap), then wait them all — the wait loop's
        # descriptors decrement the same semaphore by each copy's bytes.
        def issue(k, _):
            copy_k(k).start()
            return 0

        jax.lax.fori_loop(0, tile * P, issue, 0)

        def wait(k, _):
            copy_k(k).wait()
            return 0

        jax.lax.fori_loop(0, tile * P, wait, 0)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C4), 1)
        sx = jnp.where((lane // C) % 2 == 1, 1.0, -1.0)  # (1, C4)
        sy = jnp.where(lane >= C4 // 2, 1.0, -1.0)
        for lvl in range(L):
            acc = jnp.zeros((tile, C4), jnp.float32)
            for ori in range(3):
                p = lvl * 3 + ori
                rows_p = rows_ref[p * tile:(p + 1) * tile, :].astype(
                    jnp.float32)  # (tile, C4), static slice
                fx = 0.5 + (wx_ref[:, p:p + 1] - 0.5) * sx
                fy = 0.5 + (wy_ref[:, p:p + 1] - 0.5) * sy
                acc = acc + rows_p * (fx * fy)
            out_ref[:, lvl * C4:(lvl + 1) * C4] = acc

    def sample(quad, idx, wx, wy):
        n = idx.shape[0]
        pad = n_tiles * tile - n
        if pad:
            idx = jnp.pad(idx, ((0, pad), (0, 0)))
            wx = jnp.pad(wx, ((0, pad), (0, 0)))
            wy = jnp.pad(wy, ((0, pad), (0, 0)))
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile, P), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),  # idx tile
                pl.BlockSpec(memory_space=pltpu.ANY),   # quad, HBM
                pl.BlockSpec((tile, P), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, P), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, L * C4), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles * tile, L * C4),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((tile * P, C4), atlas_dtype),
                pltpu.SemaphoreType.DMA,
            ],
        )(idx, quad.astype(atlas_dtype), wx.astype(jnp.float32),
          wy.astype(jnp.float32))
        return out[:n]

    return sample


def sample_fused_pallas(quad: jnp.ndarray, layout: PlaneLayout,
                        p_nor: jnp.ndarray, tile: int = 512) -> jnp.ndarray:
    """Drop-in forward for plane_sample.sample_quad_reduced via the
    VMEM-resident Pallas kernel (build + call; callers on hot paths
    should build once with make_sample_quad_pallas_vmem)."""
    idx, wx, wy = plane_indices_and_fracs(layout, p_nor)
    fn = make_sample_quad_pallas_vmem(layout, p_nor.shape[0], tile=tile)
    return fn(quad, idx, wx, wy)

"""Pallas TPU kernel for fused tri-plane sampling (the grid_sample slot).

The north-star asks for the hot ops as Pallas kernels; this module is the
hand-written alternative to ops/plane_sample.sample_fused (XLA gather +
fused weighting).  Two designs are provided and benchmarked by
tools/bench_scatter.py:

  * ``sample_quad_pallas_vmem`` — the whole quad atlas is pinned in VMEM
    (fits for bf16 atlases up to ~14 MB: every Replica-scale SDF atlas,
    and the color atlas after level-splitting) and each point's 6 rows
    are read with dynamic scalar indexing, weighted on the VPU, and
    orientation-summed in-register.  Rationale: the XLA path re-reads
    gathered rows from HBM every iteration (~0.5 GB per mapping
    iteration at the 4000-ray operating point); a VMEM-resident atlas
    pays that traffic once per program.
  * the XLA path (plane_sample.sample_fused) — one lane-aligned row
    gather per (point, plane) + fused elementwise weighting.

Measured numbers are recorded in tools/bench_scatter.py output and the
README's performance notes; the faster path is selected by
``MYSLAM_PALLAS=1`` (default remains the XLA path unless the kernel wins
on the target shape).  Forward-only: the backward runs through the XLA
scatter path either way (sample_fused's hand VJP).
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
                row = quad_ref[idx_ref[i, p], :].astype(jnp.float32)
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


def sample_fused_pallas(quad: jnp.ndarray, layout: PlaneLayout,
                        p_nor: jnp.ndarray, tile: int = 512) -> jnp.ndarray:
    """Drop-in forward for plane_sample.sample_quad_reduced via the
    VMEM-resident Pallas kernel (build + call; callers on hot paths
    should build once with make_sample_quad_pallas_vmem)."""
    idx, wx, wy = plane_indices_and_fracs(layout, p_nor)
    fn = make_sample_quad_pallas_vmem(layout, p_nor.shape[0], tile=tile)
    return fn(quad, idx, wx, wy)

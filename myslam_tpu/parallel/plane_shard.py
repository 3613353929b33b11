"""Map-block (spatial) sharding of the plane atlases with halo exchange.

This is the framework's analog of sequence/context parallelism (SURVEY
§5.7): the scene representation itself is partitioned across devices so
maps larger than one chip's HBM can be trained.  Design:

  * every plane's rows (its H dimension, padded to a multiple of the mesh
    size) are split evenly across the ``map`` mesh axis — each device
    holds a horizontal band of every plane at every level, so load is
    balanced regardless of plane aspect ratios;
  * quad packing (ops/plane_sample.pack_quad) needs each cell's DOWN
    neighbor: the one-row halo at each band edge is exchanged with
    ``jax.lax.ppermute`` over the mesh axis (the last band clamps,
    reproducing grid_sample border padding);
  * sampling gathers only rows a device owns (others masked to zero) and
    the per-point features are ``psum``'d over the axis — one collective
    of (N, L*4C) per sample call;
  * the backward (via autodiff of this very function under shard_map)
    scatters only into the local band: plane gradients never leave the
    device that owns the rows.

The reference has no counterpart (single GPU, whole map resident,
SURVEY §2.2); this layer is what lets the map scale with the mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from myslam_tpu.models.planes import ORIENTATIONS, PlaneLayout


class ShardedPlaneLayout:
    """Static geometry of a row-band-sharded atlas.

    For each plane (level, orientation) with shape (H, W): H is padded to
    Hp = n_shards * ceil(H / n_shards); device d owns plane rows
    [d * Hp/n, (d+1) * Hp/n).  The local atlas concatenates each plane's
    band in the same plane order as the fused layout.
    """

    def __init__(self, layout: PlaneLayout, n_shards: int):
        self.layout = layout
        self.n_shards = n_shards
        self.band_h = []      # rows of each plane per shard
        self.local_off = []   # row offset of each plane band in the shard
        self.W = []
        self.H = []
        off = 0
        for lvl in range(layout.n_levels):
            for ori in range(3):
                H, W = layout.shapes[lvl][ori]
                bh = -(-H // n_shards)
                self.band_h.append(bh)
                self.local_off.append(off)
                self.W.append(W)
                self.H.append(H)
                off += bh * W
        self.local_rows = off  # rows per shard

    def shard_atlas(self, atlas: jnp.ndarray) -> np.ndarray:
        """(S, C) fused atlas -> (n_shards * local_rows, C) band-major
        host array ready for device_put with P('map', None)."""
        C = atlas.shape[-1]
        a = np.asarray(atlas)
        out = np.zeros((self.n_shards, self.local_rows, C), a.dtype)
        p = 0
        for lvl in range(self.layout.n_levels):
            for ori in range(3):
                H, W = self.layout.shapes[lvl][ori]
                off = self.layout.offsets[lvl][ori]
                plane = a[off:off + H * W].reshape(H, W, C)
                bh = self.band_h[p]
                for d in range(self.n_shards):
                    band = plane[d * bh:(d + 1) * bh]
                    lo = self.local_off[p]
                    out[d, lo:lo + band.shape[0] * W] = band.reshape(-1, C)
                p += 1
        return out.reshape(-1, C)

    def unshard_atlas(self, sharded: np.ndarray) -> np.ndarray:
        """Inverse of shard_atlas (drops padding rows)."""
        C = sharded.shape[-1]
        s = np.asarray(sharded).reshape(self.n_shards, self.local_rows, C)
        out = np.zeros((self.layout.total_rows, C), s.dtype)
        p = 0
        for lvl in range(self.layout.n_levels):
            for ori in range(3):
                H, W = self.layout.shapes[lvl][ori]
                off = self.layout.offsets[lvl][ori]
                bh = self.band_h[p]
                for d in range(self.n_shards):
                    y0 = d * bh
                    rows = min(bh, H - y0)
                    if rows <= 0:
                        continue
                    lo = self.local_off[p]
                    out[off + y0 * W: off + (y0 + rows) * W] = \
                        s[d, lo:lo + rows * W]
                p += 1
        return out

    def to_banded_index(self) -> np.ndarray:
        """(n_shards * local_rows,) map banded row -> standard atlas row,
        -1 for band padding rows (content never read by sampling: padded
        plane rows sit past the border clamp, and the halo weight at the
        true bottom row is exactly zero)."""
        idx = np.full((self.n_shards, self.local_rows), -1, np.int64)
        p = 0
        for lvl in range(self.layout.n_levels):
            for ori in range(3):
                H, W = self.layout.shapes[lvl][ori]
                off = self.layout.offsets[lvl][ori]
                bh = self.band_h[p]
                lo = self.local_off[p]
                for d in range(self.n_shards):
                    y0 = d * bh
                    rows = min(bh, H - y0)
                    if rows > 0:
                        idx[d, lo:lo + rows * W] = off + np.arange(
                            y0 * W, (y0 + rows) * W)
                p += 1
        return idx.reshape(-1)

    def from_banded_index(self) -> np.ndarray:
        """(total_rows,) map standard atlas row -> banded row (exact)."""
        fwd = self.to_banded_index()
        inv = np.zeros((self.layout.total_rows,), np.int64)
        keep = fwd >= 0
        inv[fwd[keep]] = np.nonzero(keep)[0]
        return inv


def make_local_fns(slayout: ShardedPlaneLayout, axis: str):
    """Per-device (pack_local, sample_local) over one shard's band atlas.

    These are the building blocks shared by every sharded backend —
    callable inside ANY shard_map that carries ``axis`` (including
    combined kf x map meshes, where nesting whole shard_maps is not an
    option):

      pack_local(local (local_rows, C), d) -> local quad (local_rows, 4C)
        halo-exchanged quad packing of the local row bands (one ppermute
        over ``axis`` fetches each band's down-neighbor row; the last
        band clamps, reproducing grid_sample border padding).

      sample_local(quad_local, p_nor, d) -> (N, L*4C) partial features
        owned-row gather + masked bilinear weighting; callers must psum
        the result over ``axis`` to assemble the full features.
    """
    layout = slayout.layout
    n = slayout.n_shards
    L = layout.n_levels
    C = layout.c_dim
    C4 = 4 * C
    P_ = L * 3

    lane = np.arange(C4)
    # numpy constants (not jnp): device-array constants closed over a
    # jit are fetched D2H during MLIR lowering (see
    # renderer.SceneGeometry.bound_array).
    sx = np.where((lane // C) % 2 == 1, 1.0, -1.0).astype(np.float32)
    sy = np.where(lane >= C4 // 2, 1.0, -1.0).astype(np.float32)

    def pack_local(local, d):
        parts = []
        # halo: first row-band slice of each plane from the NEXT device
        halos = []
        for p in range(P_):
            W = slayout.W[p]
            lo = slayout.local_off[p]
            first_row = jax.lax.dynamic_slice_in_dim(local, lo, W, 0)
            halos.append(first_row)
        halo_cat = jnp.concatenate(halos, axis=0)
        # send my first rows to the previous device (they are its halo)
        perm = [(i, (i - 1) % n) for i in range(n)]
        halo_recv = jax.lax.ppermute(halo_cat, axis, perm)

        hoff = 0
        for p in range(P_):
            W = slayout.W[p]
            bh = slayout.band_h[p]
            lo = slayout.local_off[p]
            a = jax.lax.dynamic_slice_in_dim(
                local, lo, bh * W, 0).reshape(bh, W, C)
            halo = jax.lax.dynamic_slice_in_dim(
                halo_recv, hoff, W, 0).reshape(1, W, C)
            hoff += W
            # last device: clamp at its own bottom row (border padding);
            # also rows beyond the true plane height never get sampled,
            # so their content is irrelevant.
            is_last = d == n - 1
            halo = jnp.where(is_last, a[-1:], halo)
            ext = jnp.concatenate([a, halo], axis=0)  # (bh+1, W, C)
            right = jnp.concatenate([ext[:, 1:], ext[:, -1:]], axis=1)
            q = jnp.concatenate(
                [ext[:-1], right[:-1], ext[1:], right[1:]], axis=-1)
            parts.append(q.reshape(bh * W, C4))
        return jnp.concatenate(parts, axis=0)

    AU = np.array([u for (u, v) in ORIENTATIONS] * L)
    AV = np.array([v for (u, v) in ORIENTATIONS] * L)
    Wc = np.array(slayout.W, np.float32)
    Hc = np.array(slayout.H, np.float32)
    BH = np.array(slayout.band_h, np.int32)
    LO = np.array(slayout.local_off, np.int32)

    def sample_local(quad, p_nor, d):
        nq = p_nor.shape[0]
        u = p_nor[:, AU]
        v = p_nor[:, AV]
        x = jnp.clip((u + 1.0) * 0.5 * (Wc - 1.0), 0.0, Wc - 1.0)
        y = jnp.clip((v + 1.0) * 0.5 * (Hc - 1.0), 0.0, Hc - 1.0)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = (x - x0)[..., None]
        wy = (y - y0)[..., None]
        yi = y0.astype(jnp.int32)
        # ownership: plane row yi in [d*bh, (d+1)*bh)
        y_lo = d * BH
        owned = (yi >= y_lo) & (yi < y_lo + BH)
        lidx = LO + (yi - y_lo) * Wc.astype(jnp.int32) \
            + x0.astype(jnp.int32)
        lidx = jnp.clip(lidx, 0, quad.shape[0] - 1)
        g = jnp.take(quad, lidx.reshape(-1), axis=0).reshape(nq, P_, C4)
        w = (0.5 + (wx - 0.5) * sx) * (0.5 + (wy - 0.5) * sy)
        g = jnp.where(owned[..., None], g.astype(jnp.float32), 0.0) * w
        return jnp.sum(g.reshape(nq, L, 3, C4), axis=2).reshape(nq, L * C4)

    return pack_local, sample_local


def make_banded_pack(mesh: Mesh, axis: str, slayout: ShardedPlaneLayout):
    """Banded atlas (P(axis, None)) -> banded quad atlas (P(axis, None)).

    Run ONCE per program over a frozen atlas, then sample the quad many
    times (tracking, meshing) without repeating the halo exchange."""
    pack_local, _ = make_local_fns(slayout, axis)

    @partial(shard_map, mesh=mesh, in_specs=(P(axis, None),),
             out_specs=P(axis, None), check_vma=False)
    def pack(local_atlas):
        return pack_local(local_atlas, jax.lax.axis_index(axis))

    return pack


def make_banded_sample(mesh: Mesh, axis: str, slayout: ShardedPlaneLayout):
    """sample(banded_quad (P(axis,None)), p_nor (P())) -> (N, L*4C) repl."""
    _, sample_local = make_local_fns(slayout, axis)

    @partial(shard_map, mesh=mesh, in_specs=(P(axis, None), P()),
             out_specs=P(), check_vma=False)
    def sample(quad_local, p_nor):
        d = jax.lax.axis_index(axis)
        return jax.lax.psum(sample_local(quad_local, p_nor, d), axis)

    return sample


def make_sharded_sampler(mesh: Mesh, axis: str, slayout: ShardedPlaneLayout):
    """Build sample(local_atlas_shard, p_nor) -> (N, L*4C) under shard_map.

    The returned function runs per device: halo-exchanged quad packing of
    the local bands, owned-row gather, masked weighting, and one psum.
    Differentiable (autodiff under shard_map gives the local scatter +
    psum transpose).
    """
    pack_local, sample_local = make_local_fns(slayout, axis)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    def sample(local_atlas, p_nor):
        d = jax.lax.axis_index(axis)
        quad = pack_local(local_atlas, d)
        return jax.lax.psum(sample_local(quad, p_nor, d), axis)

    return sample


def atlas_sharding(mesh: Mesh, axis: str = "map") -> NamedSharding:
    return NamedSharding(mesh, P(axis, None))

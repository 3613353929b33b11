"""Map-block-sharded rendering backend + the sharded PRODUCT mapper.

parallel/plane_shard.py gives band-partitioned atlases and halo-exchanged
sampling primitives; this module packages them as a renderer backend
(renderer.FieldQueries) so the ENTIRE single-chip engine stack — the
fused frame mapper (selection, iteration scan, pose write-back, keyframe
admission; engine/mapper.make_frame_mapper), including the reference's
depth-less importance branch (src/utils/Renderer.py:108-134) — runs
against a map partitioned across a device mesh with no duplicated math.

Data flow per rendered batch:
  * atlases live banded, P('map', None); ONE halo-exchange quad pack per
    atlas per loss evaluation (amortized over every query in the render);
  * each query gathers only owned rows per device and psums the
    (N, L*4C) features over the mesh axis;
  * decoders run replicated; autodiff scatters plane gradients only into
    the local band — atlas gradients never cross the interconnect.

State conversion between the replicated MapState (tracking, meshing,
checkpoints) and the banded MapState (mapping) is a pair of jitted
device-side permutation gathers: ``shard`` is local slicing of the
replicated source; ``unshard`` is one all-gather of the atlases over ICI
(a few MB, once per mapped frame) — no host round-trip either way (the
remote-device D2H fetch the np.asarray route costs is ~100x slower than
ICI).

The reference has no counterpart: single GPU, whole map resident
(SURVEY §2.2, §5.7); this is the rebuild's map-scaling axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from myslam_tpu.models.decoders import decode_rgb_corners, decode_sdf_corners
from myslam_tpu.models.planes import MapState
from myslam_tpu.ops.plane_sample import reduced_row_map
from myslam_tpu.parallel.plane_shard import (
    ShardedPlaneLayout,
    make_banded_pack,
    make_banded_sample,
)
from myslam_tpu.render.renderer import FieldQueries


class ShardedMapGeometry:
    """Static geometry + jitted conversions for a band-sharded map.

    Owns the sharded layouts, the pack/sample programs bound to one mesh
    axis, and the device-side shard/unshard permutations.  One instance
    per (mesh, scene) — all mapper/query closures hang off it.
    """

    def __init__(self, mesh: Mesh, scene, axis: str = "map",
                 quad_dtype=None):
        self.mesh = mesh
        self.axis = axis
        self.scene = scene
        # mapping.map_bf16 (engine/mapper.py): cast the banded packed
        # quads before sampling — read-precision only, master atlases
        # and loss math stay f32.
        self.quad_dtype = quad_dtype
        n = mesh.shape[axis]
        self.n_shards = n
        self.slayout_sdf = ShardedPlaneLayout(scene.sdf_layout, n)
        self.slayout_color = ShardedPlaneLayout(scene.color_layout, n)
        self._pack_sdf = make_banded_pack(mesh, axis, self.slayout_sdf)
        self._pack_color = make_banded_pack(mesh, axis, self.slayout_color)
        self._sample_sdf = make_banded_sample(mesh, axis, self.slayout_sdf)
        self._sample_color = make_banded_sample(
            mesh, axis, self.slayout_color)
        self._rm_sdf = np.asarray(reduced_row_map(scene.sdf_layout))
        self._rm_color = np.asarray(reduced_row_map(scene.color_layout))

        self.banded_sharding = NamedSharding(mesh, P(axis, None))
        self.replicated = NamedSharding(mesh, P())

        # numpy, not jnp: build-time device-array constants closed over
        # a jit are fetched D2H during MLIR lowering (minutes each in
        # degraded tunnel states — see SceneGeometry.bound_array).
        idx_sdf = np.asarray(self.slayout_sdf.to_banded_index())
        idx_col = np.asarray(self.slayout_color.to_banded_index())
        inv_sdf = np.asarray(self.slayout_sdf.from_banded_index())
        inv_col = np.asarray(self.slayout_color.from_banded_index())

        def to_banded(atlas, idx):
            # Padding rows -> 0 (never sampled; halo weight at the true
            # bottom row is exactly 0, so any finite value is safe).
            return jnp.where(
                idx[:, None] >= 0, atlas[jnp.clip(idx, 0)], 0.0
            ).astype(atlas.dtype)

        self._shard = jax.jit(
            lambda ms: MapState(
                sdf_atlas=to_banded(ms.sdf_atlas, idx_sdf),
                color_atlas=to_banded(ms.color_atlas, idx_col),
                decoder=ms.decoder),
            out_shardings=MapState(
                sdf_atlas=self.banded_sharding,
                color_atlas=self.banded_sharding,
                decoder=self.replicated))
        self._unshard = jax.jit(
            lambda ms: MapState(
                sdf_atlas=ms.sdf_atlas[inv_sdf],
                color_atlas=ms.color_atlas[inv_col],
                decoder=ms.decoder),
            out_shardings=self.replicated)

    # -- state conversion (device programs, no host round-trip) -----------

    def shard(self, ms: MapState) -> MapState:
        """Replicated MapState -> banded MapState on the mesh."""
        return self._shard(ms)

    def unshard(self, banded: MapState) -> MapState:
        """Banded MapState -> replicated standard-layout MapState."""
        return self._unshard(banded)

    # -- renderer backend ---------------------------------------------------

    def queries_factory(self, ms: MapState,
                        need_color: bool = True) -> FieldQueries:
        """FieldQueries over a banded MapState (renderer.render_core
        backend).  Packs each atlas's halo-exchanged quads ONCE; every
        query in the surrounding program reuses them."""
        sdf_quad = self._pack_sdf(ms.sdf_atlas)
        color_quad = (self._pack_color(ms.color_atlas)
                      if need_color else None)
        if self.quad_dtype is not None:
            sdf_quad = sdf_quad.astype(self.quad_dtype)
            if color_quad is not None:
                color_quad = color_quad.astype(self.quad_dtype)
        sg = jax.lax.stop_gradient
        dec_ng = sg(ms.decoder)
        sdf_quad_ng = sg(sdf_quad)
        return FieldQueries(
            sdf=lambda p: decode_sdf_corners(
                ms.decoder, self._sample_sdf(sdf_quad, p), self._rm_sdf),
            rgb=(lambda p: decode_rgb_corners(
                ms.decoder, self._sample_color(color_quad, p),
                self._rm_color)) if need_color else None,
            sdf_ng=lambda p: decode_sdf_corners(
                dec_ng, self._sample_sdf(sdf_quad_ng, p), self._rm_sdf),
            beta=ms.decoder["beta"][0],
            beta_ng=dec_ng["beta"][0],
        )


def make_sharded_frame_mapper(cfg: dict, scene, cam, selector, w_max: int,
                              scratch_slot: int, smg: ShardedMapGeometry,
                              importance: bool = True,
                              packed: bool = False):
    """The fused frame mapper over a band-sharded map.

    Identical contract to engine/mapper.make_frame_mapper, with ``ms``
    and the returned map in BANDED layout (smg.shard / smg.unshard
    convert).  Supports the importance branch, so depth-hole datasets
    (ScanNet/TUM) band-shard too, and the packed (u8/u16) keyframe
    store, so ScanNet-scale sequences fit alongside the banded map.
    """
    from myslam_tpu.engine.mapper import make_frame_mapper

    return make_frame_mapper(
        cfg, scene, cam, selector, w_max, scratch_slot,
        importance=importance, queries_factory=smg.queries_factory,
        packed=packed)

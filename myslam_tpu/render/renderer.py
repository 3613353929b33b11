"""SDF-density volumetric ray renderer.

Functional re-design of the reference Renderer (src/utils/Renderer.py):
depth-guided sampling for rays with sensor depth, stratified + importance
(inverse-CDF) sampling for depth-less rays, SDF->alpha compositing.

Static-shape discipline: every ray in a batch is always rendered; rays the
reference would have boolean-filtered are instead masked in the loss layer.
The depth-less branch is computed for all rays and selected per-ray, and is
only enabled (statically) where the pipeline can see depth-less rays — the
tracker pre-masks them, so it renders with ``importance=False`` and skips
the extra coarse pass entirely.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from myslam_tpu.core.geometry import normalize_3d_coordinate, ray_aabb_exit_t
from myslam_tpu.core.sampling import (
    depth_guided_z_vals,
    sample_pdf,
    uniform_z_vals,
)
from myslam_tpu.models.decoders import decode_rgb_corners, decode_sdf_corners
from myslam_tpu.models.planes import MapState, PlaneLayout
from myslam_tpu.ops.composite import (
    composite,
    composite_topk,
    composite_weights,
    sdf2alpha,
)
from myslam_tpu.ops.plane_sample import (
    pack_quad,
    reduced_row_map,
    sample_fused,
    sample_quad_reduced,
)

_row_map_cache: dict = {}


def _row_map(layout: PlaneLayout):
    if layout not in _row_map_cache:
        _row_map_cache[layout] = np.asarray(reduced_row_map(layout))
    return _row_map_cache[layout]


@dataclass(frozen=True)
class SceneGeometry:
    """Static scene/rendering geometry shared by all render calls."""

    sdf_layout: PlaneLayout
    color_layout: PlaneLayout
    bound: tuple  # ((xmin, xmax), (ymin, ymax), (zmin, zmax))
    truncation: float
    n_stratified: int
    n_importance: int
    perturb: bool
    # Query the color field only at the color_topk highest-weight samples
    # per ray (0 = every sample, the reference's exact math).  The
    # compositing weights are sharply peaked at the SDF surface — the
    # depth-guided schedule places 8 of 40 samples there by construction
    # (reference src/utils/Renderer.py:90-105) — so the color sum is
    # dominated by a few samples, while the per-sample tri-plane row
    # gathers/scatters of the color atlas are the largest single cost of
    # a mapping iteration on TPU (row-transaction bound; see README).
    # Weight gradients still flow through ALL samples' SDF; only the RGB
    # query set is restricted.  Selection is by stop-gradient weight.
    color_topk: int = 0

    @property
    def bound_array(self) -> np.ndarray:
        # HOST (numpy) constant, deliberately: closures capture this in
        # every jitted program, and a jax.Array constant is fetched
        # device->host during MLIR lowering (array._value inside
        # ir_constant).  Through the remote-TPU tunnel one such fetch
        # has been measured at 300+ s in degraded link states — it was
        # the entire frame-0 "compile" mystery (round 2's 414 s).  A
        # numpy constant embeds its bytes directly.
        # tests/test_lowering_consts.py guards the whole program set.
        return np.asarray(self.bound, dtype=np.float32)

    @property
    def n_samples(self) -> int:
        return self.n_stratified + self.n_importance


class FieldQueries:
    """Query closures bound to ONE map representation.

    ``render_core`` consumes this instead of a MapState so the same
    rendering math drives every backend: the replicated quad-atlas path
    (make_queries) and the band-sharded atlas path
    (parallel/sharded_engine.py).  All closures take normalized points
    (N, 3) in [-1, 1]; the *_ng variants are stop-gradient-bound for the
    no-grad coarse importance pass.
    """

    __slots__ = ("sdf", "rgb", "sdf_ng", "beta", "beta_ng")

    def __init__(self, sdf, rgb, sdf_ng, beta, beta_ng):
        self.sdf = sdf
        self.rgb = rgb
        self.sdf_ng = sdf_ng
        self.beta = beta
        self.beta_ng = beta_ng


def make_queries(ms: MapState, scene: SceneGeometry,
                 sdf_quad=None, color_quad=None,
                 need_color: bool = True,
                 jvp_safe: bool = False,
                 quad_dtype=None) -> FieldQueries:
    """FieldQueries over packed quad atlases (packs here if not given).

    ``jvp_safe`` samples through the plain differentiable path instead of
    the hand-VJP kernel — for forward-mode consumers (custom_vjp forbids
    jvp); everything in-repo uses reverse mode.  Same forward math.

    ``quad_dtype`` (e.g. jnp.bfloat16) casts quads packed HERE before
    sampling — read-precision reduction between the f32 master atlases
    and the gather (mapping.map_bf16); loss math stays f32
    (plane_sample weights in f32 regardless of atlas dtype).
    """
    if sdf_quad is None:
        sdf_quad = pack_quad(ms.sdf_atlas, scene.sdf_layout)
        if quad_dtype is not None:
            sdf_quad = sdf_quad.astype(quad_dtype)
    if need_color and color_quad is None:
        color_quad = pack_quad(ms.color_atlas, scene.color_layout)
        if quad_dtype is not None:
            color_quad = color_quad.astype(quad_dtype)
    rm_sdf = _row_map(scene.sdf_layout)
    rm_color = _row_map(scene.color_layout)
    sample = sample_quad_reduced if jvp_safe else sample_fused
    sg = jax.lax.stop_gradient
    dec_ng = sg(ms.decoder)
    sdf_quad_ng = sg(sdf_quad)
    return FieldQueries(
        sdf=lambda p: decode_sdf_corners(
            ms.decoder, sample(sdf_quad, scene.sdf_layout, p), rm_sdf),
        rgb=(lambda p: decode_rgb_corners(
            ms.decoder, sample(color_quad, scene.color_layout, p),
            rm_color)) if need_color else None,
        sdf_ng=lambda p: decode_sdf_corners(
            dec_ng, sample(sdf_quad_ng, scene.sdf_layout, p), rm_sdf),
        beta=ms.decoder["beta"][0],
        beta_ng=dec_ng["beta"][0],
    )


def build_z_vals_core(
    key: jax.Array,
    scene: SceneGeometry,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    gt_depth: jnp.ndarray,
    importance: bool,
    q: FieldQueries,
) -> jnp.ndarray:
    """Per-ray sample depths, (R, n_stratified + n_importance).

    Depth-valid rays get the depth-guided schedule; when ``importance`` is
    statically on, depth-less rays instead get stratified-to-bbox-exit plus
    inverse-CDF importance samples from a no-grad coarse SDF pass
    (reference src/utils/Renderer.py:85-134).
    """
    k_surf, k_uni, k_pdf = jax.random.split(key, 3)
    z_depth = depth_guided_z_vals(
        k_surf, gt_depth, scene.truncation, scene.n_stratified,
        scene.n_importance, scene.perturb,
    )
    if not importance:
        return z_depth

    rays_o_ng = jax.lax.stop_gradient(rays_o)
    rays_d_ng = jax.lax.stop_gradient(rays_d)
    far = ray_aabb_exit_t(rays_o_ng, rays_d_ng, scene.bound_array) + 0.01
    z_uni = uniform_z_vals(k_uni, far, scene.n_stratified, scene.perturb)
    pts_uni = rays_o_ng[:, None, :] + rays_d_ng[:, None, :] * z_uni[..., None]
    p_nor = normalize_3d_coordinate(
        pts_uni.reshape(-1, 3), scene.bound_array
    )
    sdf_uni = q.sdf_ng(p_nor).reshape(z_uni.shape)
    alpha_uni = sdf2alpha(sdf_uni, q.beta_ng)
    w_uni = composite_weights(alpha_uni)
    z_mid = 0.5 * (z_uni[..., 1:] + z_uni[..., :-1])
    z_samples = sample_pdf(
        k_pdf, z_mid, w_uni[..., 1:-1], scene.n_importance
    )
    z_nodepth = jnp.sort(
        jnp.concatenate([z_uni, z_samples], axis=-1), axis=-1
    )
    return jnp.where((gt_depth > 0)[:, None], z_depth, z_nodepth)


def render_core(
    key: jax.Array,
    scene: SceneGeometry,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    gt_depth: jnp.ndarray,
    importance: bool,
    q: FieldQueries,
):
    """Render a ray batch against arbitrary field queries.

    Returns (depth (R,), color (R, 3), sdf (R, N), z_vals (R, N)) — the
    reference's render_batch_ray contract (src/utils/Renderer.py:63-147).
    """
    z_vals = build_z_vals_core(key, scene, rays_o, rays_d, gt_depth,
                               importance, q)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    p_nor = normalize_3d_coordinate(pts.reshape(-1, 3), scene.bound_array)
    sdf = q.sdf(p_nor).reshape(z_vals.shape)
    alpha = sdf2alpha(sdf, q.beta)
    K = int(scene.color_topk)
    if K and K < scene.n_samples:
        # Top-K color path (see SceneGeometry.color_topk; shared helper
        # in ops/composite.py): weights from the full SDF; RGB queried
        # only at the K highest-weight samples.
        depth, color = composite_topk(
            alpha, z_vals, pts,
            lambda p: q.rgb(normalize_3d_coordinate(p, scene.bound_array)),
            K)
        return depth, color, sdf, z_vals
    rgb = q.rgb(p_nor).reshape(z_vals.shape + (3,))
    depth, color, _ = composite(alpha, z_vals, rgb)
    return depth, color, sdf, z_vals


def query_sdf(ms: MapState, scene: SceneGeometry, p_nor: jnp.ndarray,
              sdf_quad: jnp.ndarray | None = None):
    """Raw SDF at normalized points (reference src/networks/decoders.py:87).

    ``sdf_quad``: optional pre-packed quad atlas (pack once per program).
    The plane-feature reduction is folded into the decoder's first layer
    (see decode_sdf_corners).
    """
    if sdf_quad is None:
        sdf_quad = pack_quad(ms.sdf_atlas, scene.sdf_layout)
    corners = sample_fused(sdf_quad, scene.sdf_layout, p_nor)
    return decode_sdf_corners(ms.decoder, corners, _row_map(scene.sdf_layout))


def query_rgb(ms: MapState, scene: SceneGeometry, p_nor: jnp.ndarray,
              color_quad: jnp.ndarray | None = None):
    """Raw RGB at normalized points (reference src/networks/decoders.py:107)."""
    if color_quad is None:
        color_quad = pack_quad(ms.color_atlas, scene.color_layout)
    corners = sample_fused(color_quad, scene.color_layout, p_nor)
    return decode_rgb_corners(
        ms.decoder, corners, _row_map(scene.color_layout))


def query_raw(ms: MapState, scene: SceneGeometry, pts: jnp.ndarray,
              sdf_quad=None, color_quad=None):
    """World points (..., 3) -> (..., 4) [rgb, sdf].

    Reference src/networks/decoders.py:127-146.
    """
    shape = pts.shape
    p_nor = normalize_3d_coordinate(pts.reshape(-1, 3), scene.bound_array)
    sdf = query_sdf(ms, scene, p_nor, sdf_quad)
    rgb = query_rgb(ms, scene, p_nor, color_quad)
    return jnp.concatenate([rgb, sdf[:, None]], axis=-1).reshape(
        shape[:-1] + (4,)
    )


def build_z_vals(
    key: jax.Array,
    ms: MapState,
    scene: SceneGeometry,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    gt_depth: jnp.ndarray,
    importance: bool,
    sdf_quad=None,
) -> jnp.ndarray:
    """build_z_vals_core over the quad-atlas backend (packs if needed)."""
    q = make_queries(ms, scene, sdf_quad=sdf_quad, need_color=False)
    return build_z_vals_core(
        key, scene, rays_o, rays_d, gt_depth, importance, q)


def render_rays(
    key: jax.Array,
    ms: MapState,
    scene: SceneGeometry,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    gt_depth: jnp.ndarray,
    importance: bool,
    sdf_quad=None,
    color_quad=None,
):
    """Render a batch of rays against a MapState.

    Returns (depth (R,), color (R, 3), sdf (R, N), z_vals (R, N)) —
    the reference's render_batch_ray contract (src/utils/Renderer.py:63-147).

    ``sdf_quad``/``color_quad``: optional pre-packed quad atlases — pass
    them when the map is frozen across many render calls (tracking) so the
    pack runs once instead of per call.
    """
    q = make_queries(ms, scene, sdf_quad=sdf_quad, color_quad=color_quad)
    return render_core(key, scene, rays_o, rays_d, gt_depth, importance, q)


def make_image_renderer(scene: SceneGeometry, cam, ray_batch_size: int = 40960):
    """Full-image no-grad renderer (reference render_img,
    src/utils/Renderer.py:155-203): rays rendered in fixed-size chunks.

    Returns render_img(ms, c2w, gt_depth, key) -> (depth (H,W), color
    (H,W,3)).
    """
    from myslam_tpu.core.geometry import rays_full_image

    n_px = cam.H * cam.W
    n_chunks = -(-n_px // ray_batch_size)
    pad = n_chunks * ray_batch_size - n_px

    @jax.jit
    def render_img(ms, c2w, gt_depth, key):
        rays_o, rays_d = rays_full_image(
            cam.H, cam.W, cam.fx, cam.fy, cam.cx, cam.cy, c2w)
        rays_o = jnp.concatenate(
            [rays_o.reshape(-1, 3), jnp.zeros((pad, 3))], axis=0)
        rays_d = jnp.concatenate(
            [rays_d.reshape(-1, 3), jnp.ones((pad, 3))], axis=0)
        depth_flat = jnp.concatenate(
            [gt_depth.reshape(-1), jnp.zeros((pad,))], axis=0)

        sdf_quad = pack_quad(ms.sdf_atlas, scene.sdf_layout)
        color_quad = pack_quad(ms.color_atlas, scene.color_layout)

        def chunk(carry, ins):
            ro, rd, d, k = ins
            z = build_z_vals(k, ms, scene, ro, rd, d, importance=True,
                             sdf_quad=sdf_quad)
            pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
            raw = query_raw(ms, scene, pts, sdf_quad, color_quad)
            alpha = sdf2alpha(raw[..., -1], ms.decoder["beta"][0])
            dep, col, _ = composite(alpha, z, raw[..., :3])
            return carry, (dep, col)

        keys = jax.random.split(key, n_chunks)
        _, (dep, col) = jax.lax.scan(
            chunk, 0,
            (rays_o.reshape(n_chunks, ray_batch_size, 3),
             rays_d.reshape(n_chunks, ray_batch_size, 3),
             depth_flat.reshape(n_chunks, ray_batch_size),
             keys))
        depth_img = dep.reshape(-1)[:n_px].reshape(cam.H, cam.W)
        color_img = col.reshape(-1, 3)[:n_px].reshape(cam.H, cam.W, 3)
        return depth_img, color_img

    return render_img

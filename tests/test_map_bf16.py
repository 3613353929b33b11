"""mapping.map_bf16 — bf16 quad-atlas reads in the mapping step.

The mapping forward's HBM traffic is dominated by quad-atlas row
gathers + the per-iteration pack_quad rewrite (PERF.md roofline).  With
``mapping.map_bf16: true`` the packed quads are cast to bfloat16 between
the f32 master atlases and the sampler — same trick tracking defaults
to (tracker.py map_bf16) — halving that traffic while the loss math,
Adam state, and master atlases stay f32.

bf16 mantissa rounding (2^-8 relative on the read features and one
rounding of the quad gradient) makes the optimization trajectory
diverge from f32 bit-wise, so the contract is statistical, not parity:
same-scale decreasing losses, close first-iteration loss (identical
params, only read precision differs), and live (different-bits) output.
"""

import copy
import os

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

from myslam_tpu.engine.camera import Camera
from myslam_tpu.engine.mapper import make_mapper
from myslam_tpu.engine.scheduler import compute_bound
from myslam_tpu.models.decoders import init_decoder_params
from myslam_tpu.models.planes import init_map_state, make_layout
from myslam_tpu.render.renderer import SceneGeometry
from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _setup():
    cfg = load_config(
        os.path.join(REPO, "configs", "Synthetic", "room_smoke.yaml"),
        DEFAULT_CONFIG)
    cfg = copy.deepcopy(cfg)
    # room.yaml (inherited) opts into map_bf16 since r5 — the reference
    # lane here must be genuine f32 or the A/B is vacuous.
    cfg["mapping"]["map_bf16"] = False
    cfg["mapping"]["pixels"] = 64
    cfg["rendering"].update(n_stratified=8, n_importance=4, perturb=False)
    cam = Camera.from_cfg(cfg)
    bound = compute_bound(cfg)
    layout = make_layout(bound, [0.48, 0.24], 8)
    scene = SceneGeometry(
        layout, layout, tuple(map(tuple, bound.tolist())),
        0.06, 8, 4, False)
    key = jax.random.PRNGKey(0)
    ms0 = init_map_state(key, layout, layout,
                         init_decoder_params(key, c_dim=8))
    center = bound.mean(axis=1)
    poses = jnp.zeros((4, 7)).at[:, 0].set(1.0).at[:, 4:].set(
        jnp.asarray(center))
    pose_mask = jnp.array([0.0, 1.0, 1.0, 0.0])
    slot_kf = jnp.array([0, 1, 2, 0], jnp.int32)
    kf_colors = jnp.full((4, cam.H, cam.W, 3), 0.5, jnp.float16)
    kf_depths = jnp.ones((4, cam.H, cam.W), jnp.float32)
    return cfg, cam, scene, ms0, (poses, pose_mask, slot_kf, kf_colors,
                                  kf_depths, key)


def test_map_bf16_statistical_parity():
    cfg, cam, scene, ms0, (poses, pose_mask, slot_kf, kc, kd, key) = _setup()

    ref = make_mapper(cfg, scene, cam)
    _, p1, l1 = ref(jtu.tree_map(jnp.copy, ms0), poses, pose_mask,
                    slot_kf, jnp.int32(3), kc, kd, key,
                    iters=8, lr_factor=1.0)

    cfg_b = copy.deepcopy(cfg)
    cfg_b["mapping"]["map_bf16"] = True
    bf = make_mapper(cfg_b, scene, cam)
    ms_b, p2, l2 = bf(jtu.tree_map(jnp.copy, ms0), poses, pose_mask,
                      slot_kf, jnp.int32(3), kc, kd, key,
                      iters=8, lr_factor=1.0)

    l1 = np.asarray(l1)
    l2 = np.asarray(l2)
    assert np.isfinite(l2).all()
    # Identical params at iteration 0 — only the read precision differs.
    np.testing.assert_allclose(l2[0], l1[0], rtol=5e-3)
    # Same-scale convergence over the window.
    assert l2[-1] < l2[0]
    assert abs(l2[-1] - l1[-1]) / abs(l1[-1]) < 0.2
    # Joint-opt poses drift with the read precision (measured ~2e-3
    # after 8 iters on this degenerate toy); the real accuracy gate is
    # the full-run ATE A/B in PERF.md.
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), atol=1e-2)
    # The flag is LIVE: bf16 reads must change bits vs the f32 path.
    assert not np.array_equal(l2, l1)
    # Master atlases stay f32 (the cast is read-side only).
    assert ms_b.sdf_atlas.dtype == jnp.float32
    assert ms_b.color_atlas.dtype == jnp.float32


def test_map_bf16_kf_sharded_path():
    """map_bf16 also covers the kf-partitioned BA backend
    (parallel/distributed_ba.py _pack / make_queries quad_dtype):
    finite decreasing losses and cross-shard replication hold with
    bf16 reads."""
    import pytest
    from jax.sharding import Mesh

    from myslam_tpu.parallel.distributed_ba import (
        make_distributed_ba,
        shard_keyframes,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg, cam, scene, ms0, (poses, pose_mask, slot_kf, kc, kd, key) = _setup()
    cfg = copy.deepcopy(cfg)
    cfg["mapping"]["map_bf16"] = True
    mesh = Mesh(np.array(jax.devices()[:4]), ("kf",))
    kf_c, kf_d = shard_keyframes(mesh, kc, kd.astype(jnp.float32))
    ba = make_distributed_ba(cfg, scene, cam, mesh, iters=6,
                             pose_solver="adam")
    ms2, poses_out, losses = ba(
        jtu.tree_map(jnp.copy, ms0), poses, pose_mask, slot_kf,
        jnp.int32(3), kf_c, kf_d, key)
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    for arr in (ms2.sdf_atlas, ms2.color_atlas, poses_out):
        shards = [np.asarray(s.data) for s in arr.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)

"""Map-block sharded sampling == replicated sampling (values and grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from myslam_tpu.models.planes import make_layout
from myslam_tpu.ops.plane_sample import pack_quad, sample_quad_reduced
from myslam_tpu.parallel.plane_shard import (
    ShardedPlaneLayout,
    make_sharded_sampler,
)

BOUND = [[-1.9, 7.94], [-2.2, 4.52], [-2.5, 2.54]]
C_DIM = 8
N_SHARDS = 4


@pytest.fixture
def setup():
    layout = make_layout(jnp.asarray(BOUND), [0.24, 0.06], C_DIM)
    rng = np.random.default_rng(0)
    atlas = rng.normal(size=(layout.total_rows, C_DIM)).astype(np.float32)
    p_nor = rng.uniform(-1.1, 1.1, size=(256, 3)).astype(np.float32)
    slayout = ShardedPlaneLayout(layout, N_SHARDS)
    mesh = Mesh(np.array(jax.devices()[:N_SHARDS]), ("map",))
    return layout, slayout, mesh, atlas, p_nor


def test_shard_roundtrip(setup):
    layout, slayout, mesh, atlas, _ = setup
    sharded = slayout.shard_atlas(jnp.asarray(atlas))
    back = slayout.unshard_atlas(sharded)
    np.testing.assert_array_equal(back, atlas)


def test_sharded_sampling_matches(setup):
    layout, slayout, mesh, atlas, p_nor = setup
    quad = pack_quad(jnp.asarray(atlas), layout)
    ref = np.asarray(sample_quad_reduced(quad, layout, jnp.asarray(p_nor)))

    sharded = jax.device_put(
        slayout.shard_atlas(jnp.asarray(atlas)),
        NamedSharding(mesh, P("map", None)))
    sample = jax.jit(make_sharded_sampler(mesh, "map", slayout))
    ours = np.asarray(sample(sharded, jnp.asarray(p_nor)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_sharded_gradients_match(setup):
    layout, slayout, mesh, atlas, p_nor = setup
    rng = np.random.default_rng(7)
    gbar = rng.normal(
        size=(len(p_nor), layout.n_levels * 4 * C_DIM)).astype(np.float32)

    # reference grads (through pack_quad so both sides are in ATLAS space)
    def ref_loss(a, p):
        q = pack_quad(a, layout)
        return jnp.sum(sample_quad_reduced(q, layout, p) * gbar)

    ga_ref, gp_ref = jax.grad(ref_loss, argnums=(0, 1))(
        jnp.asarray(atlas), jnp.asarray(p_nor))

    sample = make_sharded_sampler(mesh, "map", slayout)

    def loss(local, p):
        return jnp.sum(sample(local, p) * gbar)

    sharded = jax.device_put(
        slayout.shard_atlas(jnp.asarray(atlas)),
        NamedSharding(mesh, P("map", None)))
    ga_sh, gp_sh = jax.jit(jax.grad(loss, argnums=(0, 1)))(
        sharded, jnp.asarray(p_nor))

    np.testing.assert_allclose(
        np.asarray(gp_sh), np.asarray(gp_ref), atol=1e-4, rtol=1e-4)
    ga_sh_atlas = slayout.unshard_atlas(np.asarray(ga_sh))
    np.testing.assert_allclose(
        ga_sh_atlas, np.asarray(ga_ref), atol=1e-4, rtol=1e-4)


def test_sharded_mapper_matches_single_shard():
    """A full sharded-map BA step on a 4-device mesh reproduces the
    1-device (degenerate sharding) run: same pixels, same losses.

    Drives the PRODUCT composition (engine/mapper.make_mapper over the
    ShardedMapGeometry banded backend — the same pairing the scheduler's
    parallel.map_shards mode uses) rather than a separate library-level
    implementation."""
    from myslam_tpu.engine.camera import Camera
    from myslam_tpu.engine.mapper import make_mapper
    from myslam_tpu.models.decoders import init_decoder_params
    from myslam_tpu.models.planes import init_map_state
    from myslam_tpu.parallel.sharded_engine import ShardedMapGeometry
    from myslam_tpu.render.renderer import SceneGeometry
    from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config
    import copy, os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(repo, "configs", "Synthetic",
                                   "room_smoke.yaml"), DEFAULT_CONFIG)
    cfg = copy.deepcopy(cfg)
    cfg["mapping"]["pixels"] = 128
    cam = Camera(H=40, W=56, fx=30.0, fy=30.0, cx=27.5, cy=19.5)
    bound = np.asarray(BOUND, np.float32)
    layout_s = make_layout(jnp.asarray(bound), [0.48, 0.24], C_DIM)
    layout_c = make_layout(jnp.asarray(bound), [0.48, 0.24], C_DIM)
    scene = SceneGeometry(layout_s, layout_c,
                          tuple(map(tuple, bound.tolist())),
                          0.12, 8, 4, True)
    key = jax.random.PRNGKey(3)
    ms = init_map_state(key, layout_s, layout_c,
                        init_decoder_params(key, c_dim=C_DIM))

    w_max = 3
    center = bound.mean(axis=1)
    poses = jnp.zeros((w_max, 7)).at[:, 0].set(1.0).at[:, 4:].set(
        jnp.asarray(center))
    pose_mask = jnp.array([0.0, 1.0, 0.0])
    slot_kf = jnp.array([0, 1, 0], jnp.int32)
    kf_colors = jnp.full((3, cam.H, cam.W, 3), 0.5, jnp.float16)
    kf_depths = jnp.full((3, cam.H, cam.W), 1.2, jnp.float32)
    args = (poses, pose_mask, slot_kf, jnp.int32(2), kf_colors, kf_depths,
            jax.random.PRNGKey(7))

    out = {}
    for n in (1, 4):
        mesh = Mesh(np.array(jax.devices()[:n]), ("map",))
        smg = ShardedMapGeometry(mesh, scene)
        step = make_mapper(cfg, scene, cam,
                           queries_factory=smg.queries_factory)
        banded = smg.shard(ms)
        banded, poses_out, losses = step(
            banded, *args, iters=3, lr_factor=1.0)
        ms_out = smg.unshard(banded)
        out[n] = (np.asarray(losses), np.asarray(ms_out.sdf_atlas),
                  np.asarray(poses_out))
    np.testing.assert_allclose(out[1][0], out[4][0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(out[1][1], out[4][1], rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(out[1][2], out[4][2], rtol=1e-4, atol=1e-5)
    assert np.isfinite(out[4][0]).all()

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

"""No jitted program may close over a jax.Array constant.

A device-array constant embedded in a program is fetched DEVICE->HOST
during MLIR lowering (jax ir_constant -> array._value).  Through the
remote-TPU tunnel one such fetch has been measured at 300+ s in degraded
link states — a 24-byte closure constant (SceneGeometry.bound_array) was
the entire frame-0 "compile time" mystery of rounds 1-2 (414 s cold).
Constants must be host numpy arrays, whose bytes lower directly.

This traces every heavy program the scheduler dispatches and asserts
its jaxpr's consts contain no jax.Array.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from myslam_tpu.utils.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cfg():
    cfg = load_config(
        os.path.join(REPO, "configs", "Synthetic", "room_smoke.yaml"),
        os.path.join(REPO, "configs", "myslam.yaml"))
    cfg["data"]["n_frames"] = 3
    return cfg


def _assert_host_consts(traced, label):
    consts = traced.jaxpr.consts
    bad = [(type(c).__name__, getattr(c, "shape", None))
           for c in consts if isinstance(c, jax.Array)]
    assert not bad, f"{label}: device-array closure constants {bad}"


def _scene(cfg):
    from myslam_tpu.engine.camera import Camera
    from myslam_tpu.engine.scheduler import compute_bound
    from myslam_tpu.models.decoders import init_decoder_params
    from myslam_tpu.models.planes import init_map_state, make_layout
    from myslam_tpu.render.renderer import SceneGeometry

    cam = Camera.from_cfg(cfg)
    bound = compute_bound(cfg)
    sdf_layout = make_layout(bound, [0.24, 0.06], 32)
    color_layout = make_layout(bound, [0.24, 0.03], 32)
    scene = SceneGeometry(
        sdf_layout, color_layout, tuple(map(tuple, bound.tolist())),
        0.06, 32, 8, True, color_topk=12)
    key = jax.random.PRNGKey(0)
    ms = init_map_state(key, sdf_layout, color_layout,
                        init_decoder_params(key))
    return cam, scene, ms, key


def test_tracker_programs_have_host_consts():
    from myslam_tpu.engine.tracker import make_group_tracker, make_tracker

    cfg = _cfg()
    cam, scene, ms, key = _scene(cfg)
    t = cfg["tracking"]
    it_n, n_px = int(t["iters"]), int(t["pixels"])
    pose = jnp.asarray([1.0, 0, 0, 0, 1, 1, 1])
    px = (jnp.zeros((it_n, n_px)), jnp.zeros((it_n, n_px)),
          jnp.zeros((it_n, n_px, 3), jnp.uint8), jnp.ones((it_n, n_px)))
    tracker = make_tracker(cfg, scene, cam)
    _assert_host_consts(tracker.trace(ms, pose, *px, key), "tracker")

    G = 4
    gt = make_group_tracker(cfg, scene, cam, G)
    est = jnp.zeros((8, 4, 4))
    gpx = tuple(jnp.stack([p] * G) for p in px)
    _assert_host_consts(
        gt.trace(ms, est, jnp.int32(1), *gpx, key), "group_tracker")


def test_mapper_chunk_has_host_consts():
    from myslam_tpu.engine.mapper import make_mapper

    cfg = _cfg()
    cam, scene, ms, key = _scene(cfg)
    W = 4
    poses = jnp.zeros((W, 7)).at[:, 0].set(1.0)
    mapper = make_mapper(cfg, scene, cam, importance=True)
    params = {"map": ms, "poses": poses}
    opt = jax.eval_shape(mapper.jit_init, params)
    opt = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), opt)
    traced = mapper.jit_chunk.trace(
        params, opt, jnp.ones((W,)), jnp.arange(W, dtype=jnp.int32),
        jnp.int32(W), jnp.zeros((W, cam.H, cam.W, 3), jnp.float16),
        jnp.ones((W, cam.H, cam.W)), key, jnp.int32(0),
        jnp.float32(1.0), jnp.int32(15), chunk=15)
    _assert_host_consts(traced, "mapper.jit_chunk")


def test_sharded_engine_conversions_have_host_consts():
    from jax.sharding import Mesh
    from myslam_tpu.parallel.sharded_engine import ShardedMapGeometry

    cfg = _cfg()
    cam, scene, ms, key = _scene(cfg)
    mesh = Mesh(np.array(jax.devices()[:1]), ("map",))
    smg = ShardedMapGeometry(mesh, scene)
    _assert_host_consts(smg._shard.trace(ms), "smg.shard")
    banded = smg.shard(ms)
    _assert_host_consts(smg._unshard.trace(banded), "smg.unshard")

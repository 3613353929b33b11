"""Multi-device ray data-parallelism: parity with the single-device path.

Runs on the 8-way virtual CPU mesh from conftest.  The sharded programs
must produce the same optimization trajectory as the unsharded ones up to
reduction-order float noise (psum over shards reorders the gradient sums).
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config


def _smoke_cfg(n_devices: int):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(repo, "configs", "Synthetic", "room_smoke.yaml"),
        os.path.join(repo, "configs", "myslam.yaml"))
    cfg["data"]["n_frames"] = 6
    cfg["mapping"]["iters_first"] = 20
    cfg["mapping"]["iters"] = 5
    # f32 reads pinned: these are strict sharded-vs-replicated parity
    # tests; bf16 read rounding (room.yaml opts in since r5) is the
    # same magnitude as the asserted reduction-order bounds.
    cfg["mapping"]["map_bf16"] = False
    cfg["parallel"]["devices"] = n_devices
    return cfg


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_matches_single_device(tmp_path):
    """8-way ray DP under the spmd impl (with the ZeRO-style row-sharded
    optimizer state, parallel.zero_opt) reproduces the single-device
    trajectory — same draws, the reduce-scatter/all-gather exchange is
    mathematically identical to all-reduce + replicated update."""
    from myslam_tpu.engine.scheduler import SLAMSystem

    est = {}
    for n_dev in (1, 8):
        cfg = _smoke_cfg(n_dev)
        cfg["parallel"]["dp_impl"] = "spmd"
        assert cfg["parallel"].get("zero_opt", True)
        slam = SLAMSystem(cfg,
                          output=str(tmp_path / f"dp{n_dev}"), seed=0)
        slam.run()
        est[n_dev] = slam.estimates.copy()

    # same pixel draws (host RNG) -> same math up to psum reduction order
    t_err = np.linalg.norm(
        est[1][:, :3, 3] - est[8][:, :3, 3], axis=-1)
    assert np.all(np.isfinite(est[8]))
    assert t_err.max() < 5e-3, t_err


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_shardmap_matches_single_device(tmp_path):
    """8-way ray DP under the DEFAULT shardmap impl (explicit psum of
    the gradient pytree once per iteration — tools/validate_scaling.py
    shows exactly the modeled wire volume).  The per-ray z-perturbation
    draw depends on the local batch shape, so the trajectory is
    statistically (not draw-for-draw) equivalent to serial: assert
    closeness to the single-device run and a sane absolute error."""
    from myslam_tpu.engine.scheduler import SLAMSystem

    est = {}
    gt = {}
    for n_dev in (1, 8):
        cfg = _smoke_cfg(n_dev)
        assert str(cfg["parallel"].get(
            "dp_impl", "shardmap")).lower() == "shardmap"
        slam = SLAMSystem(cfg,
                          output=str(tmp_path / f"sm{n_dev}"), seed=0)
        slam.run()
        est[n_dev] = slam.estimates.copy()
        gt[n_dev] = slam.gt_poses.copy()

    assert np.all(np.isfinite(est[8]))
    d = np.linalg.norm(est[1][:, :3, 3] - est[8][:, :3, 3], axis=-1)
    assert d.max() < 3e-2, d
    # the under-trained smoke schedule drifts a few cm from GT for the
    # serial run too — the gate is closeness to serial (above) plus a
    # no-worse-than-serial sanity margin here
    err8 = np.linalg.norm(est[8][1:, :3, 3] - gt[8][1:, :3, 3], axis=-1)
    err1 = np.linalg.norm(est[1][1:, :3, 3] - gt[8][1:, :3, 3], axis=-1)
    assert err8.max() < err1.max() + 0.03, (err8.max(), err1.max())


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_map_shard_run_matches_single_device(tmp_path):
    """Full product run with parallel.map_shards=4: the band-sharded
    mapper drives the SAME trajectory as the replicated run (VERDICT r1
    item 1 — sharding as a product feature, reachable from config)."""
    from myslam_tpu.engine.scheduler import SLAMSystem

    est = {}
    final = {}
    for shards in (1, 4):
        cfg = _smoke_cfg(1)
        cfg["parallel"]["map_shards"] = shards
        slam = SLAMSystem(cfg, output=str(tmp_path / f"ms{shards}"), seed=0)
        slam.run()
        est[shards] = slam.estimates.copy()
        final[shards] = np.asarray(slam.map_state.sdf_atlas)

    t_err = np.linalg.norm(est[1][:, :3, 3] - est[4][:, :3, 3], axis=-1)
    assert np.all(np.isfinite(est[4]))
    assert t_err.max() < 5e-3, t_err
    # The sharded map converged to the replicated one.  Gate on the
    # bulk (q99) plus an outlier-fraction cap, NOT the extreme tail: a
    # handful of borderline rays flip their AABB/outlier masks under
    # the shards' different float-reduction order, and those few cells'
    # updates then diverge over the full run (measured on one host:
    # q99 1.5e-3, 0.26% of cells > 5e-3, max 4.7e-2 — while the
    # trajectory agrees to 1.6e-4).  A q999 gate is machine-dependent.
    d = np.abs(final[1] - final[4])
    assert np.quantile(d, 0.99) < 5e-3, np.quantile(d, 0.99)
    assert (d > 5e-3).mean() < 0.01, (d > 5e-3).mean()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_kf_shard_run_converges(tmp_path):
    """Full product run with parallel.kf_shards=4: keyframe-partitioned
    BA drives the SLAM loop end-to-end.  The kf ray allocation is a
    different (equally valid) stochastic BA, so the gate is convergence
    — the tracked trajectory stays near GT — not bitwise parity."""
    from myslam_tpu.engine.scheduler import SLAMSystem

    est = {}
    for mode in ("base", "kf"):
        cfg = _smoke_cfg(1)
        if mode == "kf":
            cfg["parallel"]["kf_shards"] = 4
        slam = SLAMSystem(cfg, output=str(tmp_path / mode), seed=0)
        if mode == "kf":
            assert slam.store.capacity % 4 == 0  # padded to the mesh
        slam.run()
        est[mode] = slam.estimates.copy()

    assert np.all(np.isfinite(est["kf"]))
    # The reduced smoke schedule under-trains the map, so both runs
    # drift vs GT identically; the kf trajectory must stay within a few
    # mm of the replicated one despite the different ray allocation.
    d = np.linalg.norm(
        est["kf"][:, :3, 3] - est["base"][:, :3, 3], axis=-1)
    assert d.max() < 0.01, d


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tracker_shards_over_mesh():
    """The sharded tracker compiles, runs, and psums to a replicated pose."""
    from myslam_tpu.engine.camera import Camera
    from myslam_tpu.engine.scheduler import SLAMSystem, compute_bound
    from myslam_tpu.utils.datasets import build_packet
    from myslam_tpu.core.quaternion import matrix_to_cam_pose

    cfg = _smoke_cfg(8)
    slam = SLAMSystem(cfg, output="/tmp/test_dp_tracker", seed=0)
    pkt = build_packet(slam.dataset, 1, iters=int(cfg["tracking"]["iters"]),
                       n_px=int(cfg["tracking"]["pixels"]),
                       ie_h=10, ie_w=10, need_full=False, seed=0)
    est0 = slam._est_dev.at[0].set(jnp.asarray(pkt.gt_c2w))
    est1, c2w, loss_first, loss_best, _ = slam.tracker(
        slam.map_state, est0, jnp.int32(1),
        jnp.asarray(pkt.px_i), jnp.asarray(pkt.px_j),
        jnp.asarray(pkt.px_color), jnp.asarray(pkt.px_depth),
        jax.random.PRNGKey(0))
    assert np.isfinite(float(loss_first)) and np.isfinite(float(loss_best))
    assert c2w.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(est1[1]), np.asarray(c2w))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_dp_shardmap_exact_without_perturb():
    """With the stratified z-jitter off (the only shape-dependent draw),
    the shardmap DP mapper is EXACTLY the single-device math: identical
    full-ray draw sliced per shard, psum'd masked means, one gradient
    psum.  Loss sequences must match to float-reduction noise."""
    import os

    import jax.tree_util as jtu
    from jax.sharding import Mesh

    from myslam_tpu.engine.camera import Camera
    from myslam_tpu.engine.mapper import make_mapper
    from myslam_tpu.engine.scheduler import compute_bound
    from myslam_tpu.models.decoders import init_decoder_params
    from myslam_tpu.models.planes import init_map_state, make_layout
    from myslam_tpu.render.renderer import SceneGeometry

    cfg = _smoke_cfg(1)
    cfg["mapping"]["pixels"] = 64
    cfg["rendering"].update(n_stratified=8, n_importance=4, perturb=False)
    cam = Camera.from_cfg(cfg)
    bound = compute_bound(cfg)
    sdf_layout = make_layout(bound, [0.48, 0.24], 8)
    color_layout = make_layout(bound, [0.48, 0.24], 8)
    scene = SceneGeometry(
        sdf_layout, color_layout, tuple(map(tuple, bound.tolist())),
        0.06, 8, 4, False)
    key = jax.random.PRNGKey(0)
    ms0 = init_map_state(key, sdf_layout, color_layout,
                         init_decoder_params(key, c_dim=8))
    center = bound.mean(axis=1)
    poses = jnp.zeros((4, 7)).at[:, 0].set(1.0).at[:, 4:].set(
        jnp.asarray(center))
    pose_mask = jnp.array([0.0, 1.0, 1.0, 0.0])
    slot_kf = jnp.array([0, 1, 2, 0], jnp.int32)
    kf_colors = jnp.full((4, cam.H, cam.W, 3), 0.5, jnp.float16)
    kf_depths = jnp.ones((4, cam.H, cam.W), jnp.float32)

    ref = make_mapper(cfg, scene, cam)
    _, p1, l1 = ref(jtu.tree_map(jnp.copy, ms0), poses, pose_mask,
                    slot_kf, jnp.int32(3), kf_colors, kf_depths, key,
                    iters=4, lr_factor=1.0)
    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
    dp = make_mapper(cfg, scene, cam, dp_mesh=mesh)
    _, p2, l2 = dp(jtu.tree_map(jnp.copy, ms0), poses, pose_mask,
                   slot_kf, jnp.int32(3), kf_colors, kf_depths, key,
                   iters=4, lr_factor=1.0)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)

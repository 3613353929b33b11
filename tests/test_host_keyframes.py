"""Keyframe store placement modes (reference configs/ESLAM.yaml:4).

``keyframe_device: cpu`` maps to the PACKED device store (u8/u16
quantized in HBM, dequantized per sampled pixel in-program) — the
TPU-native answer to the reference's memory motivation.  The true
host-side store survives as ``host_staged`` (host imagery behind a
device line-cache; only non-resident window slots upload).  Both must
reproduce the device-store trajectory: host_staged reads through the
SAME packed-gather math as 'cpu' so the two are draw-for-draw
identical, and both sit within color-quantization tolerance of the f16
device store (u8 direct vs the f16 round-trip differs ~5e-4 relative).
"""

import copy
import os

import jax
import jax.numpy as jnp
import numpy as np

from myslam_tpu.utils.config import load_config


def _cfg(n_frames=6):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(repo, "configs", "Synthetic", "room_smoke.yaml"),
        os.path.join(repo, "configs", "myslam.yaml"))
    cfg = copy.deepcopy(cfg)
    cfg["data"]["n_frames"] = n_frames
    cfg["mapping"]["iters_first"] = 20
    cfg["mapping"]["iters"] = 5
    return cfg


def _run(tmp_path, mode, extra=None):
    from myslam_tpu.engine.scheduler import SLAMSystem

    cfg = _cfg()
    cfg["keyframe_device"] = mode
    if extra:
        from myslam_tpu.utils.config import update_recursive
        update_recursive(cfg, extra)
    slam = SLAMSystem(cfg, output=str(tmp_path / mode.replace("/", "_")),
                      seed=0)
    slam._extract_and_cull_mesh = lambda *a, **k: None
    slam.run()
    return slam


def test_store_modes_match_device_store(tmp_path):
    runs = {m: _run(tmp_path, m)
            for m in ("device", "host_staged", "cpu")}

    dev = runs["device"].estimates[:, :3, 3]
    # host_staged reads through the same packed gather as "cpu":
    # draw-for-draw identical trajectories
    d = np.linalg.norm(runs["host_staged"].estimates[:, :3, 3]
                       - runs["cpu"].estimates[:, :3, 3], axis=-1)
    assert d.max() < 1e-5, d
    # packed stores vs f16 device store: u8 color read directly instead
    # of through f16 — same draws, color values differ at ~5e-4 relative
    for m in ("cpu", "host_staged"):
        d = np.linalg.norm(runs[m].estimates[:, :3, 3] - dev, axis=-1)
        assert d.max() < 5e-3, (m, d)

    n = runs["device"].store.count
    for m in ("host_staged", "cpu"):
        assert runs[m].store.count == n
        np.testing.assert_allclose(
            np.asarray(runs[m].store.est_c2w[:n]),
            np.asarray(runs["device"].store.est_c2w[:n]), atol=5e-3)


def test_host_cache_eviction_exact(tmp_path):
    """A minimum-size line-cache (window + scratch only, constant
    eviction/re-upload churn) must give the identical trajectory as a
    cache that never evicts — staging is a pure layout concern."""
    base = {"data": {"n_frames": 10},
            "mapping": {"mapping_window_size": 2, "keyframe_every": 1,
                        "every_frame": 2}}
    big = _run(tmp_path / "big", "host_staged", extra=base)
    small = _run(tmp_path / "small", "host_staged",
                 extra={**base, "mapping": {**base["mapping"],
                                            "host_cache_lines": 1}})
    assert small.store.cache_lines == small.w_max + 1  # clamped up
    np.testing.assert_array_equal(small.estimates, big.estimates)
    # the small cache evicted at least one keyframe's line (6 keyframes,
    # w_max usable lines); staging an evicted slot re-uploads the exact
    # host imagery
    st = small.store
    evicted = [s for s in range(st.count) if st.line_of_slot[s] < 0]
    assert evicted, "expected evictions with a minimum-size cache"
    before = st.cache_misses
    (ln,) = st.stage_lines([evicted[0]])
    assert st.cache_misses == before + 1
    np.testing.assert_array_equal(np.asarray(st.cache_colors[ln]),
                                  st.colors_u8[evicted[0]])
    np.testing.assert_array_equal(np.asarray(st.cache_depths[ln]),
                                  st.depths_u16[evicted[0]])


def test_host_cache_lru_unit():
    """LRU line-cache semantics in isolation: residency, eviction order,
    scratch binding, window pinning overflow."""
    from myslam_tpu.engine.camera import Camera
    from myslam_tpu.engine.keyframes import KeyframeStore

    cam = Camera(H=8, W=8, fx=4.0, fy=4.0, cx=3.5, cy=3.5)
    st = KeyframeStore(8, cam, device="host_staged")
    st.init_cache(4)  # 3 usable lines + scratch
    rng = np.random.default_rng(0)
    for s in range(5):
        st.add_host(s, rng.integers(0, 255, (8, 8, 3), np.uint8),
                    rng.integers(0, 1000, (8, 8), np.uint16),
                    1e-3 * (s + 1))

    l0 = st.stage_lines([0, 1, 2])          # fills the 3 usable lines
    assert st.cache_misses == 3
    same = st.stage_lines([0, 1, 2])        # all resident: no new misses
    np.testing.assert_array_equal(l0, same)
    assert st.cache_misses == 3

    (l3,) = st.stage_lines([3])             # evicts the LRU line
    assert st.cache_misses == 4
    assert st.slot_of_line[l3] == 3
    np.testing.assert_array_equal(np.asarray(st.cache_colors[l3]),
                                  st.colors_u8[3])
    np.testing.assert_allclose(np.asarray(st.cache_inv_q[l3]), 4e-3)

    # scratch bind: upload current imagery, admit, device-copy to a line
    cur_c = rng.integers(0, 255, (8, 8, 3), np.uint8)
    cur_d = rng.integers(0, 1000, (8, 8), np.uint16)
    sl = st.stage_scratch(cur_c, cur_d, 7e-3)
    assert sl == st.scratch_line
    pos = st.add_host(99, cur_c, cur_d, 7e-3)
    st.bind_scratch(pos)
    ln = st.line_of_slot[pos]
    assert ln >= 0 and ln != st.scratch_line
    np.testing.assert_array_equal(np.asarray(st.cache_colors[ln]), cur_c)
    np.testing.assert_allclose(np.asarray(st.cache_inv_q[ln]), 7e-3)

    # pinning more slots than usable lines must fail loudly
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="host_cache_lines"):
        st.stage_lines([0, 1, 2, 3])


def test_host_store_checkpoint_roundtrip(tmp_path):
    from myslam_tpu.engine.scheduler import SLAMSystem
    from myslam_tpu.utils.logger import load_checkpoint, save_checkpoint

    slam = _run(tmp_path / "a", "host_staged")
    path = save_checkpoint(str(tmp_path / "ck.npz"), slam, slam.n_img - 1)

    cfg = _cfg()
    cfg["keyframe_device"] = "host_staged"
    slam2 = SLAMSystem(cfg, output=str(tmp_path / "b"), seed=0)
    start = load_checkpoint(path, slam2)
    assert start == slam.n_img
    assert slam2.store.count == slam.store.count
    np.testing.assert_array_equal(slam2.store.colors_u8[:slam.store.count],
                                  slam.store.colors_u8[:slam.store.count])
    np.testing.assert_array_equal(slam2.store.depths_u16[:slam.store.count],
                                  slam.store.depths_u16[:slam.store.count])
    np.testing.assert_allclose(np.asarray(slam2.store.est_c2w),
                               np.asarray(slam.store.est_c2w), atol=1e-6)


def test_packed_store_checkpoint_roundtrip(tmp_path):
    from myslam_tpu.engine.scheduler import SLAMSystem
    from myslam_tpu.utils.logger import load_checkpoint, save_checkpoint

    slam = _run(tmp_path / "a", "cpu")
    assert slam.store.packed
    path = save_checkpoint(str(tmp_path / "ck.npz"), slam, slam.n_img - 1)

    cfg = _cfg()
    cfg["keyframe_device"] = "cpu"
    slam2 = SLAMSystem(cfg, output=str(tmp_path / "b"), seed=0)
    start = load_checkpoint(path, slam2)
    assert start == slam.n_img
    n = slam.store.count
    assert slam2.store.count == n
    np.testing.assert_array_equal(np.asarray(slam2.store.colors[:n]),
                                  np.asarray(slam.store.colors[:n]))
    np.testing.assert_array_equal(np.asarray(slam2.store.depths[0][:n]),
                                  np.asarray(slam.store.depths[0][:n]))
    np.testing.assert_allclose(np.asarray(slam2.store.depths[1][:n]),
                               np.asarray(slam.store.depths[1][:n]),
                               rtol=1e-6)


def test_scannet_scale_hbm_budget():
    """ScanNet scene0000 scale (~5.6k frames -> ~1.4k full-res keyframes
    at 480x640): fp16/fp32 device imagery needs > 4 GB of HBM; the packed
    store halves that to ~2.1 GB, and host_staged's device footprint is
    one w_max window — <2% of the float store."""
    H, W = 480, 640
    n_kf = 1400
    w_max = 22  # mapping_window_size 20 + last two/current slots
    frame_bytes = H * W * 3 * 2 + H * W * 4     # f16 color + f32 depth
    packed_bytes = H * W * 3 + H * W * 2        # u8 color + u16 depth
    device_mode = n_kf * frame_bytes
    window_bytes = w_max * packed_bytes
    assert device_mode > 4e9          # the problem is real (> 4 GB)
    assert n_kf * packed_bytes < 0.51 * device_mode
    assert n_kf * packed_bytes < 2.2e9  # packed fits 16 GB HBM comfortably
    assert window_bytes < 0.02 * device_mode
    assert window_bytes < 40e6        # the staged window is tens of MB

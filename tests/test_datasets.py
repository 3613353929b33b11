"""Dataset reader tests against fabricated on-disk mini-datasets."""

import os

import cv2
import numpy as np
import pytest

from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config
from myslam_tpu.utils.datasets import Replica, ScanNet, Synthetic, TUMRGBD

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_rgbd(color_path, depth_path, H=24, W=32, depth_scale=6553.5,
               depth_m=2.0, seed=0):
    rng = np.random.default_rng(seed)
    img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
    cv2.imwrite(color_path, img)
    depth = np.full((H, W), depth_m * depth_scale, np.uint16)
    cv2.imwrite(depth_path, depth)
    return img


def base_cfg(name, folder, depth_scale=6553.5, H=24, W=32):
    return {
        "dataset": name,
        "scale": 1,
        "cam": {"H": H, "W": W, "fx": 20.0, "fy": 20.0, "cx": 15.5,
                "cy": 11.5, "png_depth_scale": depth_scale, "crop_edge": 0},
        "data": {"input_folder": folder},
    }


def test_replica_reader(tmp_path):
    d = tmp_path / "replica"
    (d / "results").mkdir(parents=True)
    for i in range(3):
        write_rgbd(str(d / "results" / f"frame{i:06d}.jpg"),
                   str(d / "results" / f"depth{i:06d}.png"), seed=i)
    pose = np.eye(4)
    pose[:3, 3] = [1, 2, 3]
    with open(d / "traj.txt", "w") as f:
        for _ in range(3):
            f.write(" ".join(map(str, pose.reshape(-1))) + "\n")

    ds = Replica(base_cfg("replica", str(d)))
    assert len(ds) == 3
    color, depth, c2w = ds.get_frame(0)
    assert color.shape == (24, 32, 3) and color.dtype == np.float32
    assert 0.0 <= color.min() and color.max() <= 1.0
    np.testing.assert_allclose(depth, 2.0, atol=1e-3)
    # y/z columns negated (reference datasets.py:135-136)
    np.testing.assert_allclose(c2w[:3, 1], [0, -1, 0], atol=1e-6)
    np.testing.assert_allclose(c2w[:3, 2], [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(c2w[:3, 3], [1, 2, 3], atol=1e-6)


def test_scannet_reader_numeric_sort(tmp_path):
    d = tmp_path / "scan"
    for sub in ("color", "depth", "pose"):
        (d / sub).mkdir(parents=True)
    # files 0..11 — lexicographic sort would order 0,1,10,11,2,...
    for i in range(12):
        write_rgbd(str(d / "color" / f"{i}.jpg"),
                   str(d / "depth" / f"{i}.png"), depth_scale=1000.0,
                   depth_m=1.0 + i * 0.1, seed=i)
        pose = np.eye(4)
        pose[0, 3] = i
        np.savetxt(str(d / "pose" / f"{i}.txt"), pose)
    ds = ScanNet(base_cfg("scannet", str(d), depth_scale=1000.0))
    assert len(ds) == 12
    _, depth, c2w = ds.get_frame(10)
    np.testing.assert_allclose(depth.mean(), 2.0, atol=1e-2)
    assert c2w[0, 3] == 10  # numeric, not lexicographic, ordering


def test_tum_reader_association_and_rebase(tmp_path):
    d = tmp_path / "tum"
    (d / "rgb").mkdir(parents=True)
    (d / "depth").mkdir()
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(4):
        t = 100.0 + i * 0.5  # > 1/32 s apart so none are subsampled away
        write_rgbd(str(d / "rgb" / f"{t:.1f}.png"),
                   str(d / "depth" / f"{t:.1f}.png"), depth_scale=5000.0,
                   depth_m=1.5, seed=i)
        rgb_lines.append(f"{t:.4f} rgb/{t:.1f}.png")
        depth_lines.append(f"{t + 0.01:.4f} depth/{t:.1f}.png")
        gt_lines.append(
            f"{t + 0.02:.4f} {0.1 * i:.3f} 0.0 0.0 0.0 0.0 0.0 1.0")
    (d / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines) + "\n")
    (d / "depth.txt").write_text("# depth\n" + "\n".join(depth_lines) + "\n")
    (d / "groundtruth.txt").write_text(
        "# gt\n" + "\n".join(gt_lines) + "\n")

    cfg = base_cfg("tumrgbd", str(d), depth_scale=5000.0)
    ds = TUMRGBD(cfg)
    assert len(ds) == 4
    _, _, c2w0 = ds.get_frame(0)
    np.testing.assert_allclose(  # first pose rebased to identity + y/z flip
        c2w0, np.diag([1.0, -1.0, -1.0, 1.0]), atol=1e-6)
    _, depth, c2w1 = ds.get_frame(1)
    np.testing.assert_allclose(depth.mean(), 1.5, atol=1e-2)
    np.testing.assert_allclose(c2w1[0, 3], 0.1, atol=1e-6)


def test_tum_crop_size_and_edge(tmp_path):
    d = tmp_path / "tum2"
    (d / "rgb").mkdir(parents=True)
    (d / "depth").mkdir()
    write_rgbd(str(d / "rgb" / "a.png"), str(d / "depth" / "a.png"),
               H=48, W=64, depth_scale=5000.0)
    (d / "rgb.txt").write_text("# c\n100.0 rgb/a.png\n")
    (d / "depth.txt").write_text("# c\n100.0 depth/a.png\n")
    (d / "groundtruth.txt").write_text("# c\n100.0 0 0 0 0 0 0 1\n")
    cfg = base_cfg("tumrgbd", str(d), depth_scale=5000.0, H=48, W=64)
    cfg["cam"]["crop_size"] = [24, 32]
    cfg["cam"]["crop_edge"] = 2
    ds = TUMRGBD(cfg)
    color, depth, _ = ds.get_frame(0)
    assert color.shape == (20, 28, 3)
    assert depth.shape == (20, 28)


def test_all_repo_configs_construct():
    """Every shipped per-scene config must load through the inherit chain
    and produce a consistent camera/bound/layout."""
    import glob

    from myslam_tpu.engine.camera import Camera
    from myslam_tpu.engine.scheduler import compute_bound
    from myslam_tpu.models.planes import make_layout

    cfgs = sorted(glob.glob(os.path.join(REPO, "configs", "*", "*.yaml")))
    scene_cfgs = [c for c in cfgs if os.path.basename(c) not in
                  ("replica.yaml", "scannet.yaml", "tum.yaml")]
    assert len(scene_cfgs) >= 19  # 8 replica + 6 scannet + 3 tum + 2 synth
    os.chdir(REPO)  # inherit_from paths are repo-relative
    for path in scene_cfgs:
        cfg = load_config(path, DEFAULT_CONFIG)
        cam = Camera.from_cfg(cfg)
        assert cam.H > 0 and cam.W > 0
        bound = compute_bound(cfg)
        assert (bound[:, 1] > bound[:, 0]).all()
        layout = make_layout(bound, [cfg["planes_res"]["coarse"],
                                     cfg["planes_res"]["fine"]],
                             cfg["model"]["c_dim"])
        assert layout.total_rows > 0


def test_synthetic_depth_consistent_with_rays():
    cfg = {
        "dataset": "synthetic", "scale": 1,
        "cam": {"H": 40, "W": 50, "fx": 40.0, "fy": 40.0, "cx": 24.5,
                "cy": 19.5, "png_depth_scale": 1.0, "crop_edge": 0},
        "data": {"n_frames": 3},
    }
    ds = Synthetic(cfg)
    color, depth, c2w = ds.get_frame(1)
    assert (depth > 0).all()
    # back-projecting depth along rays must land on the room surfaces
    import jax.numpy as jnp

    from myslam_tpu.core.geometry import rays_full_image
    ro, rd = rays_full_image(40, 50, 40.0, 40.0, 24.5, 19.5,
                             jnp.asarray(c2w))
    pts = np.asarray(ro + rd * depth[..., None]).reshape(-1, 3)
    room = ds.room
    sph = ds.spheres
    d_wall = np.minimum(
        np.abs(pts - room[:, 0]).min(-1), np.abs(pts - room[:, 1]).min(-1))
    d_sph = np.min(np.abs(
        np.linalg.norm(pts[:, None] - sph[None, :, :3], axis=-1)
        - sph[None, :, 3]), axis=-1)
    dist = np.minimum(d_wall, d_sph)
    assert np.quantile(dist, 0.99) < 1e-3


def test_synthetic_sparse_pixels_match_dense(tmp_path):
    """build_packet's sparse ray-cast path (tracking-only frames) must
    produce the same pixel batches as the dense full-frame path."""
    from myslam_tpu.utils.datasets import Synthetic, build_packet

    cfg = {
        "dataset": "synthetic", "scale": 1,
        "cam": {"H": 60, "W": 80, "fx": 60.0, "fy": 60.0,
                "cx": 40.0, "cy": 30.0, "png_depth_scale": 1.0},
        "data": {"n_frames": 4},
    }
    ds_sparse = Synthetic(cfg)
    ds_dense = Synthetic(cfg)
    ds_dense.get_frame(2)  # prime the cache: forces the gather path
    kw = dict(iters=3, n_px=64, ie_h=4, ie_w=4, seed=5)
    p_sparse = build_packet(ds_sparse, 2, need_full=False, **kw)
    p_dense = build_packet(ds_dense, 2, need_full=True, **kw)
    np.testing.assert_array_equal(p_sparse.px_i, p_dense.px_i)
    np.testing.assert_array_equal(p_sparse.px_j, p_dense.px_j)
    np.testing.assert_array_equal(p_sparse.px_color, p_dense.px_color)
    np.testing.assert_allclose(p_sparse.px_depth, p_dense.px_depth,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(p_sparse.gt_c2w, p_dense.gt_c2w)

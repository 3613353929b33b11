"""RGB-D frame sources: Replica / ScanNet / TUM readers + synthetic scenes.

Host-side data pipeline (reference: src/utils/datasets.py).  Frames are
returned as numpy arrays (color float32 HxWx3 in [0,1], depth float32 HxW
in meters, gt c2w 4x4); the scheduler owns device upload.  A background
prefetch thread overlaps disk/decode with device compute.

Dataset-format behaviors preserved from the reference:
  * poses' y/z columns negated to the renderer's -z camera convention
    (datasets.py:135-136, 164-165, 242-243);
  * optional undistortion of color only (datasets.py:84-87);
  * crop_size bilinear/nearest resize then crop_edge trim
    (datasets.py:97-110);
  * TUM timestamp association (max_dt=0.08), frame-rate subsampling and
    first-pose rebasing (datasets.py:183-244).
"""

from __future__ import annotations

import glob
import os
import queue
import threading

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def get_dataset(cfg: dict, input_folder: str | None = None):
    name = cfg["dataset"]
    if name not in dataset_dict:
        raise ValueError(f"unknown dataset '{name}'")
    return dataset_dict[name](cfg, input_folder)


class BaseDataset:
    """Disk-backed RGB-D sequence in the reference's layout."""

    def __init__(self, cfg: dict, input_folder: str | None = None):
        self.name = cfg["dataset"]
        self.scale = cfg.get("scale", 1)
        cam = cfg["cam"]
        self.png_depth_scale = cam["png_depth_scale"]
        self.H, self.W = cam["H"], cam["W"]
        self.fx, self.fy = cam["fx"], cam["fy"]
        self.cx, self.cy = cam["cx"], cam["cy"]
        self.distortion = (
            np.array(cam["distortion"]) if "distortion" in cam else None
        )
        self.crop_size = cam.get("crop_size")
        self.crop_edge = cam.get("crop_edge", 0)
        self.input_folder = (
            input_folder if input_folder is not None
            else cfg["data"]["input_folder"]
        )
        self.color_paths: list[str] = []
        self.depth_paths: list[str] = []
        self.poses: list[np.ndarray] = []
        self.n_img = 0

    def __len__(self):
        return self.n_img

    @property
    def frame_hw(self) -> tuple:
        """Dimensions of frames as returned by get_frame (after the
        optional crop_size resize and crop_edge trim)."""
        h, w = (self.crop_size if self.crop_size is not None
                else (self.H, self.W))
        e = self.crop_edge
        return h - 2 * e, w - 2 * e

    def get_frame(self, index: int):
        color = cv2.imread(self.color_paths[index])
        depth = cv2.imread(self.depth_paths[index], cv2.IMREAD_UNCHANGED)
        if self.distortion is not None:
            K = np.eye(3)
            K[0, 0], K[1, 1] = self.fx, self.fy
            K[0, 2], K[1, 2] = self.cx, self.cy
            # undistortion applies to color only (reference datasets.py:86)
            color = cv2.undistort(color, K, self.distortion)
        color = cv2.cvtColor(color, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        depth = depth.astype(np.float32) / self.png_depth_scale * self.scale
        H, W = depth.shape
        if color.shape[:2] != (H, W):
            color = cv2.resize(color, (W, H))

        if self.crop_size is not None:
            ch, cw = self.crop_size
            # align_corners=True bilinear resize for color, nearest for depth
            color = _resize_align_corners(color, ch, cw)
            depth = cv2.resize(depth, (cw, ch), interpolation=cv2.INTER_NEAREST)

        e = self.crop_edge
        if e > 0:
            color = color[e:-e, e:-e]
            depth = depth[e:-e, e:-e]

        pose = self.poses[index].copy()
        pose[:3, 3] *= self.scale
        return color, depth, pose.astype(np.float32)


def _resize_align_corners(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize with align_corners=True (torch F.interpolate semantics;
    cv2.resize uses half-pixel centers, which differs at the borders)."""
    in_h, in_w = img.shape[:2]
    ys = np.linspace(0, in_h - 1, out_h, dtype=np.float32)
    xs = np.linspace(0, in_w - 1, out_w, dtype=np.float32)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, in_h - 1)
    x1 = np.minimum(x0 + 1, in_w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    img3 = img if img.ndim == 3 else img[..., None]
    out = (
        img3[y0][:, x0] * (1 - wy) * (1 - wx)
        + img3[y0][:, x1] * (1 - wy) * wx
        + img3[y1][:, x0] * wy * (1 - wx)
        + img3[y1][:, x1] * wy * wx
    )
    return out if img.ndim == 3 else out[..., 0]


class Replica(BaseDataset):
    def __init__(self, cfg, input_folder=None):
        super().__init__(cfg, input_folder)
        self.color_paths = sorted(
            glob.glob(f"{self.input_folder}/results/frame*.jpg"))
        self.depth_paths = sorted(
            glob.glob(f"{self.input_folder}/results/depth*.png"))
        self.n_img = len(self.color_paths)
        self._load_poses(f"{self.input_folder}/traj.txt")

    def _load_poses(self, path):
        with open(path) as f:
            lines = f.readlines()
        for i in range(self.n_img):
            c2w = np.array(list(map(float, lines[i].split()))).reshape(4, 4)
            c2w[:3, 1] *= -1
            c2w[:3, 2] *= -1
            self.poses.append(c2w.astype(np.float32))


class ScanNet(BaseDataset):
    def __init__(self, cfg, input_folder=None):
        super().__init__(cfg, input_folder)
        by_num = lambda p: int(os.path.basename(p).split(".")[0])  # noqa: E731
        self.color_paths = sorted(
            glob.glob(os.path.join(self.input_folder, "color", "*.jpg")),
            key=by_num)
        self.depth_paths = sorted(
            glob.glob(os.path.join(self.input_folder, "depth", "*.png")),
            key=by_num)
        pose_paths = sorted(
            glob.glob(os.path.join(self.input_folder, "pose", "*.txt")),
            key=by_num)
        for p in pose_paths:
            c2w = np.loadtxt(p).reshape(4, 4)
            c2w[:3, 1] *= -1
            c2w[:3, 2] *= -1
            self.poses.append(c2w.astype(np.float32))
        self.n_img = len(self.color_paths)


class TUMRGBD(BaseDataset):
    def __init__(self, cfg, input_folder=None, frame_rate: int = 32):
        super().__init__(cfg, input_folder)
        self.color_paths, self.depth_paths, self.poses = self._load_tum(
            self.input_folder, frame_rate)
        self.n_img = len(self.color_paths)

    @staticmethod
    def _parse_list(filepath, skiprows=0):
        return np.atleast_2d(np.loadtxt(
            filepath, delimiter=" ", dtype=np.str_, skiprows=skiprows))

    @staticmethod
    def associate_frames(t_img, t_depth, t_pose, max_dt=0.08):
        """Nearest-timestamp association (reference datasets.py:183-200)."""
        associations = []
        for i, t in enumerate(t_img):
            j = int(np.argmin(np.abs(t_depth - t)))
            k = int(np.argmin(np.abs(t_pose - t)))
            if abs(t_depth[j] - t) < max_dt and abs(t_pose[k] - t) < max_dt:
                associations.append((i, j, k))
        return associations

    def _load_tum(self, datapath, frame_rate):
        if os.path.isfile(os.path.join(datapath, "groundtruth.txt")):
            pose_list = os.path.join(datapath, "groundtruth.txt")
        else:
            pose_list = os.path.join(datapath, "pose.txt")
        image_data = self._parse_list(os.path.join(datapath, "rgb.txt"))
        depth_data = self._parse_list(os.path.join(datapath, "depth.txt"))
        pose_data = self._parse_list(pose_list, skiprows=1)
        pose_vecs = pose_data[:, 1:].astype(np.float64)

        t_img = image_data[:, 0].astype(np.float64)
        t_depth = depth_data[:, 0].astype(np.float64)
        t_pose = pose_data[:, 0].astype(np.float64)
        associations = self.associate_frames(t_img, t_depth, t_pose)

        # subsample to ~frame_rate using image timestamps
        indices = [0]
        for i in range(1, len(associations)):
            t0 = t_img[associations[indices[-1]][0]]
            t1 = t_img[associations[i][0]]
            if t1 - t0 > 1.0 / frame_rate:
                indices.append(i)

        images, depths, poses = [], [], []
        inv_pose = None
        for ix in indices:
            i, j, k = associations[ix]
            images.append(os.path.join(datapath, str(image_data[i, 1])))
            depths.append(os.path.join(datapath, str(depth_data[j, 1])))
            c2w = self._pose_matrix_from_quaternion(pose_vecs[k])
            if inv_pose is None:  # rebase so the first pose is identity
                inv_pose = np.linalg.inv(c2w)
                c2w = np.eye(4)
            else:
                c2w = inv_pose @ c2w
            c2w[:3, 1] *= -1
            c2w[:3, 2] *= -1
            poses.append(c2w.astype(np.float32))
        return images, depths, poses

    @staticmethod
    def _pose_matrix_from_quaternion(pvec):
        from scipy.spatial.transform import Rotation

        pose = np.eye(4)
        pose[:3, :3] = Rotation.from_quat(pvec[3:]).as_matrix()
        pose[:3, 3] = pvec[:3]
        return pose


# ---------------------------------------------------------------------------
# Synthetic analytic scene — exact RGB-D with known geometry and poses.
# Serves tests and benchmarking in dataset-free environments, and provides
# golden end-to-end oracles (true ATE, true surface geometry).
# ---------------------------------------------------------------------------

class Synthetic(BaseDataset):
    """Procedural room (AABB walls + two spheres) rendered analytically.

    cfg['data'] may specify n_frames; intrinsics come from cfg['cam'].
    Geometry: room interior is the AABB `room`; obstacles are spheres.
    Colors are smooth position-based patterns (good gradients for SLAM).
    """

    def __init__(self, cfg, input_folder=None):
        # Fully procedural: BaseDataset's disk-path setup does not apply.
        self.name = cfg["dataset"]
        cam = cfg["cam"]
        self.H, self.W = cam["H"], cam["W"]
        self.fx, self.fy = cam["fx"], cam["fy"]
        self.cx, self.cy = cam["cx"], cam["cy"]
        self.crop_edge = cam.get("crop_edge", 0)
        self.crop_size = cam.get("crop_size")
        self.scale = cfg.get("scale", 1)
        data = cfg.get("data", {})
        self.n_img = int(data.get("n_frames", 40))
        self.room = np.array(data.get(
            "room", [[0.0, 4.0], [0.0, 3.0], [0.0, 2.5]]))
        self.spheres = np.array(data.get(
            "spheres",
            [[2.6, 1.9, 0.7, 0.5], [1.3, 0.9, 1.6, 0.35]]))  # x,y,z,r
        # Per-frame angular step (rad).  Fixed per frame — NOT divided by
        # sequence length — so inter-frame motion stays at realistic
        # camera-tracking magnitudes (~0.5 deg + ~1 cm) for any n_frames.
        self.ang_step = float(data.get("ang_step", 0.008))
        self.poses = [self._pose(i) for i in range(self.n_img)]
        self._cache: dict[int, tuple] = {}

    @property
    def frame_hw(self) -> tuple:
        return self.H, self.W  # procedural frames are never cropped

    def _pose(self, idx: int) -> np.ndarray:
        center = self.room.mean(axis=1)
        ang = -0.45 * np.pi + idx * self.ang_step
        eye = center + np.array(
            [0.9 * np.cos(ang), 0.9 * np.sin(ang), 0.25 * np.sin(2 * ang)])
        target = center + np.array(
            [1.6 * np.cos(ang + 0.9), 1.6 * np.sin(ang + 0.9), 0.1])
        return look_at(eye, target).astype(np.float32)

    def get_frame(self, index: int):
        if index in self._cache:
            return self._cache[index]
        c2w = self.poses[index]
        from myslam_tpu import native
        out = native.render_analytic_frame(
            c2w, self.H, self.W, self.fx, self.fy, self.cx, self.cy,
            self.room, self.spheres)
        if out is not None:
            color, depth = out
        else:
            if not hasattr(self, "_dirs_cam"):
                j, i = np.meshgrid(np.arange(self.H, dtype=np.float32),
                                   np.arange(self.W, dtype=np.float32),
                                   indexing="ij")
                self._dirs_cam = np.stack(
                    [(i - self.cx) / self.fx, -(j - self.cy) / self.fy,
                     -np.ones_like(i)], axis=-1)
            color, depth = render_analytic(
                c2w, self.H, self.W, self.fx, self.fy, self.cx, self.cy,
                self.room, self.spheres, dirs_cam=self._dirs_cam)
        out = (color.astype(np.float32), depth.astype(np.float32),
               c2w.astype(np.float32))
        if len(self._cache) < 64:
            self._cache[index] = out
        return out

    def sample_pixels(self, index: int, i: np.ndarray, j: np.ndarray):
        """Sparse RGB-D at pixel coords (build_packet fast path): renders
        only the requested rays instead of the full frame."""
        if index in self._cache:  # full frame already on hand: just gather
            color, depth, _ = self._cache[index]
            return color[j, i], depth[j, i]
        from myslam_tpu import native
        out = native.render_analytic_px(
            self.poses[index], i, j, self.fx, self.fy, self.cx, self.cy,
            self.room, self.spheres)
        if out is not None:
            return out
        return render_analytic_pixels(
            self.poses[index], i, j, self.fx, self.fy, self.cx, self.cy,
            self.room, self.spheres)

    def gt_sdf(self, pts: np.ndarray) -> np.ndarray:
        """Exact signed distance of the scene surface at (..., 3) points:
        positive in free (interior) space, negative inside walls/spheres.
        The scene's surface = room-interior walls + solid spheres, so
        sdf = min(distance-to-walls-from-inside, sphere sdfs)."""
        pts = np.asarray(pts, np.float32)
        lo = self.room[:, 0].astype(np.float32)
        hi = self.room[:, 1].astype(np.float32)
        d = np.minimum(pts - lo, hi - pts).min(axis=-1)
        for sx, sy, sz, r in self.spheres:
            d = np.minimum(
                d, np.linalg.norm(
                    pts - np.array([sx, sy, sz], np.float32), axis=-1) - r)
        return d

    def save_gt_mesh(self, path: str, resolution: float = 0.01,
                     pad: float = 0.05) -> str:
        """Ground-truth surface mesh from the analytic SDF (marching
        tetrahedra at ``resolution``) — the recon-eval oracle that real
        datasets ship as files (reference README.md:99-118)."""
        from myslam_tpu.ops.marching import extract_isosurface
        from myslam_tpu.utils.ply import write_ply

        axes = [np.arange(lo - pad, hi + pad + resolution, resolution,
                          dtype=np.float32) for lo, hi in self.room]
        g = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
        vol = self.gt_sdf(g.reshape(-1, 3)).reshape(g.shape[:-1])
        verts, faces = extract_isosurface(
            vol, origin=[a[0] for a in axes], spacing=[resolution] * 3,
            # sign convention: solid where sdf < 0, same as the map's
            level=0.0)
        write_ply(path, verts, faces)
        return path


def look_at(eye: np.ndarray, target: np.ndarray,
            up=np.array([0.0, 0.0, 1.0])) -> np.ndarray:
    """c2w with the renderer's -z-forward convention."""
    f = target - eye
    f = f / np.linalg.norm(f)
    z = -f
    x = np.cross(f, up)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, eye
    return c2w


def _raycast_analytic(o, d, room, spheres):
    """Shared exact ray cast: o (3,), d (..., 3) float32 -> (color, t_hit).

    Depth is the standard RGB-D perpendicular depth: the parameter t of
    the hit along the unnormalized direction [(i-cx)/fx, -(j-cy)/fy, -1].
    Everything stays float32 — a float64 constant anywhere would silently
    promote the whole (H, W, 3) pipeline and double its cost.
    """
    room = room.astype(np.float32)
    base = d.shape[:-1]

    # Room walls: exit t of the interior AABB.
    with np.errstate(divide="ignore", invalid="ignore"):
        tt = (room.reshape((1,) * len(base) + (3, 2))
              - o.reshape((1,) * len(base) + (3, 1))) / d[..., None]
    t_hit = np.min(np.max(tt, axis=-1), axis=-1)
    obj_id = np.zeros(base, np.int32)  # 0 = wall

    for si, (sx, sy, sz, r) in enumerate(spheres):
        oc = (o - np.array([sx, sy, sz], np.float32))
        a = np.sum(d * d, axis=-1)
        b = 2.0 * (d @ oc)
        c0 = np.float32(oc @ oc - r * r)
        disc = b * b - 4 * a * c0
        valid = disc > 0
        sq = np.sqrt(np.maximum(disc, 0))
        t_s = (-b - sq) / (2 * a)
        hit = valid & (t_s > 1e-4) & (t_s < t_hit)
        t_hit = np.where(hit, t_s, t_hit)
        obj_id = np.where(hit, si + 1, obj_id)

    pts = o.reshape((1,) * len(base) + (3,)) + t_hit[..., None] * d
    # Smooth procedural coloring by hit position and object id.
    phase = (np.array([0.0, 2.1, 4.2], np.float32)
             + obj_id[..., None].astype(np.float32) * 1.3)
    freq = 2.0 + 1.5 * obj_id[..., None].astype(np.float32)
    color = 0.5 + 0.35 * np.sin(
        freq * pts[..., [0, 1, 2]] + phase) + 0.15 * np.cos(
        np.float32(3.1) * pts[..., [1, 2, 0]])
    color = np.clip(color, 0.0, 1.0).astype(np.float32)
    return color, t_hit.astype(np.float32)


def render_analytic(c2w, H, W, fx, fy, cx, cy, room, spheres,
                    dirs_cam=None):
    """Exact full-image ray-cast RGB-D of the procedural scene.

    ``dirs_cam``: optional precomputed (H, W, 3) camera-space directions
    (identical for every frame — callers rendering sequences should cache
    them once).
    """
    if dirs_cam is None:
        j, i = np.meshgrid(np.arange(H, dtype=np.float32),
                           np.arange(W, dtype=np.float32), indexing="ij")
        dirs_cam = np.stack(
            [(i - cx) / fx, -(j - cy) / fy, -np.ones_like(i)], axis=-1)
    d = dirs_cam @ c2w[:3, :3].T.astype(np.float32)
    return _raycast_analytic(c2w[:3, 3].astype(np.float32), d, room, spheres)


def render_analytic_pixels(c2w, i, j, fx, fy, cx, cy, room, spheres):
    """Ray-cast only the given pixel coordinates i (N,), j (N,).

    Same math as render_analytic evaluated sparsely — tracking-only frames
    need ~16k sampled pixels, not the full 816k-pixel image (a ~50x
    host-CPU saving that keeps the packet prefetcher ahead of the loop).
    """
    i = i.astype(np.float32)
    j = j.astype(np.float32)
    dirs_cam = np.stack(
        [(i - cx) / fx, -(j - cy) / fy, -np.ones_like(i)], axis=-1)
    d = dirs_cam @ c2w[:3, :3].T.astype(np.float32)
    return _raycast_analytic(c2w[:3, 3].astype(np.float32), d, room, spheres)


class FramePacket:
    """Compact per-frame upload unit.

    The remote-device link is the scarcest resource in the loop (measured
    ~30 MB/s H2D through the TPU tunnel vs 13 MB for one raw float frame),
    so the host ships only what the device consumes:

      * tracking pixels — the tracker optimizes over ``iters`` fresh
        batches of ``n_px`` random pixels (reference src/Tracker.py:299);
        those are drawn host-side and shipped as (iters, n_px) arrays
        (~0.2 MB) instead of the full frame;
      * full imagery (color uint8, depth uint16 + dequant scale) only for
        frames that enter the keyframe store / mapping / visualization.

    Color uint8 and depth uint16 are lossless for the real datasets (the
    reference itself loads 8-bit jpg/png color and 16-bit png depth,
    src/utils/datasets.py:79-96); synthetic float depth is quantized to
    <0.1 mm by a per-frame scale.
    """

    __slots__ = ("idx", "gt_c2w", "px_i", "px_j", "px_color", "px_depth",
                 "color_u8", "depth_u16", "depth_inv_q", "has_depthless",
                 "color_u8_host", "depth_u16_host")

    def __init__(self, idx, gt_c2w, px_i, px_j, px_color, px_depth,
                 color_u8=None, depth_u16=None, depth_inv_q=0.0,
                 has_depthless=True):
        self.idx = idx
        self.gt_c2w = gt_c2w
        self.px_i = px_i
        self.px_j = px_j
        self.px_color = px_color
        self.px_depth = px_depth
        self.color_u8 = color_u8
        self.depth_u16 = depth_u16
        self.depth_inv_q = depth_inv_q
        self.has_depthless = has_depthless
        # numpy imagery retained by stage_packet so host-side consumers
        # (the host keyframe store) never fetch the staged device copy
        # back through the link
        self.color_u8_host = None
        self.depth_u16_host = None

    def imagery_host(self):
        """(color_u8, depth_u16) as host numpy arrays, free of any
        device round-trip when the packet was staged."""
        c = (self.color_u8_host if self.color_u8_host is not None
             else np.asarray(self.color_u8))
        d = (self.depth_u16_host if self.depth_u16_host is not None
             else np.asarray(self.depth_u16))
        return c, d


def build_packet(dataset, idx: int, *, iters: int, n_px: int,
                 ie_h: int, ie_w: int, need_full: bool,
                 seed: int = 0) -> FramePacket:
    """Load frame ``idx`` and encode it as a FramePacket.

    Pixel sampling reproduces the reference's per-iteration fresh uniform
    draws over the edge-trimmed image (src/common.py:101-139,
    src/Tracker.py:169) with a per-frame-seeded host RNG.
    """
    from myslam_tpu import native

    rng = np.random.default_rng((seed + 1) * 1_000_003 + idx)
    H, W = dataset.frame_hw
    j = rng.integers(ie_h, H - ie_h, size=(iters, n_px)).astype(np.uint16)
    i = rng.integers(ie_w, W - ie_w, size=(iters, n_px)).astype(np.uint16)

    if not need_full and hasattr(dataset, "sample_pixels"):
        # Sparse path: evaluate only the sampled rays (procedural
        # datasets) — the full-frame render is ~50x more host CPU.
        px_color, px_depth = dataset.sample_pixels(
            idx, i.reshape(-1).astype(np.int64),
            j.reshape(-1).astype(np.int64))
        px_color = np.clip(np.rint(px_color * 255.0), 0, 255).astype(
            np.uint8).reshape(iters, n_px, 3)
        px_depth = px_depth.astype(np.float32).reshape(iters, n_px)
        return FramePacket(
            idx, dataset.poses[idx].astype(np.float32), i, j,
            px_color, px_depth,
            has_depthless=bool((px_depth <= 0).any()))

    color, depth, c2w = dataset.get_frame(idx)
    px_color, px_depth, has_depthless = native.gather_pixels(
        color, depth, i, j)
    px_color = px_color.reshape(iters, n_px, 3)
    px_depth = px_depth.reshape(iters, n_px)

    color_u8 = depth_u16 = None
    inv_q = 0.0
    if need_full:
        color_u8 = native.encode_color_u8(color)
        q = 60000.0 / max(native.depth_max(depth), 1e-3)
        # valid (>0) depths never quantize to 0 (0 encodes "no depth")
        depth_u16 = native.quantize_depth_u16(depth, q)
        inv_q = 1.0 / q
    return FramePacket(
        idx, c2w, i, j, px_color, px_depth, color_u8, depth_u16,
        inv_q, has_depthless)


def stage_packet(pkt: FramePacket) -> FramePacket:
    """Start the packet's host->device uploads (in place).

    ``jax.device_put`` returns immediately; issuing it from the prefetch
    thread, frames ahead of the SLAM loop, overlaps the tunnel transfer
    (~30 MB/s; 4 MB of imagery per mapped frame) with device compute of
    earlier frames instead of serializing inside the loop.  Consumers'
    ``jnp.asarray`` on an already-device array is a no-op.
    """
    import jax

    pkt.px_i = jax.device_put(pkt.px_i)
    pkt.px_j = jax.device_put(pkt.px_j)
    pkt.px_color = jax.device_put(pkt.px_color)
    pkt.px_depth = jax.device_put(pkt.px_depth)
    if pkt.color_u8 is not None:
        pkt.color_u8_host = pkt.color_u8
        pkt.depth_u16_host = pkt.depth_u16
        pkt.color_u8 = jax.device_put(pkt.color_u8)
        pkt.depth_u16 = jax.device_put(pkt.depth_u16)
    return pkt


class PacketPrefetcher:
    """Background thread building FramePackets ahead of the SLAM loop."""

    def __init__(self, dataset, indices, make_packet, depth: int = 4,
                 stage: bool = False):
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.indices = list(indices)
        self.dataset = dataset
        self.make_packet = make_packet
        self.stage = stage
        self.thread = threading.Thread(target=self._work, daemon=True)
        self.thread.start()

    def _work(self):
        try:
            for idx in self.indices:
                pkt = self.make_packet(self.dataset, idx)
                if self.stage:
                    pkt = stage_packet(pkt)
                self.q.put((idx, pkt))
            self.q.put(None)
        except Exception as e:  # surface loader errors to the consumer
            self.q.put(e)

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is None:
                return
            if isinstance(item, Exception):
                raise item
            yield item


class Prefetcher:
    """Background-thread frame loader (replaces torch DataLoader workers)."""

    def __init__(self, dataset, indices, depth: int = 4):
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.indices = list(indices)
        self.thread = threading.Thread(target=self._work, daemon=True)
        self.dataset = dataset
        self.thread.start()

    def _work(self):
        for idx in self.indices:
            self.q.put((idx, self.dataset.get_frame(idx)))
        self.q.put(None)

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is None:
                return
            yield item


dataset_dict = {
    "replica": Replica,
    "scannet": ScanNet,
    "tumrgbd": TUMRGBD,
    "synthetic": Synthetic,
}

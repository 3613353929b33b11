"""Keyframe store (fixed-capacity device ring) and window selection.

The reference keeps keyframes as a Python list of full-resolution GPU
tensors (src/Mapper.py:429-432) and picks the bundle-adjustment window by
projecting sparse samples of the current frame into every older keyframe's
frustum (src/Mapper.py:146-209).

TPU-native redesign: imagery lives in pre-allocated device arrays
(color fp16, depth fp32) indexed by keyframe slot; the frustum-overlap
scores for ALL slots are computed by one jitted program with static
shapes (inactive slots masked), and only the tiny eligible-set
permutation happens on host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myslam_tpu.core.geometry import invert_pose, project_points, rays_from_uv
from myslam_tpu.core.sampling import gather_pixels, sample_pixels
from myslam_tpu.engine.camera import Camera


@jax.jit
def _write_slot(buf, slot, value):
    return buf.at[slot].set(value.astype(buf.dtype))


# Buffer-donating variant: XLA aliases input and output so the multi-GB
# imagery buffers are updated in place instead of copied per write.
_write_slot_donated = jax.jit(
    lambda buf, slot, value: buf.at[slot].set(value.astype(buf.dtype)),
    donate_argnums=(0,),
)

# Packed-imagery write: frames cross the host-device link as uint8 color
# and uint16 quantized depth (see datasets.FramePacket) and are dequantized
# on device into the store's dtypes.
_write_color_u8 = jax.jit(
    lambda buf, slot, u8: buf.at[slot].set(
        (u8.astype(jnp.float32) * (1.0 / 255.0)).astype(buf.dtype)),
    donate_argnums=(0,),
)
_write_depth_u16 = jax.jit(
    lambda buf, slot, u16, inv_q: buf.at[slot].set(
        u16.astype(jnp.float32) * inv_q),
    donate_argnums=(0,),
)

# Device-side slot-to-slot copy (keyframe admission copies the scratch
# slot's imagery without re-crossing the link).
_copy_slot = jax.jit(
    lambda buf, dst, src: buf.at[dst].set(buf[src]),
    donate_argnums=(0,),
)

_dequant_depths = jax.jit(
    lambda u16, inv_q: u16.astype(jnp.float32) * inv_q[:, None, None])


class KeyframeStore:
    """Fixed-capacity keyframe imagery + poses.

    ``device="device"`` (default): imagery lives in device HBM as
    fp16/fp32 (fast path — the fused mapper reads it in place).

    ``device="packed"`` (also what the reference's ``keyframe_device:
    cpu``, /root/reference/configs/ESLAM.yaml:4, maps to): imagery lives
    in device HBM in its QUANTIZED wire format (u8 color, u16 depth +
    per-slot scale — half the bytes of the fp16/fp32 store, a quarter of
    the reference's full-float GPU tensors) and the fused mapper
    dequantizes the ~4k sampled pixels per iteration in-program.  This
    is the TPU-native answer to the reference's motivation for host
    keyframes: ScanNet scene0000's ~1.4k keyframes fit in ~2.1 GB.
    ``depths`` is then the pytree ``(depths_u16, depth_inv_q)``.

    ``device="host_staged"`` keeps imagery HOST-side and stages only the
    selected BA window per mapped frame — the escape hatch for stores
    that exceed HBM even packed; costs a selection round-trip + window
    upload per mapped frame (PERF.md).  Poses always stay on device
    (tiny; selection and write-back use them).
    """

    def __init__(self, capacity: int, cam: Camera, color_dtype=jnp.float16,
                 device: str = "device"):
        self.capacity = capacity
        self.cam = cam
        self.count = 0
        self.frame_ids: list[int] = []
        mode = str(device).lower()
        self.host_mode = mode in ("host", "host_staged")
        self.packed = mode in ("cpu", "packed")
        # Host-side record of whether each slot's depth map has holes —
        # lets the mapper statically skip the depth-less sampling branch.
        self.has_depthless: list[bool] = [False] * capacity
        if self.host_mode:
            self.colors = None
            self.depths = None
            self.colors_u8 = np.zeros((capacity, cam.H, cam.W, 3), np.uint8)
            self.depths_u16 = np.zeros((capacity, cam.H, cam.W), np.uint16)
            self.depth_inv_q = np.ones((capacity,), np.float32)
        elif self.packed:
            self.colors = jnp.zeros((capacity, cam.H, cam.W, 3), jnp.uint8)
            self.depths = (jnp.zeros((capacity, cam.H, cam.W), jnp.uint16),
                           jnp.ones((capacity,), jnp.float32))
        else:
            self.colors = jnp.zeros((capacity, cam.H, cam.W, 3), color_dtype)
            self.depths = jnp.zeros((capacity, cam.H, cam.W), jnp.float32)
        self.est_c2w = jnp.tile(jnp.eye(4), (capacity, 1, 1))
        self.gt_c2w = jnp.tile(jnp.eye(4), (capacity, 1, 1))

    def depths_float(self):
        """Depth maps as float32 (dequantized view for meshing/eval)."""
        if self.packed:
            u16, inv_q = self.depths
            return _dequant_depths(u16, inv_q)
        return self.depths

    # -- host-mode (keyframe_device: cpu) ---------------------------------

    def add_host(self, frame_id: int, color_u8, depth_u16, inv_q: float,
                 has_depthless: bool = True) -> int:
        """Admit a keyframe's imagery into the HOST store (poses are
        written by the window mapper's device program)."""
        if self.count >= self.capacity:
            raise RuntimeError("keyframe store full")
        pos = self.count
        self.colors_u8[pos] = color_u8
        self.depths_u16[pos] = depth_u16
        self.depth_inv_q[pos] = inv_q
        self.has_depthless[pos] = bool(has_depthless)
        self.frame_ids.append(int(frame_id))
        self.count += 1
        return pos

    def window_imagery(self, slots) -> tuple:
        """Stacked quantized imagery for the given global slots (host
        gather feeding one H2D stage of the BA window)."""
        slots = np.asarray(slots, np.int64)
        return (self.colors_u8[slots], self.depths_u16[slots],
                self.depth_inv_q[slots])

    def write_imagery(self, slot: int, color, depth) -> None:
        """In-place (donated) write of one slot's color+depth."""
        if self.packed:
            raise RuntimeError(
                "packed store: use write_imagery_packed (u8/u16 wire)")
        self.colors = _write_slot_donated(self.colors, slot, color)
        self.depths = _write_slot_donated(self.depths, slot, depth)

    def write_imagery_packed(self, slot: int, color_u8, depth_u16,
                             depth_inv_q: float) -> None:
        """In-place write from a FramePacket's uint8/uint16 encoding."""
        if self.packed:
            u16, inv_q = self.depths
            self.colors = _write_slot_donated(self.colors, slot,
                                              jnp.asarray(color_u8))
            self.depths = (
                _write_slot_donated(u16, slot, jnp.asarray(depth_u16)),
                inv_q.at[slot].set(jnp.float32(depth_inv_q)))
            return
        self.colors = _write_color_u8(self.colors, slot, color_u8)
        self.depths = _write_depth_u16(
            self.depths, slot, depth_u16, jnp.float32(depth_inv_q))

    def add(self, frame_id: int, color, depth, est_c2w, gt_c2w,
            has_depthless: bool = True) -> int:
        if self.count >= self.capacity:
            raise RuntimeError("keyframe store full")
        pos = self.count
        self.has_depthless[pos] = bool(has_depthless)
        self.write_imagery(pos, color, depth)
        self.est_c2w = _write_slot(self.est_c2w, pos, est_c2w)
        self.gt_c2w = _write_slot(self.gt_c2w, pos, gt_c2w)
        self.frame_ids.append(int(frame_id))
        self.count += 1
        return pos

    def add_from_slot(self, frame_id: int, src_slot: int, est_c2w, gt_c2w,
                      has_depthless: bool = True) -> int:
        """Admit a keyframe whose imagery already lives in ``src_slot``
        (device-to-device copy, no host involvement)."""
        if self.count >= self.capacity:
            raise RuntimeError("keyframe store full")
        pos = self.count
        self.has_depthless[pos] = bool(has_depthless)
        self.colors = _copy_slot(self.colors, pos, src_slot)
        if self.packed:
            u16, inv_q = self.depths
            self.depths = (_copy_slot(u16, pos, src_slot),
                           inv_q.at[pos].set(inv_q[src_slot]))
        else:
            self.depths = _copy_slot(self.depths, pos, src_slot)
        self.est_c2w = _write_slot(self.est_c2w, pos, est_c2w)
        self.gt_c2w = _write_slot(self.gt_c2w, pos, gt_c2w)
        self.frame_ids.append(int(frame_id))
        self.count += 1
        return pos

    # -- host_staged device line-cache ---------------------------------
    #
    # Staging the whole (w_max, H, W) window per mapped frame costs a
    # ~90 MB H2D upload at the Replica operating point (PERF.md).  The
    # window's slots barely change between consecutive mapped frames, so
    # a small slab of quantized imagery "lines" in HBM acts as a cache:
    # the mapper reads pixels straight from the slab (same packed gather
    # as the device="packed" store) and only slots NOT already resident
    # are uploaded — usually none.  Line ``lines-1`` is the scratch line
    # for the current (not yet admitted) frame; admission binds the
    # scratch contents to a permanent line with a device-side copy.

    def init_cache(self, lines: int) -> None:
        assert self.host_mode
        lines = int(lines)
        self.cache_lines = lines
        self.scratch_line = lines - 1
        self.cache_colors = jnp.zeros(
            (lines, self.cam.H, self.cam.W, 3), jnp.uint8)
        self.cache_depths = jnp.zeros(
            (lines, self.cam.H, self.cam.W), jnp.uint16)
        self.cache_inv_q = jnp.ones((lines,), jnp.float32)
        self.line_of_slot = np.full((self.capacity,), -1, np.int32)
        self.slot_of_line = np.full((lines,), -1, np.int32)
        self._line_tick = np.zeros((lines,), np.int64)
        self._line_tick[self.scratch_line] = np.iinfo(np.int64).max
        self._tick = 0
        self.cache_misses = 0

    def _write_line(self, line: int, color_u8, depth_u16, inv_q) -> None:
        self.cache_colors = _write_slot_donated(
            self.cache_colors, line, jnp.asarray(color_u8))
        self.cache_depths = _write_slot_donated(
            self.cache_depths, line, jnp.asarray(depth_u16))
        self.cache_inv_q = self.cache_inv_q.at[line].set(jnp.float32(inv_q))

    def stage_scratch(self, color_u8, depth_u16, inv_q) -> int:
        """Upload the current frame's packet into the scratch line."""
        self._write_line(self.scratch_line, color_u8, depth_u16, inv_q)
        return self.scratch_line

    def _lru_victim(self) -> int:
        ln = int(np.argmin(self._line_tick))
        if self._line_tick[ln] >= self._tick:
            raise RuntimeError(
                "host_staged cache smaller than the BA window; raise "
                "mapping.host_cache_lines")
        old = self.slot_of_line[ln]
        if old >= 0:
            self.line_of_slot[old] = -1
        return ln

    def stage_lines(self, slots) -> np.ndarray:
        """Ensure the given global slots are cache-resident (uploading
        only the missing ones), pin them for this window, and return
        their line ids."""
        slots = np.asarray(slots, np.int64)
        self._tick += 1
        t = self._tick
        for s in slots:  # pin residents first: they can't become victims
            ln = self.line_of_slot[s]
            if ln >= 0:
                self._line_tick[ln] = t
        lines = np.empty(len(slots), np.int32)
        for k, s in enumerate(slots):
            ln = int(self.line_of_slot[s])
            if ln < 0:
                ln = self._lru_victim()
                self._write_line(ln, self.colors_u8[s], self.depths_u16[s],
                                 self.depth_inv_q[s])
                self.line_of_slot[s] = ln
                self.slot_of_line[ln] = s
                self._line_tick[ln] = t
                self.cache_misses += 1
            lines[k] = ln
        return lines

    def bind_scratch(self, slot: int) -> None:
        """Admit the scratch line's imagery as keyframe ``slot``'s cache
        entry (device-side copy, no re-upload at the next selection).

        Prefers a never-assigned line: _lru_victim runs AFTER the tick
        bump, so at/near minimum cache size it could otherwise evict a
        line stage_lines just pinned for the current window — forcing a
        guaranteed re-upload of that slot on the next mapped frame."""
        self._tick += 1
        free = np.nonzero(self.slot_of_line < 0)[0]
        free = free[free != self.scratch_line]
        ln = int(free[0]) if len(free) else self._lru_victim()
        self.cache_colors = _copy_slot(self.cache_colors, ln,
                                       self.scratch_line)
        self.cache_depths = _copy_slot(self.cache_depths, ln,
                                       self.scratch_line)
        self.cache_inv_q = self.cache_inv_q.at[ln].set(
            self.cache_inv_q[self.scratch_line])
        self.line_of_slot[slot] = ln
        self.slot_of_line[ln] = slot
        self._line_tick[ln] = self._tick

    def note_admitted(self, frame_id: int, has_depthless: bool = True) -> int:
        """Record a keyframe whose buffers a device program already wrote
        at slot ``count`` (fused admission, engine/mapper.make_frame_mapper)."""
        if self.count >= self.capacity:
            raise RuntimeError("keyframe store full")
        pos = self.count
        self.has_depthless[pos] = bool(has_depthless)
        self.frame_ids.append(int(frame_id))
        self.count += 1
        return pos

    def set_est_poses(self, slots: np.ndarray, poses: jnp.ndarray) -> None:
        """Write optimized c2w matrices back for the given slots."""
        self.est_c2w = self.est_c2w.at[jnp.asarray(slots)].set(poses)


def make_overlap_scorer(cam: Camera, num_rays: int = 50, num_samples: int = 8,
                        edge: int = 20):
    """Jitted frustum-overlap scores of the current frame vs all keyframes.

    Returns score(kf_c2w (cap,4,4), n_scored, cur_c2w, gt_depth, key)
      -> (cap,) fraction of current-frame surface samples inside each
      keyframe's frustum; -1 for slots >= n_scored.
    Reference src/Mapper.py:146-209.
    """

    def score(kf_c2w, n_scored, cur_c2w, gt_depth, key):
        i, j = sample_pixels(key, num_rays, 0, cam.H, 0, cam.W)
        d = gather_pixels(gt_depth, i, j)
        rays_o, rays_d = rays_from_uv(i, j, cur_c2w, cam.fx, cam.fy, cam.cx, cam.cy)
        valid = d > 0
        t_vals = jnp.linspace(0.0, 1.0, num_samples)
        near = 0.8 * d[:, None]
        far = d[:, None] + 0.5
        z = near * (1 - t_vals)[None, :] + far * t_vals[None, :]
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
        pts = pts.reshape(-1, 3)
        pt_valid = jnp.repeat(valid, num_samples)

        w2cs = invert_pose(kf_c2w)  # (cap, 4, 4)
        u, v, zc = project_points(
            pts[None, :, :], w2cs[:, None, :, :], cam.fx, cam.fy, cam.cx, cam.cy
        )
        inside = (
            (u < cam.W - edge) & (u > edge) & (v < cam.H - edge) & (v > edge)
            & (zc < 0) & pt_valid[None, :]
        )
        n_valid = jnp.maximum(jnp.sum(pt_valid), 1)
        pct = jnp.sum(inside, axis=1) / n_valid
        slot_ids = jnp.arange(kf_c2w.shape[0])
        return jnp.where(slot_ids < n_scored, pct, -1.0)

    return jax.jit(score)


def make_window_selector(cam: Camera, capacity: int, window_size: int,
                         w_max: int, scratch_slot: int,
                         method: str = "overlap",
                         num_rays: int = 50, num_samples: int = 8,
                         edge: int = 20):
    """Fully device-side BA-window selection (no per-frame host fetch).

    Same policy as select_window — up to window_size-1 overlap-weighted
    (or uniformly random) picks from keyframes older than the last two,
    plus the last two, ascending — but the scores, the random subset, and
    the padded slot arrays are all produced by ONE jitted program.  The
    blocking scores fetch select_window does costs a full tunnel
    round-trip (~100 ms) per mapped frame on remote devices.

    Returns select(kf_c2w (cap,4,4), count, cur_c2w, gt_depth, key,
                   joint_opt (f32 0/1))
      -> (slot_kf (w_max,) i32: window slots ascending then the scratch
          slot; n_slots i32; pose_mask (w_max,) f32).
    """
    scorer = make_overlap_scorer(cam, num_rays, num_samples, edge)

    def select(kf_c2w, count, cur_c2w, gt_depth, key, joint_opt):
        k_score, k_pick = jax.random.split(key)
        slot_ids = jnp.arange(capacity)
        if method == "overlap":
            scores = scorer(kf_c2w, count - 2, cur_c2w, gt_depth, k_score)
            eligible = scores > 0  # already -1 for slots >= count-2
        else:  # 'global': uniform over all keyframes older than the last 2
            eligible = slot_ids < count - 2
        # Uniform subset without replacement: random keys, top-k.
        r = jax.random.uniform(k_pick, (capacity,))
        rank = jnp.where(eligible, r, -jnp.inf)
        k = min(window_size - 1, capacity)
        _, top_idx = jax.lax.top_k(rank, k)
        top_ok = jnp.take(eligible, top_idx)
        chosen = jnp.zeros((capacity,), bool).at[top_idx].max(top_ok)
        # the last two keyframes always join (reference Mapper.py:243-247)
        last_two = ((slot_ids == count - 1) | (slot_ids == count - 2)) & (
            count > 1)
        chosen = chosen | last_two
        n_kf = jnp.sum(chosen).astype(jnp.int32)
        (slots_sorted,) = jnp.nonzero(chosen, size=w_max, fill_value=0)
        pos = jnp.arange(w_max)
        slot_kf = jnp.where(pos == n_kf, scratch_slot,
                            slots_sorted).astype(jnp.int32)
        n_slots = n_kf + 1
        pose_mask = ((pos >= 1) & (pos <= n_kf)).astype(
            jnp.float32) * joint_opt
        return slot_kf, n_slots, pose_mask

    return jax.jit(select)


def select_window(
    rng: np.random.Generator,
    scorer,
    store: KeyframeStore,
    cur_c2w: jnp.ndarray,
    gt_depth: jnp.ndarray,
    window_size: int,
    key: jax.Array,
    method: str = "overlap",
) -> list[int]:
    """Choose keyframe slots for the BA window (current frame excluded).

    Mirrors the reference policy (src/Mapper.py:235-247): up to
    window_size-1 slots drawn from keyframes older than the last two
    (overlap-weighted or globally random), plus the last two keyframes,
    sorted ascending (oldest first — the oldest gets its pose frozen).
    """
    n = store.count
    if n == 0:
        return []
    picked: list[int] = []
    if n > 2:
        if method == "overlap":
            scores = np.asarray(
                scorer(store.est_c2w, n - 2, cur_c2w, gt_depth, key)
            )
            eligible = np.nonzero(scores[: n - 2] > 0)[0]
        else:  # 'global'
            eligible = np.arange(max(n - 2, 0))
        perm = rng.permutation(len(eligible))
        picked = [int(eligible[p]) for p in perm[: window_size - 1]]
    if n > 1:
        picked = sorted(picked + [n - 1, n - 2])
    return picked

"""Interactive replay frontend (reference src/tools/visualizer_util.py:204).

The reference's ``SLAMFrontend`` runs an Open3D window in a child
process fed through a queue: the driver pushes per-frame estimated/GT
poses and mesh-swap events, the window animates growing trajectories
(red = estimated, green = ground truth, README.md:128), camera actors,
and the latest culled mesh.

This is the same process + queue design with the display backend made
pluggable, because TPU pods are headless by default:

  * ``open3d``      — interactive window with an animation callback
                      (used automatically when open3d imports and a
                      display exists; API-compatible with the
                      reference's frontend)
  * ``matplotlib``  — interactive 2-D top-view window (no open3d
                      dependency; needs a GUI matplotlib backend)
  * ``headless``    — records frames to ``vis/`` exactly like
                      ``visualizer.py`` (always available)
  * ``mock``        — in-process recorder for tests

``visualizer.py --interactive`` drives it; the in-loop hook
(``SLAMSystem.on_map_done``) can too.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import queue as _queue


def pick_backend(requested: str = "auto") -> str:
    """Resolve the display backend. ``auto`` prefers open3d, then an
    interactive matplotlib, then headless frame recording."""
    if requested != "auto":
        return requested
    have_display = bool(os.environ.get("DISPLAY")
                        or os.environ.get("WAYLAND_DISPLAY"))
    try:
        import open3d  # noqa: F401
        if have_display:
            return "open3d"
    except Exception:
        pass
    if have_display:
        try:
            import matplotlib
            if matplotlib.get_backend().lower() not in ("agg", "pdf", "svg"):
                return "matplotlib"
        except Exception:
            pass
    return "headless"


class SLAMFrontend:
    """Child-process visualization fed by a queue (reference
    visualizer_util.py:204-235: ``start``/``update_pose``/``update_mesh``
    /``join``; same call surface so driver code ports 1:1)."""

    def __init__(self, output: str, init_pose=None, cam_scale: float = 0.1,
                 save_rendering: bool = False, near: int = 0,
                 estimate_c2w_list=None, gt_c2w_list=None,
                 backend: str = "auto"):
        self.queue: mp.Queue = mp.Queue()
        self.output = output
        self.backend = pick_backend(backend)
        self.save_rendering = save_rendering
        self._mock_events: list = []
        self._proc = None

    # -- driver-side API (reference visualizer_util.py:214-232) --------

    def start(self) -> "SLAMFrontend":
        if self.backend == "mock":
            return self
        self._proc = mp.Process(
            target=_frontend_loop,
            args=(self.queue, self.backend, self.output,
                  self.save_rendering))
        self._proc.daemon = True
        self._proc.start()
        return self

    def update_pose(self, index: int, pose, gt_pose=None) -> None:
        import numpy as np
        msg = ("pose", int(index), np.asarray(pose),
               None if gt_pose is None else np.asarray(gt_pose))
        self._push(msg)

    def update_mesh(self, path: str) -> None:
        self._push(("mesh", str(path)))

    def join(self) -> None:
        self._push(("close",))
        if self._proc is not None:
            self._proc.join(timeout=30)
            if self._proc.is_alive():
                self._proc.terminate()

    def _push(self, msg) -> None:
        if self.backend == "mock":
            self._mock_events.append(msg)
        else:
            self.queue.put(msg)


def _frontend_loop(q: mp.Queue, backend: str, output: str,
                   save_rendering: bool) -> None:
    """Child process: drain the queue, hand events to the backend."""
    if backend == "open3d":
        _open3d_loop(q, output, save_rendering)
    elif backend == "matplotlib":
        _matplotlib_loop(q, output)
    else:
        _headless_loop(q, output)


def _drain(q: mp.Queue, block: bool):
    try:
        return q.get(block=block, timeout=0.05 if block else None)
    except _queue.Empty:
        return None


def _open3d_loop(q: mp.Queue, output: str, save_rendering: bool) -> None:
    """Open3D animation-callback window (reference draw_trajectory,
    visualizer_util.py:64-140): growing red/green trajectory line sets,
    a camera actor at the newest pose, meshes swapped in place."""
    import numpy as np
    import open3d as o3d

    vis = o3d.visualization.Visualizer()
    vis.create_window(window_name="myslam_tpu", width=1280, height=720)
    state = {"est": [], "gt": [], "mesh": None, "mesh_geom": None,
             "traj": None, "gt_traj": None, "done": False, "i": 0}

    def make_lines(points, color):
        if len(points) < 2:
            return None
        ls = o3d.geometry.LineSet()
        ls.points = o3d.utility.Vector3dVector(np.asarray(points))
        ls.lines = o3d.utility.Vector2iVector(
            [[i, i + 1] for i in range(len(points) - 1)])
        ls.colors = o3d.utility.Vector3dVector(
            [color] * (len(points) - 1))
        return ls

    def tick(vis):
        msg = _drain(q, block=False)
        if msg is None:
            return False
        kind = msg[0]
        if kind == "close":
            state["done"] = True
            vis.close()
            return False
        if kind == "mesh":
            m = o3d.io.read_triangle_mesh(msg[1])
            m.compute_vertex_normals()
            if state["mesh_geom"] is not None:
                vis.remove_geometry(state["mesh_geom"], False)
            vis.add_geometry(m, reset_bounding_box=state["mesh_geom"]
                             is None)
            state["mesh_geom"] = m
        elif kind == "pose":
            _, i, est, gt = msg
            state["est"].append(est[:3, 3])
            if gt is not None:
                state["gt"].append(gt[:3, 3])
            for key_, color in (("traj", [1.0, 0.0, 0.0]),
                                ("gt_traj", [0.0, 1.0, 0.0])):
                pts = state["est" if key_ == "traj" else "gt"]
                ls = make_lines(pts, color)
                if ls is None:
                    continue
                if state[key_] is not None:
                    vis.remove_geometry(state[key_], False)
                vis.add_geometry(ls, reset_bounding_box=False)
                state[key_] = ls
            if save_rendering:
                os.makedirs(os.path.join(output, "vis"), exist_ok=True)
                vis.capture_screen_image(
                    os.path.join(output, "vis", f"{i:05d}.jpg"))
        return True

    vis.register_animation_callback(tick)
    vis.run()
    vis.destroy_window()


def _matplotlib_loop(q: mp.Queue, output: str) -> None:
    """Interactive matplotlib fallback: top-view trajectory animation
    without an open3d dependency."""
    import matplotlib.pyplot as plt

    plt.ion()
    fig, ax = plt.subplots(figsize=(7, 7))
    est_x, est_y, gt_x, gt_y = [], [], [], []
    (l_est,) = ax.plot([], [], "-", color="red", label="estimated")
    (l_gt,) = ax.plot([], [], "-", color="green", label="ground truth")
    ax.legend(loc="upper right")
    ax.set_aspect("equal")
    while True:
        msg = _drain(q, block=True)
        if msg is None:
            plt.pause(0.01)
            continue
        if msg[0] == "close":
            break
        if msg[0] == "pose":
            _, i, est, gt = msg
            est_x.append(est[0, 3])
            est_y.append(est[1, 3])
            l_est.set_data(est_x, est_y)
            if gt is not None:
                gt_x.append(gt[0, 3])
                gt_y.append(gt[1, 3])
                l_gt.set_data(gt_x, gt_y)
            ax.relim()
            ax.autoscale_view()
            ax.set_title(f"frame {i}")
            fig.canvas.draw_idle()
            plt.pause(0.001)
    plt.ioff()
    plt.close(fig)


def _headless_loop(q: mp.Queue, output: str) -> None:
    """No display: record the same events as numbered top-view frames
    under ``{output}/vis`` (what visualizer.py renders offline)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    vis_dir = os.path.join(output, "vis")
    os.makedirs(vis_dir, exist_ok=True)
    est, gt = [], []
    n_rx = 0
    last_i = 0

    def _render_traj(est, gt, vis_dir, i):
        fig, ax = plt.subplots(figsize=(6, 6))
        if len(est) > 1:
            ax.plot([p[0] for p in est], [p[1] for p in est], "-",
                    color="red", label="estimated")
        if len(gt) > 1:
            ax.plot([p[0] for p in gt], [p[1] for p in gt], "-",
                    color="green", label="ground truth")
        ax.legend(loc="upper right")
        ax.set_title(f"frame {i}")
        fig.savefig(os.path.join(vis_dir, f"live_{i:05d}.jpg"), dpi=80)
        plt.close(fig)

    while True:
        msg = _drain(q, block=True)
        if msg is None:
            continue
        if msg[0] == "close":
            # Always leave a final frame: with driver --every values
            # that don't divide the render stride, the last received
            # pose may not have triggered a render.
            if est and n_rx % 10 != 1:
                _render_traj(est, gt, vis_dir, last_i)
            break
        if msg[0] == "pose":
            _, i, e, g = msg
            est.append(e[:3, 3])
            if g is not None:
                gt.append(g[:3, 3])
            n_rx += 1
            last_i = int(i)
            # Render every 10th RECEIVED event (counted locally): the
            # driver's frame index i arrives pre-strided (--every N), so
            # keying off i % 10 drops most output when N doesn't
            # divide 10 (e.g. --every 7 -> i = 0, 7, 14, ...).
            if n_rx % 10 == 1:
                _render_traj(est, gt, vis_dir, i)

"""SLAM orchestration: the tracking/mapping interleave on one host.

The reference runs tracker and mapper as two OS processes sharing GPU
memory, synchronized by busy-wait polling so that, per every_frame-sized
group, the mapper maps frame k before the tracker advances past k+1
(reference src/ESLAM.py:246-260, src/Tracker.py:264-267,
src/Mapper.py:387-397).  The effective serialized order is:

    map(0) | track(1..E) map(E) | track(E+1..2E) map(2E) | ... map(last)

This scheduler executes exactly that order in one thread: every step is a
single jitted device program, the map snapshot the tracker consumes is
always the newest (the reference tolerates a stale one), and all shared
state lives in explicit pytrees/host arrays instead of shared memory.
"""

from __future__ import annotations

import json
import os
import time
import jax
import jax.numpy as jnp
import numpy as np

from myslam_tpu.engine.camera import Camera
from myslam_tpu.engine.keyframes import (
    KeyframeStore,
    make_window_selector,
)
from myslam_tpu.engine.mapper import make_frame_mapper
from myslam_tpu.engine.tracker import make_frame_tracker, make_group_tracker
from myslam_tpu.models.decoders import init_decoder_params
from myslam_tpu.models.planes import make_layout, init_map_state
from myslam_tpu.render.renderer import SceneGeometry
from myslam_tpu.utils.datasets import (
    PacketPrefetcher,
    build_packet,
    get_dataset,
)
from myslam_tpu.utils.logger import save_checkpoint
from myslam_tpu.utils.mesher import Mesher
from myslam_tpu.utils.visualizer import FrameVisualizer


def compute_bound(cfg: dict) -> np.ndarray:
    """Scene bound with upper edge rounded up to bound_dividable.

    Reference src/ESLAM.py:159-172.
    """
    scale = cfg.get("scale", 1)
    bound = np.array(cfg["mapping"]["bound"], dtype=np.float64) * scale
    div = cfg["planes_res"]["bound_dividable"]
    bound[:, 1] = (
        ((bound[:, 1] - bound[:, 0]) / div).astype(int) + 1
    ) * div + bound[:, 0]
    return bound.astype(np.float32)


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: the SLAM programs are large
    (first compile 20-60 s each) but identical across runs of the same
    config, so cache them on disk.  Opt-out: MYSLAM_JAX_CACHE=0."""
    flag = os.environ.get("MYSLAM_JAX_CACHE", "1")
    if flag == "0" or os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(repo, ".jax_cache") if flag == "1" else flag
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs


class SLAMSystem:
    """Owns scene state and drives the tracking/mapping loop."""

    def __init__(self, cfg: dict, input_folder: str | None = None,
                 output: str | None = None, seed: int = 0):
        enable_compilation_cache()
        self.cfg = cfg
        self.output = output or cfg["data"]["output"]
        os.makedirs(self.output, exist_ok=True)
        os.makedirs(os.path.join(self.output, "ckpts"), exist_ok=True)
        os.makedirs(os.path.join(self.output, "mesh"), exist_ok=True)

        self.verbose = cfg.get("verbose", False)
        self.cam = Camera.from_cfg(cfg)
        self.bound = compute_bound(cfg)
        self.truncation = cfg["model"]["truncation"]

        c_dim = cfg["model"]["c_dim"]
        pres, cres = cfg["planes_res"], cfg["c_planes_res"]
        self.sdf_layout = make_layout(
            self.bound, [pres["coarse"], pres["fine"]], c_dim)
        self.color_layout = make_layout(
            self.bound, [cres["coarse"], cres["fine"]], c_dim)
        r = cfg["rendering"]
        self.scene = SceneGeometry(
            sdf_layout=self.sdf_layout,
            color_layout=self.color_layout,
            bound=tuple(map(tuple, self.bound.tolist())),
            truncation=float(self.truncation),
            n_stratified=int(r["n_stratified"]),
            n_importance=int(r["n_importance"]),
            perturb=bool(r["perturb"]),
            color_topk=int(r.get("color_topk", 0)),
        )

        self.seed = seed
        self.key = jax.random.PRNGKey(seed)
        self.rng = np.random.default_rng(seed)
        kd, km = jax.random.split(self.key)
        decoder = init_decoder_params(
            kd, c_dim=c_dim, beta_init=10.0,
        )
        self.map_state = init_map_state(
            km, self.sdf_layout, self.color_layout, decoder)

        self.dataset = get_dataset(cfg, input_folder)
        self.n_img = len(self.dataset)

        m = cfg["mapping"]
        self.every_frame = int(m["every_frame"])
        self.keyframe_every = int(m["keyframe_every"])
        self.window_size = int(m["mapping_window_size"])
        self.joint_opt_enabled = bool(m["joint_opt"])
        self.keyframe_selection_method = m.get(
            "keyframe_selection_method", "overlap")
        self.gt_camera = bool(cfg["tracking"].get("gt_camera", False))
        self.const_speed = bool(
            cfg["tracking"].get("const_speed_assumption", True))

        # Multi-device scale-out (SURVEY §2.2/§5.7/§5.8), config-driven:
        #   parallel.devices     — ray data-parallelism (pixel batches
        #                          sharded, map/pose grads psum'd over ICI)
        #   parallel.map_shards  — map-block sharding: plane atlases
        #                          band-partitioned across the mesh with
        #                          halo exchange (maps beyond one chip)
        #   parallel.kf_shards   — keyframe-partitioned BA: imagery and
        #                          ray work sharded by window slot
        # 0 means "all visible devices".
        par = cfg.get("parallel", {}) or {}
        # Cross-process (multi-host): when run.py wired this process into
        # a jax.distributed runtime (run.py --nproc/--procid/--coordinator
        # or --launch N), jax.devices() spans every process, the SAME
        # config meshes below cross OS-process boundaries, and every
        # process drives this scheduler with identical host code — the
        # per-frame programs are SPMD over the global mesh, with the
        # psums/ppermutes riding the interconnect.  The reference's
        # counterpart is two processes sharing one GPU's memory
        # (src/ESLAM.py:246-260); here it is N hosts sharing nothing.
        self.n_proc = jax.process_count()
        self.proc0 = jax.process_index() == 0
        self._repl = None  # replicated NamedSharding over the global mesh
        self._gather_fn = None  # cached jitted all-gather (_host_value)

        def _n(name):
            v = int(par.get(name, 1))
            return len(jax.devices()) if v == 0 else v

        n_dev = _n("devices")
        self.map_shards = _n("map_shards")
        self.kf_shards = _n("kf_shards")
        # parallel.pipeline — track || map PIPELINE over disjoint device
        # sets (the reference's core concurrency property, generalized:
        # src/ESLAM.py:246-260 overlaps the tracker's wall-clock with the
        # mapper's via 2 processes + a tolerated-stale shared map,
        # src/Tracker.py:212-234).  Here the fused every_frame tracking
        # group runs on the track submesh against the newest FULLY
        # TRANSFERRED map snapshot while the mapping program for the
        # previous boundary still executes on the map submesh; steady
        # group wall becomes max(track_group, map_step).  Composes with
        # ray DP inside each submesh (pipeline_track_devices /
        # pipeline_map_devices; defaults 1 / rest).
        self.pipeline = bool(par.get("pipeline", False))
        if self.pipeline and sum(
                x > 1 for x in (n_dev, self.map_shards, self.kf_shards)):
            raise ValueError(
                "parallel.pipeline is its own mode (it composes ray DP "
                "internally); don't combine with devices/map_shards/"
                "kf_shards")
        # kf_shards x devices COMPOSE into a 2-axis ('kf', 'dp') mesh:
        # imagery shards over 'kf'; each kf row's ray budget splits over
        # its 'dp' columns, and every loss/grad psum reduces over both
        # axes (distributed_ba.make_kf_frame_mapper).  This lifts pure
        # ray-DP's gradient-ring saturation (SCALING.md: the ring term
        # is the model's n->inf cap) without giving up imagery locality.
        self.composed_kf_dp = n_dev > 1 and self.kf_shards > 1
        n_parallel_axes = sum(
            x > 1 for x in (n_dev, self.map_shards, self.kf_shards))
        if n_parallel_axes > 1 and not (
                n_parallel_axes == 2 and self.composed_kf_dp):
            raise ValueError(
                "parallel.map_shards composes with nothing; the "
                "supported combined mesh is kf_shards x devices "
                "(keyframe-sharded BA with ray DP inside each shard)")
        self.ray_sharding = None
        self.mesh = None
        self.sharded_geom = None
        self._map_banded = None  # banded view (map_shards>1), lazily built
        self._track_sharding = None  # pipeline: tracker submesh ray DP
        if self.pipeline:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
            devs = jax.devices()
            nT = int(par.get("pipeline_track_devices", 1))
            nM = int(par.get("pipeline_map_devices", 0)) or (len(devs) - nT)
            if nT < 1 or nM < 1 or nT + nM > len(devs):
                raise ValueError(
                    f"parallel.pipeline needs track+map devices <= "
                    f"{len(devs)} visible (got {nT}+{nM})")
            self.mesh_T = Mesh(np.array(devs[:nT]), ("dp",))
            self.mesh_M = Mesh(np.array(devs[nT:nT + nM]), ("dp",))
            self._repl_T = NamedSharding(self.mesh_T, P())
            self._repl_M = NamedSharding(self.mesh_M, P())
            if nT > 1:
                self._track_sharding = NamedSharding(self.mesh_T, P("dp"))
            if nM > 1:
                self.ray_sharding = NamedSharding(self.mesh_M, P("dp"))
            self.mesh = self.mesh_M
        self.opt_sharding = None
        self.dp_mesh = None  # explicit-collective (shard_map) ray DP
        # parallel.dp_impl: "shardmap" (default) runs the mapping scan
        # under shard_map with ONE psum of the gradient pytree per
        # iteration — the wire volume the scaling model assumes
        # (tools/validate_scaling.py: ratio 1.00).  "spmd" is the
        # with_sharding_constraint path, kept for comparison: the SPMD
        # partitioner reduces each partial scatter-gradient separately
        # (measured ~12x the wire volume).
        self.dp_impl = str(par.get("dp_impl", "shardmap")).lower()
        if self.pipeline and self.dp_impl == "shardmap" \
                and self.ray_sharding is not None:
            # pipeline's map-submesh ray DP: same explicit-collective scan
            self.dp_mesh = self.mesh_M
        if n_dev > 1 and not self.composed_kf_dp:
            from myslam_tpu.parallel.mesh import make_mesh, ray_dp_sharding
            self.mesh = make_mesh(n_dev)
            if self.dp_impl == "shardmap":
                self.dp_mesh = self.mesh
                # Tracking (and the host_staged window mapper) keep the
                # constraint-based sharding: their collectives are a
                # 7-float pose gradient, where partitioner placement is
                # already minimal.
                self.ray_sharding = ray_dp_sharding(self.mesh)
            else:
                self.ray_sharding = ray_dp_sharding(self.mesh)
                if bool(par.get("zero_opt", True)):
                    # ZeRO-style optimizer partitioning (see
                    # mapper.make_row_sharder): row-shards the Adam
                    # moments under the spmd impl.  (The dense Adam
                    # update measures 0.14 ms/iter replicated — under
                    # shardmap it stays replicated and negligible.)
                    from jax.sharding import NamedSharding, \
                        PartitionSpec as P
                    self.opt_sharding = NamedSharding(
                        self.mesh, P("dp", None))
        if self.map_shards > 1:
            from jax.sharding import Mesh
            from myslam_tpu.parallel.sharded_engine import ShardedMapGeometry
            self.mesh = Mesh(
                np.array(jax.devices()[:self.map_shards]), ("map",))
            self.sharded_geom = ShardedMapGeometry(
                self.mesh, self.scene,
                quad_dtype=(jnp.bfloat16 if bool(
                    cfg["mapping"].get("map_bf16", False)) else None))
        if self.kf_shards > 1:
            from jax.sharding import Mesh
            if self.composed_kf_dp:
                need = self.kf_shards * n_dev
                devs = jax.devices()
                if need > len(devs):
                    raise ValueError(
                        f"kf_shards x devices = {self.kf_shards} x "
                        f"{n_dev} needs {need} devices, "
                        f"{len(devs)} visible")
                self.mesh = Mesh(
                    np.array(devs[:need]).reshape(
                        self.kf_shards, n_dev), ("kf", "dp"))
            else:
                self.mesh = Mesh(
                    np.array(jax.devices()[:self.kf_shards]), ("kf",))

        if self.n_proc > 1:
            # Supported cross-process modes: ray DP (shard_map psum per
            # iteration) and keyframe-sharded BA — the two the parity
            # harness validates (tests/test_product_multiproc.py).
            if self.pipeline or self.map_shards > 1:
                raise ValueError(
                    "multi-process runs support parallel.devices (ray "
                    "DP) or parallel.kf_shards; pipeline/map_shards are "
                    "single-process modes")
            if self.mesh is None or (
                    self.kf_shards <= 1 and self.dp_mesh is None):
                raise ValueError(
                    "multi-process runs need parallel.devices: 0 (ray "
                    "DP over all global devices, dp_impl shardmap) or "
                    "parallel.kf_shards: 0")
            # The configured mesh must span every process: a device
            # count smaller than the job (e.g. kf_shards: 2 on a
            # 2-process x 2-device gang) builds a mesh wholly on
            # process 0's devices — the other processes would launch
            # nothing and crash at their first cross-process fetch.
            mesh_procs = {d.process_index
                          for d in np.asarray(self.mesh.devices).ravel()}
            if mesh_procs != set(range(self.n_proc)):
                raise ValueError(
                    f"multi-process runs need the parallel mesh to span "
                    f"every process: the configured mesh covers "
                    f"process(es) {sorted(mesh_procs)} of {self.n_proc} "
                    f"— use kf_shards/devices: 0 (all global devices) "
                    f"or counts that consume all "
                    f"{len(jax.devices())} global devices")
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._repl = NamedSharding(self.mesh, P())
            # Long-lived state lives GLOBALLY on the mesh: every process
            # holds the replicated leaves' local copies; per-frame host
            # inputs enter through _stage_in.
            self.map_state = self._put(self.map_state)

        mapped = sorted(set(
            list(range(0, self.n_img, self.every_frame)) + [self.n_img - 1]))
        n_keyframes = sum(1 for i in mapped if i % self.keyframe_every == 0)
        capacity = n_keyframes + 2
        # Row-aligned pixel gathers (ops/pixel_gather.py) need the
        # flattened imagery length divisible by the 128-lane row; pad
        # capacity to the smallest multiple that makes it so (1 for all
        # standard camera sizes; e.g. 8 for ScanNet's 468x620 crop).
        import math
        row_pad = 128 // math.gcd(self.cam.H * self.cam.W, 128)
        pad_to = row_pad
        if self.kf_shards > 1:
            # Slot axis sharded P('kf'): capacity also padded to the
            # mesh, and the imagery buffers placed so each device holds
            # only its own keyframes (multi-host analog: per-host frames).
            pad_to = self.kf_shards * row_pad // math.gcd(
                self.kf_shards, row_pad)
        capacity = -(-capacity // pad_to) * pad_to
        # keyframe_device (reference configs/ESLAM.yaml:4): 'cpu' maps
        # to the PACKED device store (u8/u16 quantized in HBM — the
        # TPU-native answer to the reference's memory motivation; half
        # the fp16/fp32 store's bytes, no per-frame staging, composes
        # with every parallel mode).  'host_staged' keeps imagery truly
        # host-side for stores that exceed HBM even packed (costs a
        # selection round-trip + window upload per mapped frame).
        self.keyframe_device = str(
            cfg.get("keyframe_device", "device")).lower()
        host_kf = self.keyframe_device in ("host", "host_staged")
        if host_kf and (self.kf_shards > 1 or self.map_shards > 1
                        or self.pipeline or self.n_proc > 1):
            raise ValueError(
                "keyframe_device: host_staged composes with ray DP only "
                "(single-process); use 'packed' (what 'cpu' maps to) "
                "with kf/map sharding, pipeline, or multi-process — the "
                "quantized device store is the scaling path there")
        self.store = KeyframeStore(
            capacity, self.cam,
            device="host_staged" if host_kf else self.keyframe_device)
        self.scratch_slot = self.store.capacity - 1
        self.w_max = self.window_size + 2  # selected + last two + current
        if host_kf:
            # Device line-cache: the mapped frame reads pixels straight
            # from this slab and uploads only non-resident slots
            # (KeyframeStore.init_cache).  Needs >= w_max + 1 lines
            # (window + scratch); more lines = fewer re-uploads after
            # eviction.  ~4 MB/line at 680x1200.
            lines = max(self.w_max + 1,
                        min(int(m.get("host_cache_lines", 64)),
                            self.store.capacity + 1))
            self.store.init_cache(lines)
        if self.kf_shards > 1:
            self._place_store_sharded()
        elif self._repl is not None:
            # dp cross-process: window imagery replicated on the global
            # mesh (the mini-loop semantics, parallel/multiproc.py).
            self.store.colors = self._put(self.store.colors)
            self.store.depths = self._put(self.store.depths)
        if self._repl is not None:
            self.store.est_c2w = self._put(self.store.est_c2w)
            self.store.gt_c2w = self._put(self.store.gt_c2w)

        track_sharding = (self._track_sharding if self.pipeline
                          else self.ray_sharding)
        self.tracker = make_frame_tracker(cfg, self.scene, self.cam,
                                          ray_sharding=track_sharding)
        # Between two mapped frames the map is frozen, so the every_frame
        # group of tracked frames fuses into ONE device program (quads
        # packed once, one upload, one dispatch) — see make_group_tracker.
        # The per-frame tracker remains for ragged tail groups.
        self.group_tracker = None
        if self.every_frame > 1 and not self.gt_camera:
            self.group_tracker = make_group_tracker(
                cfg, self.scene, self.cam, self.every_frame,
                ray_sharding=track_sharding)
        self._track_buf: list = []
        self._iters_first = int(m["iters_first"])
        self._iters = int(m["iters"])
        self._lr_first_factor = float(m["lr_first_factor"])
        self._lr_factor = float(m["lr_factor"])
        self._select_window = make_window_selector(
            self.cam, self.store.capacity, self.window_size, self.w_max,
            self.scratch_slot, method=self.keyframe_selection_method)
        # Host-keyframe mode runs selection as its own program (the fused
        # mapper's in-program selection needs device-resident imagery);
        # the key fold matches the fused path for draw-for-draw parity.
        def _select_host(kf_est, count, est_dev, idx, d_u16, inv_q, key, jo):
            slot_kf, n_slots, pose_mask = self._select_window(
                kf_est, count, est_dev[idx],
                d_u16.astype(jnp.float32) * inv_q,
                jax.random.fold_in(key, 0x7FFFFFFF), jo)
            # Everything the HOST needs (cache staging) as one packed
            # vector: a single ~34 ms tunnel round-trip per mapped frame
            # instead of two.
            host_vec = jnp.concatenate(
                [slot_kf, n_slots[None].astype(jnp.int32)])
            return host_vec, slot_kf, n_slots, pose_mask

        self._select_host_jit = jax.jit(_select_host)
        # Mapper variants by importance-branch only: the first-frame and
        # steady schedules share each variant's compiled program (iteration
        # count is a host chunk loop; lr factor is traced).  The
        # importance-free variant is used whenever no stored frame has
        # depth holes.  Each variant is the WHOLE mapped frame fused into
        # one program per chunk (selection, iterations, write-back,
        # admission) — see make_frame_mapper.
        self._mappers = {}
        for imp in (False, True):
            if self.store.host_mode:
                from myslam_tpu.engine.mapper import (
                    make_window_frame_mapper,
                )
                self._mappers[imp] = make_window_frame_mapper(
                    cfg, self.scene, self.cam, self.w_max,
                    ray_sharding=self.ray_sharding, importance=imp,
                    opt_sharding=self.opt_sharding)
            elif self.sharded_geom is not None:
                from myslam_tpu.parallel.sharded_engine import (
                    make_sharded_frame_mapper,
                )
                self._mappers[imp] = make_sharded_frame_mapper(
                    cfg, self.scene, self.cam, self._select_window,
                    self.w_max, self.scratch_slot, self.sharded_geom,
                    importance=imp, packed=self.store.packed)
            elif self.kf_shards > 1:
                from myslam_tpu.parallel.distributed_ba import (
                    make_kf_frame_mapper,
                )
                self._mappers[imp] = make_kf_frame_mapper(
                    cfg, self.scene, self.cam, self._select_window,
                    self.w_max, self.scratch_slot, self.mesh,
                    importance=imp,
                    pose_solver=str(par.get("pose_solver", "adam")),
                    packed=self.store.packed)
            else:
                self._mappers[imp] = make_frame_mapper(
                    cfg, self.scene, self.cam, self._select_window,
                    self.w_max, self.scratch_slot,
                    importance=imp, ray_sharding=self.ray_sharding,
                    opt_sharding=self.opt_sharding,
                    packed=self.store.packed, dp_mesh=self.dp_mesh)
        # Optimizer-state buffer reused (donated) across mapped frames;
        # values are overwritten by each frame's in-program init.
        self._opt_buf = None

        # Estimated trajectory lives ON DEVICE: per-frame pose writes,
        # tracking initialization and BA window assembly never round-trip
        # to the host (each host fetch through the remote TPU tunnel costs
        # milliseconds).  `estimates` is a synced host view.
        self._est_dev = self._put(
            jnp.zeros((self.n_img, 4, 4), jnp.float32))
        if self.pipeline:
            # Pipeline state split (see parallel.pipeline above):
            #  * self.map_state + keyframe store + self._est_M live on
            #    the MAP submesh (mapper-canonical; est_M accumulates
            #    every tracked pose via a per-group row write plus the
            #    BA refinements — it is the complete trajectory);
            #  * self._est_dev + self._track_map_state live on the TRACK
            #    submesh (tracking-canonical; the snapshot trails the
            #    mapper by one boundary, the reference's tolerated
            #    staleness, src/Tracker.py:212-234).
            # All exchanges are async device_put + tiny row-write
            # programs — the host never blocks, so the two submesh
            # queues genuinely overlap.
            self._place_pipeline_state()
            self._set_rows_M = jax.jit(
                lambda est, idx0, rows: jax.lax.dynamic_update_slice(
                    est, rows, (idx0, jnp.int32(0), jnp.int32(0))),
                donate_argnums=(0,))
            self._get_rows_T = jax.jit(
                lambda est, idx0, n: jax.lax.dynamic_slice(
                    est, (idx0, jnp.int32(0), jnp.int32(0)), (n, 4, 4)),
                static_argnames=("n",))
            self._last_mapped_idx = -1
        self.gt_poses = np.zeros((self.n_img, 4, 4), np.float32)
        self.frame_times: list[float] = []
        self.frame_start_wall: list[float] = []
        self.drain_wall: float = 0.0
        # Benchmarking: drain the device queue after this frame index so a
        # measurement window starting at the next frame contains no queued
        # backlog (dispatch is async; the first-frame mapping alone queues
        # ~30 s of device work).
        self.sync_after_frame: int | None = None
        self.metrics_path = os.path.join(self.output, "metrics.jsonl")
        # Cross-process: every process runs the identical host loop (the
        # deferred-fetch records read replicated arrays, a local copy),
        # but only process 0 owns the output files.
        self._metrics_f = (open(self.metrics_path, "a") if self.proc0
                           else open(os.devnull, "w"))
        self._pending_metrics: list[dict] = []
        # Compile wall is a first-class metric (see utils/compilelog.py):
        # every expensive trace/lower/compile lands in metrics.jsonl, and
        # compile_secs totals the real backend compiles (cache hits
        # excluded) for bench.py to report.
        from myslam_tpu.utils import compilelog
        compilelog.install()
        # Records are process-global; discard any left by a previous
        # SLAMSystem in this process (serial-vs-pipeline tests, bench
        # followed by in-process tools) so they don't pollute this
        # instance's metrics.jsonl and compile_secs.
        compilelog.drain()
        self._compilelog = compilelog
        self.compile_secs = 0.0
        # Each flush costs one ~90 ms tunnel round-trip for the batched
        # scalar fetch; amortize it over many frames.
        self.metrics_flush_every = 200

        self.mesher = Mesher(cfg, self.scene, self.cam)
        self.mesh_freq = int(m["mesh_freq"])
        self.ckpt_freq = int(m["ckpt_freq"])
        self.eval_rec = bool(cfg["meshing"].get("eval_rec", False))
        self.no_mesh_on_first_frame = bool(m.get("no_mesh_on_first_frame", True))
        self.no_log_on_first_frame = bool(m.get("no_log_on_first_frame", True))
        self.no_vis_on_first_frame = bool(m.get("no_vis_on_first_frame", True))
        t = cfg["tracking"]
        # Cross-process: panel rendering is a per-frame debug feature
        # with no multi-host value; disabling it UNIFORMLY keeps every
        # process's PRNG key stream aligned (each panel consumes a key).
        NEVER = 10 ** 9
        self.track_vis = FrameVisualizer(
            t["vis_freq"] if self.n_proc == 1 else NEVER,
            t["vis_inside_freq"],
            os.path.join(self.output, "tracking_vis"),
            self.scene, self.cam, self.verbose)
        self.map_vis = FrameVisualizer(
            m["vis_freq"] if self.n_proc == 1 else NEVER,
            m["vis_inside_freq"],
            os.path.join(self.output, "mapping_vis"),
            self.scene, self.cam, self.verbose)
        # Depth maps kept per frame for final mesh culling (host, fp16).
        self.cull_with_estimates = True

        # Optional hooks (wired by run.py / tools): called as f(self, idx)
        self.on_map_done = None
        self.input_folder = input_folder

    # -- internals ---------------------------------------------------------

    def _put(self, x):
        """Place a pytree of host/uncommitted arrays on the global mesh,
        replicated.  Identity in single-process runs.  (COMMITTED local
        device arrays cannot be re-placed across processes — the CPU/gloo
        backend has no cross-host transfer — so multi-process inputs stay
        host-side until this call; see run_loop's stage flag.)"""
        if self._repl is None:
            return x
        return jax.device_put(x, self._repl)

    def _stage_in(self, x):
        """Per-frame input placement: plain asarray single-process (the
        prefetch thread already staged it); replicated device_put from
        host numpy across processes."""
        if self._repl is None:
            return jnp.asarray(x)
        return jax.device_put(np.asarray(x), self._repl)

    def _host_value(self, x):
        """Fetch a (possibly process-sharded) array's full value to host
        numpy.  Non-addressable shards are all-gathered first — a
        collective every process must enter (call this from ALL
        processes, in the same order)."""
        if x is None or isinstance(x, np.ndarray):
            return x
        if self._repl is not None and not x.is_fully_addressable:
            if self._gather_fn is None:
                # One cached wrapper: a fresh jax.jit(lambda ...) per
                # call would defeat jit's per-callable cache and
                # re-trace the gather for every checkpoint leaf.
                self._gather_fn = jax.jit(
                    lambda y: y, out_shardings=self._repl)
            x = self._gather_fn(x)
        return np.asarray(x)

    @property
    def estimates(self) -> np.ndarray:
        """Host view of the estimated trajectory (blocking device fetch)."""
        return np.asarray(self._est_dev)

    @property
    def _tracking_map(self):
        """The map snapshot tracking renders against: in pipeline mode
        the track-submesh copy (one boundary stale, the reference's
        tolerated staleness); otherwise the canonical map."""
        return self._track_map_state if self.pipeline else self.map_state

    @estimates.setter
    def estimates(self, value) -> None:
        self._est_dev = jnp.asarray(value)

    def _next_key(self) -> jax.Array:
        # The split itself stays process-local (deterministic: every
        # process computes the same stream); the consumed key is placed
        # on the global mesh so programs can take it cross-process.
        self.key, sub = jax.random.split(self.key)
        return self._put(sub)

    def _log_metrics(self, record: dict) -> None:
        """Queue a metrics record.  Values may be plain numbers, device
        scalars, or ``(device_array, index)`` tuples — the latter defer
        even the slice to flush time, so recording costs ZERO dispatches
        (an eager ``arr[i]`` outside jit is its own device program, ~ms of
        tunnel latency each)."""
        self._pending_metrics.append(record)
        if len(self._pending_metrics) >= self.metrics_flush_every:
            self._flush_metrics()

    def _flush_metrics(self) -> None:
        for rec in self._compilelog.drain():
            if rec["compile_phase"] == "backend_compile":
                self.compile_secs += rec["secs"]
            self._metrics_f.write(json.dumps(rec) + "\n")
        if not self._pending_metrics:
            self._metrics_f.flush()
            return
        # Pipelined fetch: start every array's D2H copy, then resolve.
        arrays: dict[int, jnp.ndarray] = {}
        for rec in self._pending_metrics:
            for v in rec.values():
                a = v[0] if isinstance(v, tuple) else v
                if isinstance(a, jnp.ndarray):
                    arrays.setdefault(id(a), a)
        for a in arrays.values():
            try:
                a.copy_to_host_async()
            except Exception:
                pass
        host = {i: np.asarray(a) for i, a in arrays.items()}
        for rec in self._pending_metrics:
            for k, v in rec.items():
                if isinstance(v, tuple) and isinstance(v[0], jnp.ndarray):
                    rec[k] = float(host[id(v[0])][v[1]])
                elif isinstance(v, jnp.ndarray):
                    rec[k] = float(host[id(v)])
            self._metrics_f.write(json.dumps(rec) + "\n")
        self._metrics_f.flush()
        self._pending_metrics = []

    def _place_pipeline_state(self) -> None:
        """Place/replace pipeline state on its submeshes: map state +
        keyframe store + est_M on the map submesh; trajectory + track
        snapshot on the track submesh.  Used at init and after resume."""
        self.map_state = jax.device_put(self.map_state, self._repl_M)
        self._track_map_state = jax.device_put(self.map_state, self._repl_T)
        self._est_dev = jax.device_put(self._est_dev, self._repl_T)
        self._est_M = jax.device_put(self._est_dev, self._repl_M)
        self.store.colors = jax.device_put(self.store.colors, self._repl_M)
        self.store.depths = jax.device_put(self.store.depths, self._repl_M)
        self.store.est_c2w = jax.device_put(
            self.store.est_c2w, self._repl_M)
        self.store.gt_c2w = jax.device_put(self.store.gt_c2w, self._repl_M)

    def _place_store_sharded(self) -> None:
        """Place keyframe imagery sharded over the kf mesh axis (slot
        axis): each device/host holds only its own keyframes' pixels."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(self.mesh, P("kf"))
        self.store.colors = jax.device_put(self.store.colors, sh)
        self.store.depths = jax.device_put(self.store.depths, sh)

    def _make_map_vis_hook(self, idx: int, pkt, iters: int):
        """In-loop mapping visualization (vis_inside_freq, reference
        Mapper.py:310, Frame_Visualizer.py:67): the iteration-0 panel is
        rendered against the pre-mapping map at the tracked pose, and the
        chunked mapper's host re-entry emits a panel whenever a chunk
        boundary crosses a multiple of inside_freq (the reference's
        schedules put those multiples only in the 1000-iteration
        first-frame loop).  Returns the on_chunk callback, or None when
        the frame is not a vis frame."""
        if (idx % self.map_vis.freq != 0
                or (idx == 0 and self.no_vis_on_first_frame)
                or pkt.color_u8 is None):
            return None
        from myslam_tpu.core.quaternion import cam_pose_to_matrix

        gt_depth = pkt.depth_u16.astype(np.float32) * pkt.depth_inv_q
        gt_color = pkt.color_u8.astype(np.float32) / 255.0
        self.map_vis.save_imgs(idx, 0, gt_depth, gt_color,
                               self._est_dev[idx], self.map_state,
                               self._next_key())
        f = self.map_vis.inside_freq

        def on_chunk(params, sel, prev_done, done):
            m = (prev_done // f + 1) * f
            if m > done or m >= iters:
                return
            ms_vis = params["map"]
            if self.sharded_geom is not None:
                ms_vis = self.sharded_geom.unshard(ms_vis)
            _, n_slots, _ = sel
            c2w = cam_pose_to_matrix(params["poses"])[int(n_slots) - 1]
            while m <= done and m < iters:
                self.map_vis.save_imgs(idx, int(m), gt_depth, gt_color,
                                       c2w, ms_vis, self._next_key())
                m += f

        return on_chunk

    def _mapper_state(self):
        """The map representation the frame mapper consumes: banded under
        map sharding (lazily derived from the replicated canonical state,
        e.g. after init or resume), the MapState itself otherwise."""
        if self.sharded_geom is None:
            return self.map_state
        if self._map_banded is None:
            self._map_banded = self.sharded_geom.shard(self.map_state)
        return self._map_banded

    def _map_frame(self, idx: int, pkt, first: bool,
                   cur_has_depthless: bool) -> dict:
        """Run one mapped frame (selection + BA + write-back + admission)
        as one fused device program per chunk.  The frame's imagery rides
        in as the packet's staged uint8/uint16 arrays; its estimated pose
        is in self._est_dev[idx]."""
        t0 = time.time()
        joint_opt = self.joint_opt_enabled and (self.store.count > 4)
        admit = idx % self.keyframe_every == 0
        # Conservative (host-known): importance is needed if ANY stored
        # keyframe has depth holes.  For windows that happen to contain
        # only hole-free frames this costs the coarse pass but changes no
        # result (the depth-less branch is selected per-ray by mask).
        needs_importance = cur_has_depthless or any(
            self.store.has_depthless[:self.store.count])
        if self.store.host_mode:
            losses = self._map_frame_host(
                idx, pkt, first, cur_has_depthless, joint_opt, admit,
                needs_importance)
            return self._post_map(idx, losses, t0)
        if self.pipeline:
            losses = self._map_frame_pipeline(
                idx, pkt, first, joint_opt, admit, needs_importance)
            if admit:
                self.store.note_admitted(
                    idx, has_depthless=cur_has_depthless)
            return self._post_map(idx, losses, t0)
        mapper = self._mappers[needs_importance]
        ms_in = self._mapper_state()
        if self._opt_buf is None:
            self._opt_buf = mapper.jit_init(
                {"map": ms_in,
                 "poses": self._put(jnp.zeros((self.w_max, 7),
                                              jnp.float32))})
        iters = self._iters_first if first else self._iters
        on_chunk = self._make_map_vis_hook(idx, pkt, iters)
        (ms_out, self._opt_buf, self._est_dev, self.store.est_c2w,
         self.store.gt_c2w, self.store.colors, self.store.depths,
         losses) = mapper(
            ms_in, self._opt_buf, self._est_dev,
            self.store.est_c2w, self.store.gt_c2w, self.store.colors,
            self.store.depths, self._stage_in(pkt.color_u8),
            self._stage_in(pkt.depth_u16), pkt.depth_inv_q,
            self._stage_in(pkt.gt_c2w), idx, self.store.count,
            self._next_key(),
            iters=iters,
            lr_factor=self._lr_first_factor if first else self._lr_factor,
            joint_opt=joint_opt, admit=admit, on_chunk=on_chunk)
        if self.sharded_geom is not None:
            # Banded state stays canonical for mapping; the replicated
            # view (tracker/visualizer/mesher/checkpoints) is ONE atlas
            # all-gather over ICI per mapped frame.
            self._map_banded = ms_out
            self.map_state = self.sharded_geom.unshard(ms_out)
        else:
            self.map_state = ms_out
        if admit:
            # Buffers were written by the device program; record the slot.
            self.store.note_admitted(idx, has_depthless=cur_has_depthless)
        return self._post_map(idx, losses, t0)

    def _map_frame_pipeline(self, idx, pkt, first, joint_opt, admit,
                            needs_importance):
        """Mapped frame on the MAP submesh, overlapped with tracking.

        Every step here is an async dispatch — the host never blocks, so
        the map program for this boundary executes on the map submesh
        WHILE the next boundary's fused tracking group runs on the track
        submesh (the reference's 2-process overlap, src/ESLAM.py:246-260,
        as two device queues).  Cross-submesh traffic per boundary: the
        group's tracked poses (G x 16 floats, track->map), and one map
        snapshot (the atlases, map->track) for the NEXT tracking group —
        which therefore renders against the PREVIOUS boundary's map, the
        staleness the reference tolerates (src/Tracker.py:212-234)."""
        mapper = self._mappers[needs_importance]

        # 1. Tracked poses since the previous boundary -> mapper-side
        #    trajectory (row write, donated est_M chain).
        start = self._last_mapped_idx + 1 if idx > 0 else 0
        n_rows = idx - start + 1
        rows = self._get_rows_T(self._est_dev, jnp.int32(start), n=n_rows)
        self._est_M = self._set_rows_M(
            self._est_M, jnp.int32(start),
            jax.device_put(rows, self._repl_M))
        self._last_mapped_idx = idx

        # 2. Snapshot for the NEXT tracking group: the map as of the
        #    PREVIOUS boundary (its program may still be running on the
        #    map submesh; the transfer queues behind it, async).
        self._track_map_state = jax.device_put(
            self.map_state, self._repl_T)

        # 3. Dispatch this boundary's mapping program on the map submesh.
        if self._opt_buf is None:
            self._opt_buf = mapper.jit_init(
                {"map": self.map_state,
                 "poses": jnp.zeros((self.w_max, 7), jnp.float32)})
        iters = self._iters_first if first else self._iters
        on_chunk = self._make_map_vis_hook(idx, pkt, iters)
        # device_put handles host numpy (direct H2D to the map submesh)
        # and track-staged device arrays (one submesh hop) alike.
        put = lambda x: jax.device_put(x, self._repl_M)  # noqa: E731
        (ms_out, self._opt_buf, self._est_M, self.store.est_c2w,
         self.store.gt_c2w, self.store.colors, self.store.depths,
         losses) = mapper(
            self.map_state, self._opt_buf, self._est_M,
            self.store.est_c2w, self.store.gt_c2w, self.store.colors,
            self.store.depths, put(pkt.color_u8), put(pkt.depth_u16),
            pkt.depth_inv_q, put(pkt.gt_c2w), idx, self.store.count,
            self._next_key(),
            iters=iters,
            lr_factor=self._lr_first_factor if first else self._lr_factor,
            joint_opt=joint_opt, admit=admit, on_chunk=on_chunk)
        self.map_state = ms_out
        if first:
            # Frame 0: tracking may not start before the first map is
            # built (reference src/ESLAM.py:229-232) — point the track
            # snapshot at map(0)'s output; the first group's tracking
            # program waits on the transfer, exactly that barrier.
            self._track_map_state = jax.device_put(
                self.map_state, self._repl_T)
        return losses

    def _map_frame_host(self, idx, pkt, first, cur_has_depthless,
                        joint_opt, admit, needs_importance):
        """Mapped frame with keyframe_device: host_staged — device-side
        window selection, device line-cache staging of only the
        non-resident slots (usually none), fused BA program reading the
        cache slab, host + scratch-line admission."""
        mapper = self._mappers[needs_importance]
        key = self._next_key()
        sel = self._select_host_jit(
            self.store.est_c2w, jnp.int32(self.store.count),
            self._est_dev, jnp.int32(idx), jnp.asarray(pkt.depth_u16),
            jnp.float32(pkt.depth_inv_q), key,
            jnp.float32(1.0 if joint_opt else 0.0))
        # Kick off the selection fetch now and overlap its tunnel
        # round-trip with the scratch-line upload of the current packet.
        sel[0].copy_to_host_async()
        scratch_line = self.store.stage_scratch(
            pkt.color_u8, pkt.depth_u16, pkt.depth_inv_q)
        host_vec = np.asarray(sel[0])
        slot_kf, n_slots = host_vec[:-1], int(host_vec[-1])
        win_lines = np.full((self.w_max,), scratch_line, np.int32)
        if n_slots > 1:
            win_lines[:n_slots - 1] = self.store.stage_lines(
                slot_kf[:n_slots - 1])

        if self._opt_buf is None:
            self._opt_buf = mapper.jit_init(
                {"map": self.map_state,
                 "poses": jnp.zeros((self.w_max, 7), jnp.float32)})
        iters = self._iters_first if first else self._iters
        on_chunk = self._make_map_vis_hook(idx, pkt, iters)
        (self.map_state, self._opt_buf, self._est_dev, self.store.est_c2w,
         self.store.gt_c2w, losses) = mapper(
            self.map_state, self._opt_buf, self._est_dev,
            self.store.est_c2w, self.store.gt_c2w, sel[1], sel[2],
            sel[3], self.store.cache_colors, self.store.cache_depths,
            self.store.cache_inv_q, jnp.asarray(win_lines),
            jnp.asarray(pkt.gt_c2w), idx,
            self.store.count, key, iters=iters,
            lr_factor=self._lr_first_factor if first else self._lr_factor,
            joint_opt=joint_opt, admit=admit, on_chunk=on_chunk)
        if admit:
            c_np, d_np = pkt.imagery_host()
            pos = self.store.add_host(idx, c_np, d_np, pkt.depth_inv_q,
                                      has_depthless=cur_has_depthless)
            self.store.bind_scratch(pos)
        return losses

    def _post_map(self, idx: int, losses, t0: float) -> dict:
        dt = time.time() - t0

        # Post-mapping bookkeeping at the reference's frequencies
        # (src/Mapper.py:437-457).
        if ((not (idx == 0 and self.no_log_on_first_frame))
                and idx % self.ckpt_freq == 0 and idx != self.n_img - 1):
            # The final checkpoint is written after the loop (run()) so the
            # multi-second device->host state fetch is not billed to the
            # last frame's time.
            self._flush_metrics()
            self._checkpoint(
                os.path.join(self.output, "ckpts", f"{idx:05d}.npz"), idx)
        if (idx % self.mesh_freq == 0) and not (
                idx == 0 and self.no_mesh_on_first_frame):
            if self._repl is None:
                self._extract_and_cull_mesh(
                    os.path.join(self.output, "mesh",
                                 f"{idx:05d}_mesh.ply"), upto=idx + 1)
            elif self.proc0 and self.verbose:
                # Meshing is an offline concern cross-process: extract
                # from the (full-state) checkpoint on one host with
                # tools/final_mesh instead of fanning the marching
                # pipeline over the job.
                print(f"mesh_freq {idx}: skipped in multi-process mode "
                      "(run tools/final_mesh on a checkpoint)")

        if self.verbose:
            print(f"Mapping frame {idx}: loss {float(losses[-1]):.5f} "
                  f"({dt*1e3:.0f} ms)")
        return {"map_loss": (losses, -1), "map_ms": dt * 1e3}

    def _checkpoint(self, path: str, idx: int) -> None:
        """Write a full-state checkpoint.

        Cross-process: the keyframe imagery (process-sharded in kf mode)
        is all-gathered by EVERY process (a collective), fetched to host
        numpy, and only process 0 serializes — numpy inputs keep the
        quantization math in save_checkpoint process-local, so no device
        program is ever entered by one process alone."""
        if self._repl is None:
            save_checkpoint(path, self, idx)
            return
        import jax.tree_util as jtu

        st = self.store
        orig = (st.colors, st.depths, st.est_c2w, st.gt_c2w)
        st.colors = self._host_value(st.colors)
        st.depths = jtu.tree_map(self._host_value, st.depths)
        st.est_c2w = np.asarray(st.est_c2w)  # replicated: local fetch
        st.gt_c2w = np.asarray(st.gt_c2w)
        try:
            if self.proc0:
                save_checkpoint(path, self, idx)
        finally:
            st.colors, st.depths, st.est_c2w, st.gt_c2w = orig

    def _extract_and_cull_mesh(self, path: str, upto: int) -> str:
        """Extract the current mesh and cull it with frames [0, upto)."""
        from myslam_tpu.tools.cull_mesh import cull_mesh

        from myslam_tpu.utils.datasets import Prefetcher

        self.mesher.get_mesh(path, self.map_state, self.store)
        est_np = self.estimates  # one device fetch
        # Prefetch thread: frame loading (procedural datasets re-render
        # depth on host) overlaps the per-frame device-side culling.
        frames = ((d, est_np[idx]) for idx, (c, d, p) in
                  Prefetcher(self.dataset, range(upto)))
        return cull_mesh(path, self.cfg, frames,
                         estimate_c2w_list=est_np[:upto])

    def _maybe_track_vis(self, idx: int, pkt, c2w,
                         iter_poses=None) -> None:
        """Per-iteration tracking panels (reference Frame_Visualizer.py:67,
        Tracker.py:165-167): the map is frozen during tracking, so
        rendering the recorded pre-update pose of iteration k after the
        fact is EXACTLY the reference's in-loop panel for iteration k."""
        if idx % self.track_vis.freq != 0 or pkt.color_u8 is None:
            return
        from myslam_tpu.core.quaternion import cam_pose_to_matrix

        gt_depth = pkt.depth_u16.astype(np.float32) * pkt.depth_inv_q
        gt_color = pkt.color_u8.astype(np.float32) / 255.0
        if iter_poses is None:
            self.track_vis.save_imgs(idx, 0, gt_depth, gt_color, c2w,
                                     self.map_state, self._next_key())
            return
        n_it = int(iter_poses.shape[0])
        c2ws_it = None
        for it in range(0, n_it, self.track_vis.inside_freq):
            if c2ws_it is None:  # one conversion for all emitted panels
                c2ws_it = cam_pose_to_matrix(iter_poses)
            self.track_vis.save_imgs(idx, it, gt_depth, gt_color,
                                     c2ws_it[it], self.map_state,
                                     self._next_key())

    def _run_track_group(self, buf) -> None:
        """Dispatch one fused tracking program for a full every_frame group
        of buffered (idx, packet, metrics-record) triples."""
        t0 = time.time()
        idx0 = buf[0][0]
        # jnp.stack: packets are already device-resident (staged by the
        # prefetch thread), so the group batch assembles on device.
        px_i = self._put(jnp.stack([jnp.asarray(p.px_i)
                                    for _, p, _ in buf]))
        px_j = self._put(jnp.stack([jnp.asarray(p.px_j)
                                    for _, p, _ in buf]))
        px_color = self._put(jnp.stack([jnp.asarray(p.px_color)
                                        for _, p, _ in buf]))
        px_depth = self._put(jnp.stack([jnp.asarray(p.px_depth)
                                        for _, p, _ in buf]))
        (self._est_dev, c2ws, loss_first, loss_best,
         iter_poses) = self.group_tracker(
            self._tracking_map, self._est_dev, jnp.int32(idx0),
            px_i, px_j, px_color, px_depth, self._next_key())
        ms_per_frame = (time.time() - t0) * 1e3 / len(buf)
        for g, (idx, pkt, rec) in enumerate(buf):
            rec["track_loss_first"] = (loss_first, g)
            rec["track_loss_best"] = (loss_best, g)
            rec["track_ms"] = ms_per_frame
            self._maybe_track_vis(idx, pkt, c2ws[g], iter_poses[g])

    def _flush_track_buf(self, open_rec: dict | None = None) -> None:
        """Track all buffered frames (fused when the buffer is a full
        group, per-frame otherwise), then emit their metrics records —
        except ``open_rec``, the current frame's record, which its own
        loop iteration finishes (mapping fields) and logs."""
        buf, self._track_buf = self._track_buf, []
        if not buf:
            return
        if self.group_tracker is not None and len(buf) == self.every_frame:
            self._run_track_group(buf)
        else:
            for idx, pkt, rec in buf:
                rec.update(self._track_frame(idx, pkt))
        for _, _, rec in buf:
            if rec is not open_rec:
                self._log_metrics(rec)

    def _track_frame(self, idx: int, pkt) -> dict:
        t0 = time.time()
        # ONE device program: pose init + 8-iter optimization + trajectory
        # write-back (est_dev donated).
        (self._est_dev, c2w, loss_first, loss_best,
         iter_poses) = self.tracker(
            self._tracking_map, self._est_dev, jnp.int32(idx),
            self._stage_in(pkt.px_i), self._stage_in(pkt.px_j),
            self._stage_in(pkt.px_color), self._stage_in(pkt.px_depth),
            self._next_key())
        self._maybe_track_vis(idx, pkt, c2w, iter_poses)
        dt = time.time() - t0
        return {
            "track_loss_first": loss_first,
            "track_loss_best": loss_best,
            "track_ms": dt * 1e3,
        }

    # -- main loop ---------------------------------------------------------

    def resume(self, ckpt_path: str | None = None) -> int:
        """Restore the newest (or given) checkpoint; returns start frame."""
        from myslam_tpu.utils.logger import latest_checkpoint, load_checkpoint

        path = ckpt_path or latest_checkpoint(
            os.path.join(self.output, "ckpts"))
        if path is None:
            return 0
        start = load_checkpoint(path, self)
        # Checkpoints hold the replicated standard-layout map; the banded
        # view re-derives lazily on the next mapped frame.
        self._map_banded = None
        if self._repl is not None:
            # load_checkpoint leaves process-LOCAL arrays (committed by
            # its staging jits, which cannot be re-placed cross-process);
            # round them through host numpy onto the global mesh.
            # _host_value (not plain np.asarray): under kf sharding the
            # store buffers load_checkpoint wrote into are P('kf')
            # arrays spanning non-addressable devices and must be
            # all-gathered first — every process reaches here in the
            # same order.
            import jax.tree_util as jtu

            host = lambda t: jtu.tree_map(self._host_value, t)  # noqa: E731
            self.map_state = self._put(host(self.map_state))
            self._est_dev = self._put(self._host_value(self._est_dev))
            st = self.store
            st.colors, st.depths = host(st.colors), host(st.depths)
            st.est_c2w = self._put(self._host_value(st.est_c2w))
            st.gt_c2w = self._put(self._host_value(st.gt_c2w))
            if self.kf_shards <= 1:
                st.colors = self._put(st.colors)
                st.depths = self._put(st.depths)
        if self.kf_shards > 1:
            self._place_store_sharded()
        if self.pipeline:
            self._place_pipeline_state()
            self._last_mapped_idx = start - 1
        if self.verbose:
            print(f"Resumed from {path} at frame {start}")
        return start

    def _needs_full(self, idx: int) -> bool:
        """Frames whose full imagery must reach the device: mapped frames
        (keyframe store + mapping rays) and visualization frames."""
        return (idx % self.every_frame == 0 or idx == self.n_img - 1
                or idx % self.track_vis.freq == 0
                or idx % self.map_vis.freq == 0)

    def _make_packet(self, dataset, idx: int):
        t = self.cfg["tracking"]
        return build_packet(
            dataset, idx,
            iters=int(t["iters"]), n_px=int(t["pixels"]),
            ie_h=int(t["ignore_edge_H"]), ie_w=int(t["ignore_edge_W"]),
            need_full=self._needs_full(idx), seed=self.seed)

    def warmup(self) -> None:
        """Allocate the cross-frame optimizer buffer ahead of the loop
        (the mapped-frame program itself compiles at frame 0, inside the
        benchmark's warmup window)."""
        if self._opt_buf is None:
            self._opt_buf = self._mappers[True].jit_init(
                {"map": self._mapper_state(),
                 "poses": self._put(jnp.zeros((self.w_max, 7),
                                              jnp.float32))})

    def run(self, start_idx: int = 0, finalize: bool = True) -> None:
        """Drive the full tracking/mapping loop, then (by default) write
        the final checkpoint and mesh.  Callers that need the trajectory
        metrics as early as possible (bench.py prints its JSON line the
        moment the device queue drains) pass ``finalize=False`` and call
        :meth:`finalize` themselves."""
        self.run_loop(start_idx)
        if finalize:
            self.finalize()

    def run_loop(self, start_idx: int = 0) -> None:
        # Cross-process: packets must stay HOST-side until _stage_in
        # places them on the global mesh (a committed local device array
        # cannot be re-placed across processes).
        prefetch = PacketPrefetcher(
            self.dataset, range(start_idx, self.n_img), self._make_packet,
            stage=self._repl is None)
        self.warmup()
        t_start = time.time()
        for idx, pkt in prefetch:
            t_frame = time.time()
            self._beat(idx)
            # Wall timestamp at each frame's start: dispatch is async, so
            # per-frame host times under-report device work — window-level
            # throughput must be measured start-of-window to drain-end.
            self.frame_start_wall.append(t_frame)
            gt_c2w = pkt.gt_c2w
            self.gt_poses[idx] = gt_c2w
            rec = {"frame": idx}

            deferred = False
            if idx == 0 or self.gt_camera:
                self._est_dev = self._est_dev.at[idx].set(
                    self._stage_in(gt_c2w))
            elif self.group_tracker is not None:
                # Tracking is deferred to the group flush at the next
                # mapped frame; the map is frozen until then, so results
                # are identical.
                self._track_buf.append((idx, pkt, rec))
                deferred = True
            else:
                rec.update(self._track_frame(idx, pkt))

            if idx % self.every_frame == 0 or idx == self.n_img - 1:
                # Tracking of this group (incl. this frame) must land in
                # the trajectory before the BA window is assembled.
                self._flush_track_buf(open_rec=rec)
                deferred = False
                rec.update(self._map_frame(
                    idx, pkt, first=(idx == 0),
                    cur_has_depthless=pkt.has_depthless))
                if self.on_map_done is not None:
                    self.on_map_done(self, idx)

            if idx == self.sync_after_frame:
                self._flush_track_buf(open_rec=rec)
                deferred = False
                self._drain_barrier()
            rec["frame_ms"] = (time.time() - t_frame) * 1e3
            self.frame_times.append(time.time() - t_frame)
            if not deferred:
                self._log_metrics(rec)
            if self.verbose and idx % 50 == 0:
                print(f"Frame {idx}/{self.n_img}  "
                      f"({idx / max(time.time() - t_start, 1e-9):.2f} fps)")

        # Drain the device queue so fps reflects completed work.  All
        # throughput/trajectory metrics are final here; checkpoint and
        # mesh finalization are separate (see finalize()).
        self._flush_track_buf()
        if self.pipeline:
            # The mapper-side trajectory is the complete one (every
            # tracked pose was row-written there each boundary, plus the
            # joint-BA refinements) — it becomes THE trajectory.
            self._est_dev = jax.device_put(self._est_M, self._repl_T)
        self._drain_barrier()
        self.drain_wall = time.time()
        self._flush_metrics()

    def _touch_heartbeat(self, idx: int) -> None:
        """Refresh <output>/HEARTBEAT (process 0).  Called every frame
        AND at each finalization phase boundary — finalize's checkpoint
        fetch + meshing take minutes, and a supervisor hang-timeout
        must not declare a finishing run hung.  --hang-timeout still
        needs to exceed the longest single phase (frame-0 compile, the
        mesh extraction, one degraded-link checkpoint fetch)."""
        if self.proc0:
            try:
                with open(os.path.join(self.output, "HEARTBEAT"),
                          "w") as f:
                    f.write(f"{idx} {time.time()}\n")
            except OSError:
                pass

    def _beat(self, idx: int) -> None:
        """Liveness heartbeat + (test-only) fault injection.

        The supervisor (``run.py --supervise``) watches
        ``<output>/HEARTBEAT``'s mtime for hang detection — one tiny
        host write per frame, refreshed by process 0 (the host loop is
        synchronous across processes, so a stalled worker stalls this
        file too).  ``MYSLAM_FAULT_KILL="<frame>[:procid]"`` hard-kills
        the named process ONCE at the given frame (a marker file in the
        output dir keeps the restarted run alive) — the deterministic
        fault hook the auto-restart e2e test drives."""
        self._touch_heartbeat(idx)
        fault = os.environ.get("MYSLAM_FAULT_KILL")
        if fault:
            parts = fault.split(":")
            f_idx = int(parts[0])
            f_proc = int(parts[1]) if len(parts) > 1 else 0
            marker = os.path.join(self.output, "FAULT_INJECTED")
            if (idx >= f_idx and jax.process_index() == f_proc
                    and not os.path.exists(marker)):
                with open(marker, "w") as f:
                    f.write(f"{idx}\n")
                os._exit(21)

    def _drain_barrier(self) -> None:
        """Wait until ALL queued device work is complete.

        A VALUE FETCH, not block_until_ready: through the axon remote
        backend, block_until_ready has been observed returning in ~5 ms
        while a ~400 ms mapping chunk was still executing (it made round
        2/3 throughput read 4x too high); fetching the trajectory's
        bytes (7.7 KB, one round-trip) provably requires the producing
        program — and everything queued before it — to have finished.
        The map state is fetched one scalar deep for the same reason
        (pipeline mode: forces the map submesh queue too)."""
        np.asarray(self._est_dev[0])
        np.asarray(self.map_state.decoder["beta"])

    def finalize(self, mesh: bool = True, checkpoint: bool = True) -> None:
        """Post-loop outputs: final checkpoint, then final mesh.

        Separate from run_loop so callers can read/emit trajectory
        metrics before paying the checkpoint's device->host state fetch
        (potentially SLOW: the tunnel's D2H has been measured down to
        ~0.02 MB/s in degraded states) and the meshing pipeline
        (reference Mapper.py:437-457 does both inside its loop's last
        iteration).  ``checkpoint=False`` lets budget-bound callers
        (bench.py with a degraded link) skip the big fetch."""
        # Final checkpoint (reference Mapper.py:437-438 saves at the last
        # frame; written here, outside the timed loop).
        self._touch_heartbeat(self.n_img - 1)
        if checkpoint and self.n_img > 0:
            self._checkpoint(
                os.path.join(
                    self.output, "ckpts", f"{self.n_img - 1:05d}.npz"),
                self.n_img - 1)
        self._touch_heartbeat(self.n_img - 1)

        # Final mesh (reference Mapper.py:448-456).  Cross-process, the
        # mesh comes from the full-state checkpoint on one host
        # (tools/final_mesh) — the marching pipeline is an offline tool.
        if not mesh or self._repl is not None:
            if mesh and self.proc0:
                print("final mesh: skipped in multi-process mode — run "
                      "tools/final_mesh on the final checkpoint")
            self._metrics_f.flush()
            return
        name = "final_mesh_eval_rec.ply" if self.eval_rec else "final_mesh.ply"
        try:
            if len(self.frame_times) > 40:
                # Long runs accumulate hundreds of loaded executables and
                # aliased (donated) buffers on the remote worker — a
                # state in which fresh meshing programs have been
                # observed to fault it (the round-1/2 workaround was a
                # whole subprocess).  Dropping the dead SLAM-loop
                # executables before compiling the meshing pipeline
                # removes that state in-process; validated by the full
                # 120-frame bench meshing in-process without fault.
                jax.clear_caches()
            self._extract_and_cull_mesh(
                os.path.join(self.output, "mesh", name), upto=self.n_img)
        except Exception as e:  # meshing must not lose the run's trajectory
            import traceback
            traceback.print_exc()
            print(f"WARNING: final meshing failed: {e}")
        self._touch_heartbeat(self.n_img - 1)
        self._metrics_f.flush()

    @property
    def fps(self) -> float:
        total = sum(self.frame_times)
        return len(self.frame_times) / total if total > 0 else 0.0

#!/usr/bin/env python
"""CLI entry point: python run.py <config.yaml> [--input_folder] [--output].

Mirrors the reference's runner (run.py in MohammadJohari/ESLAM) so the
invocation shape and per-scene configs carry over unchanged.

Multi-process (multi-host) runs — the generalization of the reference's
two-process design (src/ESLAM.py:246-260) to N hosts sharing nothing:

  * real deployment: start ONE run.py per host with
      --nproc N --procid I --coordinator host:port
    (or MYSLAM_NPROC / MYSLAM_PROCID / MYSLAM_COORDINATOR env vars);
    each process is wired into one jax.distributed runtime, jax.devices()
    spans the job, and the config's parallel.devices / parallel.kf_shards
    meshes (0 = all global devices) cross process boundaries.
  * validation harness (no pod needed): --launch N spawns N local worker
    processes over a virtual CPU mesh (--devices-per-proc D each) and
    waits — the same code path the cross-process parity tests drive.
"""

import argparse
import os
import subprocess
import sys


def main():
    parser = argparse.ArgumentParser(
        description="Run TPU-native dense RGB-D SLAM.")
    parser.add_argument("config", type=str, help="Path to config file.")
    parser.add_argument("--input_folder", type=str, default=None,
                        help="Overrides the input folder in the config.")
    parser.add_argument("--output", type=str, default=None,
                        help="Overrides the output folder in the config.")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--resume", action="store_true",
                        help="Resume from the newest checkpoint in the "
                             "output folder (full state, incl. the map).")
    mp = parser.add_argument_group("multi-process (multi-host)")
    mp.add_argument("--nproc", type=int,
                    default=int(os.environ.get("MYSLAM_NPROC", "1")),
                    help="total number of processes in the job")
    mp.add_argument("--procid", type=int,
                    default=int(os.environ.get("MYSLAM_PROCID", "-1")),
                    help="this process's id in [0, nproc)")
    mp.add_argument("--coordinator", type=str,
                    default=os.environ.get("MYSLAM_COORDINATOR", ""),
                    help="coordinator address host:port (process 0's)")
    mp.add_argument("--launch", type=int, default=0, metavar="N",
                    help="spawn N local worker processes on a virtual "
                         "CPU mesh and wait (validation harness)")
    mp.add_argument("--devices-per-proc", type=int, default=2,
                    help="virtual CPU devices per worker under --launch")
    sup = parser.add_argument_group("failure detection / auto-restart")
    sup.add_argument("--supervise", action="store_true",
                     help="run the job under a supervisor: detect "
                          "worker death (any gang member's) or a "
                          "stalled heartbeat and auto-restart from the "
                          "newest checkpoint (--resume semantics)")
    sup.add_argument("--max-restarts", type=int, default=3,
                     help="bounded restarts before the supervisor "
                          "gives up (default 3)")
    sup.add_argument("--hang-timeout", type=float, default=0.0,
                     help="seconds without HEARTBEAT progress before "
                          "the job is declared hung and restarted "
                          "(0 = exit-code detection only; allow for "
                          "frame-0 compile time when setting this)")
    args = parser.parse_args()

    if args.supervise:
        if args.nproc > 1:
            # supervise() rebuilds the child command without the
            # coordinator wiring; silently restarting one gang member
            # as a single-process run would be worse than refusing.
            parser.error(
                "--supervise composes with single-process runs and "
                "--launch N local gangs; a real multi-host job is "
                "supervised by the cluster's gang scheduler (restart "
                "all hosts with --resume; same newest-checkpoint "
                "semantics)")
        sys.exit(supervise(args))

    if os.environ.get("MYSLAM_FORCE_CPU") == "1":
        # Subprocess-test escape: this image's site hook pre-registers
        # the TPU plugin; only jax.config wins over it.
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.launch > 1:
        sys.exit(launch_local(args))

    if args.nproc > 1:
        if not (0 <= args.procid < args.nproc) or not args.coordinator:
            parser.error("--nproc needs --procid in [0, nproc) and "
                         "--coordinator host:port (use --launch N for "
                         "the local harness)")
        import jax
        if "host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
            # Virtual CPU mesh requested: this image's site hook
            # pre-registers the TPU plugin and only jax.config wins over
            # it (see tests/conftest.py).
            jax.config.update("jax_platforms", "cpu")
        from myslam_tpu.parallel.distributed import init_distributed

        init_distributed(coordinator=args.coordinator,
                         num_processes=args.nproc, process_id=args.procid)

    from myslam_tpu.engine.scheduler import SLAMSystem
    from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config

    cfg = load_config(args.config, DEFAULT_CONFIG)
    slam = SLAMSystem(cfg, input_folder=args.input_folder,
                      output=args.output, seed=args.seed)
    if slam.proc0:
        print(f"INFO: output folder: {slam.output}")
        print(f"INFO: frames: {slam.n_img}, "
              f"camera {slam.cam.W}x{slam.cam.H}, "
              f"keyframe capacity {slam.store.capacity}"
              + (f", processes {slam.n_proc}" if slam.n_proc > 1 else ""))
    start = slam.resume() if args.resume else 0
    slam.run(start)
    if slam.proc0:
        print(f"INFO: done — {slam.fps:.2f} frames/s average")


def launch_local(args) -> int:
    """Spawn args.launch worker run.py processes over one global CPU
    mesh (args.launch * args.devices_per_proc virtual devices); wait.

    Failure DETECTION (SURVEY §5.3): a gang member dying mid-run leaves
    the survivors blocked in a gloo collective forever — so the
    launcher polls the gang, and on the first abnormal exit kills the
    rest and returns that worker's rc (the supervisor above turns the
    nonzero rc into a whole-gang restart from the newest checkpoint).
    """
    import socket
    import time

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        coord = f"127.0.0.1:{s.getsockname()[1]}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count="
                        f"{args.devices_per_proc}").strip()
    env.pop("JAX_PLATFORMS", None)  # workers force cpu via jax.config
    base = [sys.executable, os.path.abspath(__file__), args.config,
            "--seed", str(args.seed),
            "--nproc", str(args.launch), "--coordinator", coord]
    if args.input_folder:
        base += ["--input_folder", args.input_folder]
    if args.output:
        base += ["--output", args.output]
    if args.resume:
        base += ["--resume"]
    procs = [subprocess.Popen(base + ["--procid", str(pid)], env=env)
             for pid in range(args.launch)]
    live = list(procs)
    rc = 0
    while live:
        for pr in list(live):
            prc = pr.poll()
            if prc is None:
                continue
            live.remove(pr)
            if prc != 0:
                rc = rc or prc
                if live:
                    print(f"LAUNCH: worker died (rc={prc}) — killing "
                          f"the remaining {len(live)} gang member(s)",
                          flush=True)
                for other in live:
                    other.kill()
                for other in live:
                    other.wait()
                return rc
        time.sleep(0.2)
    return rc


def _output_dir(args) -> str:
    if args.output:
        return args.output
    from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config

    return load_config(args.config, DEFAULT_CONFIG)["data"]["output"]


def supervise(args) -> int:
    """Failure detection + bounded auto-restart (SURVEY §5.3).

    Runs the job (single worker, or the --launch N gang) as a child
    process group and detects failure two ways: abnormal exit (any gang
    member's death — launch_local kills the survivors and surfaces the
    rc) and a stalled ``<output>/HEARTBEAT`` file (--hang-timeout; the
    scheduler refreshes it every frame).  On failure the whole job is
    restarted from the newest checkpoint via --resume, up to
    --max-restarts times.  Crash-loss window: up to mapping.ckpt_freq
    mapped frames of map state (checkpoints are crash-atomic — tmp +
    rename — so a kill mid-write cannot corrupt the resume source, and
    resume is trajectory-exact: tests/test_resume_kill.py).  Real
    multi-host jobs run one supervisor per host under the cluster's
    gang scheduler with the same semantics (whole-gang restart from the
    newest checkpoint); elastic shrink is out of scope by design — the
    kf/dp meshes are shape-static per job size.
    """
    import signal
    import time

    hb = os.path.join(_output_dir(args), "HEARTBEAT")
    base = [sys.executable, os.path.abspath(__file__), args.config,
            "--seed", str(args.seed)]
    if args.input_folder:
        base += ["--input_folder", args.input_folder]
    if args.output:
        base += ["--output", args.output]
    if args.launch > 1:
        base += ["--launch", str(args.launch),
                 "--devices-per-proc", str(args.devices_per_proc)]

    restarts = 0
    while True:
        resume = args.resume or restarts > 0
        child = subprocess.Popen(base + (["--resume"] if resume else []),
                                 start_new_session=True)
        t_start = time.time()
        hung = False
        while True:
            rc = child.poll()
            if rc is not None:
                break
            if args.hang_timeout > 0:
                try:
                    last = os.path.getmtime(hb)
                except OSError:
                    last = t_start
                if time.time() - max(last, t_start) > args.hang_timeout:
                    hung = True
                    print("SUPERVISOR: no heartbeat for "
                          f"{args.hang_timeout:.0f}s — killing the job",
                          flush=True)
                    try:
                        os.killpg(os.getpgid(child.pid), signal.SIGKILL)
                    except (ProcessLookupError, PermissionError):
                        child.kill()
                    rc = child.wait()
                    break
            time.sleep(0.5)
        if rc == 0 and not hung:
            if restarts:
                print(f"SUPERVISOR: completed after {restarts} "
                      "restart(s)", flush=True)
            return 0
        if restarts >= args.max_restarts:
            print(f"SUPERVISOR: giving up after {restarts} restart(s) "
                  f"(rc={rc})", flush=True)
            return rc or 1
        restarts += 1
        kind = "hung" if hung else f"died (rc={rc})"
        print(f"SUPERVISOR: job {kind} — restart "
              f"{restarts}/{args.max_restarts} from the newest "
              "checkpoint", flush=True)


if __name__ == "__main__":
    main()

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
    args = parser.parse_args()

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
    mesh (args.launch * args.devices_per_proc virtual devices); wait."""
    import socket

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
    rc = 0
    for pr in procs:
        rc = pr.wait() or rc
    return rc


if __name__ == "__main__":
    main()

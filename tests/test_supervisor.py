"""Failure DETECTION + bounded auto-restart e2e (SURVEY §5.3).

The reference has no failure story at all (SURVEY §5.3: a crash loses
the run — its checkpoints omit planes/keyframes).  Round 4 closed the
*recovery* half (full-state checkpoints + kill-and-resume,
tests/test_resume_kill.py); this file closes the *detection* half:

  * ``run.py --supervise`` notices the job dying (abnormal exit) or
    hanging (stalled HEARTBEAT mtime) and restarts it from the newest
    checkpoint via ``--resume``, up to ``--max-restarts`` times.
  * In a ``--launch N`` gang, ONE worker's death is detected by the
    launcher, which kills the survivors (they would otherwise block in
    a gloo collective forever) and surfaces the rc — the supervisor
    then restarts the WHOLE gang (elastic shrink is out of scope by
    design: the kf/dp meshes are shape-static per job size).

Faults are injected deterministically via the scheduler's
``MYSLAM_FAULT_KILL="<frame>[:procid]"`` hook (os._exit(21) at the
named frame, once — a marker file in the output dir keeps the
restarted run alive).  Crash-loss window: up to ``mapping.ckpt_freq``
mapped frames; checkpoint writes are crash-atomic (tmp + rename), so a
kill mid-write cannot corrupt the resume source.
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_cfg(tmp_path, n_frames, extra=""):
    cfg = tmp_path / "supervised.yaml"
    cfg.write_text(f"""\
inherit_from: {REPO}/configs/Synthetic/room_smoke.yaml
data:
  n_frames: {n_frames}
keyframe_device: cpu
mapping:
  ckpt_freq: 4
  mesh_freq: 1000000
  iters_first: 31
tracking:
  vis_freq: 1000000
meshing:
  resolution: 0.12
{extra}""")
    return str(cfg)


def _supervised(cfg, out, fault, extra_args=(), timeout=1200):
    env = dict(os.environ)
    env["MYSLAM_FORCE_CPU"] = "1"
    env.setdefault("MYSLAM_JAX_CACHE", "/tmp/myslam_jax_cache_cpu")
    env["MYSLAM_FAULT_KILL"] = fault
    cmd = [sys.executable, os.path.join(REPO, "run.py"), cfg,
           "--output", out, "--supervise", "--max-restarts", "2",
           *extra_args]
    p = subprocess.run(cmd, env=env, stdout=subprocess.PIPE,
                       stderr=subprocess.STDOUT, text=True,
                       timeout=timeout)
    return p.returncode, p.stdout


def _final_ate_cm(out_dir, n_frames):
    ck = os.path.join(out_dir, "ckpts", f"{n_frames - 1:05d}.npz")
    data = np.load(ck, allow_pickle=True)
    est = data["estimate_c2w_list"]
    gt = data["gt_c2w_list"]
    t_err = np.linalg.norm(est[1:, :3, 3] - gt[1:, :3, 3], axis=-1)
    return float(np.sqrt(np.mean(t_err ** 2)) * 100)


def test_supervisor_restarts_crashed_run(tmp_path):
    """Worker os._exit(21)s at frame 9; the supervisor detects the
    abnormal exit, restarts with --resume from the frame-8 checkpoint,
    and the job completes with a sane trajectory."""
    n_frames = 13
    cfg = _write_cfg(tmp_path, n_frames)
    out = str(tmp_path / "out")
    rc, log = _supervised(cfg, out, fault="9")
    assert rc == 0, log[-3000:]
    assert "SUPERVISOR: job died (rc=21) — restart 1/2" in log, log[-3000:]
    assert "SUPERVISOR: completed after 1 restart(s)" in log
    # The fault really fired (marker), and the restart resumed (not a
    # from-scratch rerun): the pre-fault checkpoint predates the marker.
    marker = os.path.join(out, "FAULT_INJECTED")
    assert os.path.exists(marker)
    assert _final_ate_cm(out, n_frames) < 5.0
    # No torn temp files left behind by the atomic checkpoint writer.
    assert not [f for f in os.listdir(os.path.join(out, "ckpts"))
                if f.endswith(".tmp.npz")]


def test_supervisor_restarts_dead_gang_worker(tmp_path):
    """In a 2-process gang (the product cross-process path), worker 1
    dies at frame 8; the launcher detects it, kills worker 0, and the
    supervisor restarts the whole gang from the newest checkpoint."""
    n_frames = 11
    cfg = _write_cfg(tmp_path, n_frames, extra="""\
parallel:
  devices: 0
""")
    out = str(tmp_path / "out_gang")
    rc, log = _supervised(
        cfg, out, fault="8:1",
        extra_args=("--launch", "2", "--devices-per-proc", "1"),
        timeout=1800)
    assert rc == 0, log[-3000:]
    assert "LAUNCH: worker died (rc=21)" in log, log[-3000:]
    assert "restart 1/2" in log
    assert _final_ate_cm(out, n_frames) < 5.0

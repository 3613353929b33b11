"""Kill-mid-run -> auto-resume e2e (VERDICT r4 item 8).

The reference's checkpoints are write-only — planes and keyframes are
never saved, so a crash loses the run (SURVEY §5.3/§5.4,
/root/reference/src/utils/Logger.py:39-47).  Here a checkpoint is FULL
state (atlases, decoders, trajectory, packed keyframe imagery verbatim,
PRNG key), so a killed run restarts from the last checkpoint and —
because every source of randomness is keyed off checkpointed state
(PRNG key, per-frame packet seeds) and the packed u8/u16 store
round-trips losslessly — continues on the SAME trajectory the
uninterrupted run produces.

Crash-loss window: up to ``mapping.ckpt_freq`` mapped frames of map
state (reference default 500; configurable).  This test runs run.py as
a real subprocess, SIGKILLs it after >=2 checkpoints exist, resumes via
``run.py --resume``, and asserts the final trajectory matches an
uninterrupted run's.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_cfg(tmp_path, n_frames=17):
    cfg = tmp_path / "kill_resume.yaml"
    cfg.write_text(f"""\
inherit_from: {REPO}/configs/Synthetic/room_smoke.yaml
data:
  n_frames: {n_frames}
keyframe_device: cpu   # packed store: lossless checkpoint round-trip
mapping:
  ckpt_freq: 4         # checkpoint every mapped frame (crash-loss window
                       # = 4 frames; the reference's default 500 would
                       # lose up to 500)
  mesh_freq: 1000000
  iters_first: 31
tracking:
  vis_freq: 1000000
meshing:
  resolution: 0.12     # keep the final mesh cheap on the CPU backend
""")
    return str(cfg)


def _run(cfg, out, resume=False, wait=True):
    env = dict(os.environ)
    env["MYSLAM_FORCE_CPU"] = "1"
    env.setdefault("MYSLAM_JAX_CACHE", "/tmp/myslam_jax_cache_cpu")
    cmd = [sys.executable, os.path.join(REPO, "run.py"), cfg,
           "--output", out] + (["--resume"] if resume else [])
    p = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    if not wait:
        return p
    out_txt, _ = p.communicate(timeout=1200)
    assert p.returncode == 0, out_txt[-3000:]
    return out_txt


def _final_ate_cm(out_dir, n_frames):
    ck = os.path.join(out_dir, "ckpts", f"{n_frames - 1:05d}.npz")
    data = np.load(ck, allow_pickle=True)
    est = data["estimate_c2w_list"]
    gt = data["gt_c2w_list"]
    t_err = np.linalg.norm(est[1:, :3, 3] - gt[1:, :3, 3], axis=-1)
    return float(np.sqrt(np.mean(t_err ** 2)) * 100)


def test_kill_and_resume(tmp_path):
    n_frames = 17
    cfg = _write_cfg(tmp_path, n_frames)

    # Uninterrupted reference run.
    ref_out = str(tmp_path / "ref")
    _run(cfg, ref_out)
    ate_ref = _final_ate_cm(ref_out, n_frames)

    # Interrupted run: SIGKILL once >=2 mapped-frame checkpoints exist
    # (i.e. mid-stream, past frame 8 of 17).
    kill_out = str(tmp_path / "killed")
    p = _run(cfg, kill_out, wait=False)
    ck_dir = os.path.join(kill_out, "ckpts")
    deadline = time.time() + 900
    try:
        while time.time() < deadline:
            cks = [f for f in os.listdir(ck_dir)] if os.path.isdir(
                ck_dir) else []
            if len(cks) >= 2:
                break
            if p.poll() is not None:
                pytest.fail("run finished before it could be killed; "
                            f"rc={p.returncode}")
            time.sleep(0.5)
        else:
            pytest.fail("no 2 checkpoints appeared before deadline")
        os.kill(p.pid, signal.SIGKILL)
    finally:
        p.wait()

    # The kill must have left a resumable, INCOMPLETE state.
    assert not os.path.exists(
        os.path.join(ck_dir, f"{n_frames - 1:05d}.npz"))

    # Resume and finish.
    out_txt = _run(cfg, kill_out, resume=True)
    assert "frames/s average" in out_txt

    ate_res = _final_ate_cm(kill_out, n_frames)
    # Full-state checkpoint + keyed RNG + lossless packed imagery: the
    # resumed trajectory IS the uninterrupted one (same draws, same
    # programs) up to backend-order noise.
    assert abs(ate_res - ate_ref) < max(0.1 * ate_ref, 0.05), (
        ate_res, ate_ref)
    # And both runs actually tracked (sane ATE on the smoke scene).
    assert ate_ref < 5.0 and ate_res < 5.0

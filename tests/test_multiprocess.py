"""Cross-PROCESS multi-host execution (the real jax.distributed path).

Every other multi-device test in this suite runs N virtual devices in
ONE process.  These tests cross an actual OS-process boundary: N
processes wired by jax.distributed.initialize (CPU backend, gloo
collectives), one SPMD mini-SLAM loop over the global mesh, per-process
keyframe feeding, and cross-process barrier fences — the generalization
of the reference's two-process shared-memory design
(src/ESLAM.py:246-260) that SURVEY §5.8 calls for.

Parity oracle: the same loop on the same GLOBAL device count must give
the same trajectory/losses regardless of how devices are split across
processes (1x4 == 2x2 == 4x1).
"""

import numpy as np
import pytest

from myslam_tpu.parallel.multiproc import launch

FRAMES = 4


@pytest.fixture(scope="module")
def single_proc_ref():
    """1 process x 4 devices, both modes (subprocess: its own backend)."""
    return {mode: launch(1, 4, mode=mode, frames=FRAMES)
            for mode in ("dp", "kf")}


@pytest.mark.parametrize("mode", ["dp", "kf"])
def test_two_process_parity(single_proc_ref, mode):
    """2 processes x 2 devices == 1 process x 4 devices."""
    ref = single_proc_ref[mode]
    out = launch(2, 2, mode=mode, frames=FRAMES)
    assert np.isfinite(out["est"]).all()
    np.testing.assert_allclose(out["est"], ref["est"], atol=1e-4)
    np.testing.assert_allclose(out["map_losses"], ref["map_losses"],
                               rtol=1e-4)
    np.testing.assert_allclose(out["track_losses"], ref["track_losses"],
                               rtol=1e-4)


def test_four_process_parity(single_proc_ref):
    """4 processes x 1 device == 1 process x 4 devices (kf mode: every
    process feeds exactly its own keyframe slot)."""
    ref = single_proc_ref["kf"]
    out = launch(4, 1, mode="kf", frames=FRAMES)
    np.testing.assert_allclose(out["est"], ref["est"], atol=1e-4)
    np.testing.assert_allclose(out["map_losses"], ref["map_losses"],
                               rtol=1e-4)

"""Cross-process parity of the PRODUCT scheduler (SLAMSystem).

The round-4 gap (VERDICT item 1): the multi-host layer was validated
only through a bespoke mini-loop — the product orchestrator itself had
never run under ``jax.process_count() > 1``.  These tests drive
``SLAMSystem.run()`` (run.py's own code path: fused chunked mapping with
in-program window selection, packed keyframe store, keyframe admission,
group tracking, joint BA) across OS-process boundaries at a NON-toy
operating point (128x96 frames, the real chunked 15-iter schedule with a
31-iteration multi-chunk first frame, packed u8/u16 store) and compare
process topologies over the SAME global device mesh:

    2 processes x 2 devices  vs  1 process x 4 devices

for both supported modes: ray DP (one cross-process gradient psum per
iteration) and keyframe-sharded BA (each process materializes only its
own keyframes' imagery).  The reference counterpart being generalized is
the 2-process shared-memory design, /root/reference/src/ESLAM.py:246-260.

Parity oracle (calibrated by measurement): the two topologies run the
same math but reduce collectives in different orders (gloo two-level vs
single-process XLA), so exact equality is only expected BEFORE the first
tracking feedback — the whole 31-iteration frame-0 chunk matches to
~1e-7 relative (measured), and anything larger there is a semantic bug
(selection / RNG / packet divergence shows up at iteration 0).  After
tracking feeds the ~1e-7 seed back, the drift amplifies chaotically
(measured: 1e-4 at the second mapped frame, percent-level by the end),
so the trajectory/late-loss checks are convergence-tolerance bounds,
not bit parity.  Each topology on its own is bit-deterministic.
"""

import numpy as np
import pytest

from myslam_tpu.parallel.multiproc import launch

FRAMES = 9
FRAME0_ITERS = 31  # product_cfg iters_first — the pre-feedback window


@pytest.mark.parametrize("mode", ["dp", "kf"])
def test_product_cross_process_parity(mode):
    ref = launch(1, 4, mode=mode, frames=FRAMES, loop="product",
                 timeout=1500.0)
    out = launch(2, 2, mode=mode, frames=FRAMES, loop="product",
                 timeout=1500.0)
    r = np.asarray(ref["map_losses"])
    o = np.asarray(out["map_losses"])
    assert np.isfinite(o).all() and np.isfinite(out["est"]).all()
    # Pre-feedback window: reduction-order noise only (~1e-7 measured).
    np.testing.assert_allclose(o[:FRAME0_ITERS], r[:FRAME0_ITERS],
                               rtol=1e-5)
    # Post-feedback: chaotic amplification of the reduction-order seed;
    # bound convergence, not bits.
    np.testing.assert_allclose(out["est"], ref["est"], atol=5e-3)
    assert abs(o[-1] - r[-1]) / abs(r[-1]) < 0.2
    assert abs(out["map_sum"] - ref["map_sum"]) / ref["map_sum"] < 0.01
    # The run made real progress (mapping converged below its start).
    assert r[-1] < r[0] and o[-1] < o[0]
    # A fresh SLAMSystem on the same gang restored the exact final
    # state from the checkpoint (r5 review: kf-sharded store buffers
    # must be all-gathered, not np.asarray'd, on the resume path).
    assert ref["resume_ok"] == 1.0
    assert out["resume_ok"] == 1.0


def test_product_rejects_undersized_mesh():
    """A multi-process config whose mesh covers only process 0's
    devices must be rejected at construction (r5 review): otherwise
    process 0 runs the job solo and the rest crash mid-run."""
    out = launch(2, 2, mode="kf", frames=4, loop="validate",
                 timeout=600.0)
    assert out["rejected"] == 1.0

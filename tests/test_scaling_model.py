"""Scaling-model unit tests (pure host math, no JAX).

The projection in tools/scaling_report.py is the repo's multi-chip
claim; these tests pin its algebra: the r5 per-chip compute floor
(tools/bench_raysweep.py) must reduce to the old purely-linear model at
floor=0, saturate compute at the floor for large n, and the sweep's
least-squares fit must recover a known affine t(R) exactly.
"""

import numpy as np
import pytest

from myslam_tpu.tools.bench_raysweep import fit_and_rows
from myslam_tpu.tools.scaling_report import project_dp, project_pipeline

ARGS = dict(map_opt_ms=0.24, track_iter_ms=5.4, grad_bytes=7.6e6,
            map_iters=15, track_iters=8, every_frame=4, ici_gbps=45.0)


def test_floor_zero_matches_linear_model():
    for n in (1, 2, 4, 8, 16):
        assert project_dp(n, 21.0, floor_ms=0.0, **ARGS) == pytest.approx(
            project_dp(n, 21.0, **ARGS))
        assert project_pipeline(1, n, 21.0, floor_ms=0.0, **ARGS) == \
            pytest.approx(project_pipeline(1, n, 21.0, **ARGS))


def test_floor_caps_strong_scaling():
    # With a floor, per-iter compute converges to floor_ms as n grows,
    # so fps must stay below the all-floor bound and below the linear
    # model at every n > 1.
    floor = 3.0
    for n in (2, 4, 8, 16):
        with_floor = project_dp(n, 21.0, floor_ms=floor, **ARGS)
        linear = project_dp(n, 21.0, floor_ms=0.0, **ARGS)
        assert with_floor < linear
        # floor == iter_ms: compute does not shard at all.
        frozen = project_dp(n, 21.0, floor_ms=21.0, **ARGS)
        assert frozen < with_floor
    # n=1 is unaffected by the floor split.
    assert project_dp(1, 21.0, floor_ms=floor, **ARGS) == pytest.approx(
        project_dp(1, 21.0, floor_ms=0.0, **ARGS))


def test_floor_never_exceeds_iter_ms():
    # A floor larger than the measured iter time must not produce
    # negative shardable work (clamped at 0).
    fps = project_dp(8, 10.0, floor_ms=50.0, **ARGS)
    frozen = project_dp(8, 10.0, floor_ms=10.0, **ARGS)
    # compute term is floor + 0/n in both; the 50-floor is slower only
    # through its larger constant.
    assert fps < frozen


def test_raysweep_fit_recovers_affine():
    rays = [4000, 2000, 1000, 500, 250]
    floor_true, slope_true = 2.0, 0.005
    ms = [floor_true + slope_true * r for r in rays]
    floor, slope, rows = fit_and_rows(rays, ms)
    assert floor == pytest.approx(floor_true, abs=1e-9)
    assert slope == pytest.approx(slope_true, abs=1e-12)
    # rows: measured speedup = t(4000)/t(4000/n) with fixed-cost decay.
    by_n = {r["chips"]: r for r in rows}
    assert by_n[1]["compute_speedup_measured"] == pytest.approx(1.0)
    t0 = ms[0]
    for n in (2, 4, 8, 16):
        expect = t0 / (floor_true + slope_true * 4000 / n)
        assert by_n[n]["compute_speedup_measured"] == pytest.approx(
            expect, abs=0.01)
        assert by_n[n]["efficiency_vs_linear"] == pytest.approx(
            expect / n, abs=0.01)


def test_raysweep_fit_clamps_negative_floor():
    rays = [4000, 2000, 1000]
    # Superlinear data whose lstsq intercept would be negative.
    ms = [20.0, 9.0, 3.0]
    floor, slope, _rows = fit_and_rows(rays, ms)
    assert floor >= 0.0

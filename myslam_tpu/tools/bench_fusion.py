#!/usr/bin/env python
"""Microbenchmark: fused vs per-plane gather/scatter strategies.

The mapping iteration issues, per atlas, one (N,) row gather per plane
(6 planes) forward and one (N, 128) row scatter-add per plane backward
(ops/plane_sample.py).  If the v5e row-transaction engine has per-call
fixed cost or better pipelining at larger row counts, combining the
per-plane calls into one big call wins.  This tool measures, on the real
operating shapes:

  * gather: 6 separate takes vs ONE take with (6N,) combined indices;
  * gather row width: 128 vs 256 lanes (the coarse sdf+color planes share
    cell geometry and could ride one 256-wide row);
  * scatter: 6 separate adds vs ONE (6N, 128) combined add vs
    sort+segment-sum then unique-row add.

Usage: python -m myslam_tpu.tools.bench_fusion [--n 160000]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit_program(make_fn, iters=10):
    """ms per op, repetition inside one jitted program (host dispatch to
    a remote device costs ~3-5 ms; keep it out of the measurement)."""
    from myslam_tpu.utils.timing import barrier

    fn = make_fn(iters)
    out = fn()
    barrier(out)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = fn()
        barrier(out)  # value fetch: block_until_ready lies via axon
        best = min(best, (time.time() - t0) / iters * 1e3)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=160000)
    args = ap.parse_args()
    n = args.n

    from myslam_tpu.engine.scheduler import enable_compilation_cache
    enable_compilation_cache()
    print("setup: cache enabled", flush=True)

    # Large arrays are generated ON DEVICE in one jitted program: H2D
    # rides a ~420 MB/s tunnel (0.5 GB of updates would stall for
    # minutes) and each EAGER device op pays a 20-40 s tunnel compile.
    rng = np.random.default_rng(0)
    # Atlas shaped like the room color atlas (the biggest): ~164k rows.
    S = 164320
    plane_rows = S // 6
    cells_np = [rng.integers(0, plane_rows, n).astype(np.int32)
                + p * plane_rows for p in range(6)]
    cells = [jax.device_put(c) for c in cells_np]
    cells_comb = jax.device_put(np.concatenate(cells_np))
    jax.block_until_ready(cells_comb)
    print("setup: cells on device", flush=True)

    @jax.jit
    def make_inputs():
        key = jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        quad = jax.random.normal(k1, (S, 128), jnp.float32)
        quad256 = jax.random.normal(k2, (S // 2, 256), jnp.float32)
        upd = jax.random.normal(k3, (n, 128), jnp.float32)
        upd_comb = jax.random.normal(k4, (6 * n, 128), jnp.float32)
        return quad, quad256, upd, upd_comb

    quad, quad256, upd, upd_comb = make_inputs()
    jax.block_until_ready(upd_comb)
    print("inputs ready", flush=True)

    results = {}

    # ---- gathers ----
    def mk_gather_sep(iters):
        @jax.jit
        def run():
            def body(i, acc):
                for p in range(6):
                    g = jnp.take(quad, cells[p] + i, axis=0,
                                 mode="clip")
                    acc = acc + jnp.sum(g[:, :1])
                return acc
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return run

    def mk_gather_comb(iters):
        @jax.jit
        def run():
            def body(i, acc):
                g = jnp.take(quad, cells_comb + i, axis=0, mode="clip")
                return acc + jnp.sum(g[:, :1])
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return run

    def mk_gather_256(iters):
        c = cells_comb % (S // 2)

        @jax.jit
        def run():
            def body(i, acc):
                g = jnp.take(quad256, c[:3 * n] + i, axis=0, mode="clip")
                return acc + jnp.sum(g[:, :1])
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return run

    results["gather_6sep_ms"] = timeit_program(mk_gather_sep)
    print("gather_6sep_ms:", round(results["gather_6sep_ms"], 3), flush=True)
    results["gather_1comb_ms"] = timeit_program(mk_gather_comb)
    print("gather_1comb_ms:", round(results["gather_1comb_ms"], 3), flush=True)
    results["gather_256w_half_rows_ms"] = timeit_program(mk_gather_256)
    print("gather_256w_half_rows_ms:", round(results["gather_256w_half_rows_ms"], 3), flush=True)

    # ---- scatters ----
    def mk_scatter_sep(iters):
        @jax.jit
        def run():
            def body(i, acc):
                buf = jnp.zeros((S, 128), jnp.float32)
                for p in range(6):
                    buf = buf.at[cells[p] + i].add(upd)
                return acc + buf[0, 0]
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return run

    def mk_scatter_comb(iters):
        @jax.jit
        def run():
            def body(i, acc):
                buf = jnp.zeros((S, 128), jnp.float32)
                buf = buf.at[cells_comb + i].add(upd_comb)
                return acc + buf[0, 0]
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return run

    def mk_scatter_sorted(iters):
        # SORTED-INDEX scatter: argsort rows by destination cell so the
        # scatter-add sees monotone indices (XLA/TPU can then coalesce
        # row updates), but still scatter all 6N rows — no segment-sum /
        # unique-cell reduction is performed.
        @jax.jit
        def run():
            def body(i, acc):
                c = cells_comb + i
                order = jnp.argsort(c)
                cs = c[order]
                us = upd_comb[order]
                buf = jnp.zeros((S, 128), jnp.float32)
                buf = buf.at[cs].add(us)
                return acc + buf[0, 0]
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return run

    results["scatter_6sep_ms"] = timeit_program(mk_scatter_sep, iters=5)
    print("scatter_6sep_ms:", round(results["scatter_6sep_ms"], 3), flush=True)
    results["scatter_1comb_ms"] = timeit_program(mk_scatter_comb, iters=5)
    print("scatter_1comb_ms:", round(results["scatter_1comb_ms"], 3), flush=True)
    results["scatter_sorted_ms"] = timeit_program(mk_scatter_sorted, iters=5)
    print("scatter_sorted_ms:", round(results["scatter_sorted_ms"], 3), flush=True)



if __name__ == "__main__":
    main()

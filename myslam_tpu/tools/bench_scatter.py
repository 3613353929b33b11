#!/usr/bin/env python
"""Microbenchmark: strategies for the fine-plane gradient scatter-add.

The mapping backward's dominant cost is 6 scatter-adds of (N, 128) f32
update rows into the fine-plane regions of the quad-gradient buffer
(ops/plane_sample.py _scatter_grad).  This tool measures alternatives on
the actual operating shapes so the VJP can route each plane through the
fastest path.

Usage: python -m myslam_tpu.tools.bench_scatter [--n 160000]
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    """ms per op with the repetition INSIDE one program (a host-side call
    loop would measure the remote tunnel's ~3-5 ms dispatch overhead, not
    the device).  The op input is perturbed per iteration (rolled rows)
    so XLA cannot hoist it out of the loop."""
    cell, upd = args

    @jax.jit
    def repeat(cell, upd):
        def body(i, acc):
            out = fn(jnp.roll(cell, i), upd)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    @jax.jit
    def baseline(cell, upd):
        def body(i, acc):
            return acc + jnp.roll(cell, i)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    _ = float(repeat(cell, upd))
    _ = float(baseline(cell, upd))
    t0 = time.time()
    _ = float(repeat(cell, upd))
    t_full = time.time() - t0
    t0 = time.time()
    _ = float(baseline(cell, upd))
    t_base = time.time() - t0
    return (t_full - t_base) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=160_000)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    n = args.n

    # room0-scale planes: fine SDF ~164x112, fine color ~328x224
    for rows, label in ((18_368, "sdf-fine"), (73_472, "color-fine")):
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        cell = jax.random.randint(k1, (n,), 0, rows, dtype=jnp.int32)
        upd = jax.random.normal(k2, (n, 128), jnp.float32)

        @jax.jit
        def xla_scatter(cell, upd):
            return jnp.zeros((rows, 128), jnp.float32).at[cell].add(upd)

        @jax.jit
        def xla_scatter_bf16(cell, upd):
            out = jnp.zeros((rows, 128), jnp.bfloat16).at[cell].add(
                upd.astype(jnp.bfloat16))
            return out.astype(jnp.float32)

        @jax.jit
        def sorted_scatter(cell, upd):
            order = jnp.argsort(cell)
            cs = cell[order]
            us = upd[order]
            return jnp.zeros((rows, 128), jnp.float32).at[cs].add(
                us, indices_are_sorted=True)

        @jax.jit
        def segsum(cell, upd):
            return jax.ops.segment_sum(upd, cell, num_segments=rows)

        @jax.jit
        def segsum_sorted(cell, upd):
            order = jnp.argsort(cell)
            return jax.ops.segment_sum(
                upd[order], cell[order], num_segments=rows,
                indices_are_sorted=True)

        @jax.jit
        def onehot_mxu(cell, upd):
            oh = (cell[:, None] == jnp.arange(rows, dtype=jnp.int32)[None, :]
                  ).astype(jnp.bfloat16)
            return jnp.dot(oh.T, upd.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

        cands = [
            ("xla_scatter_f32", xla_scatter),
            ("xla_scatter_bf16", xla_scatter_bf16),
            ("sorted_scatter", sorted_scatter),
            ("segment_sum", segsum),
            ("segment_sum_sorted", segsum_sorted),
        ]
        if rows <= 20_000:
            cands.append(("onehot_mxu", onehot_mxu))

        ref = np.asarray(xla_scatter(cell, upd))
        print(f"--- {label}: {rows} rows, {n} updates ---", flush=True)
        for name, fn in cands:
            try:
                got = np.asarray(fn(cell, upd))
                err = float(np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9))
                ms = timeit(fn, cell, upd, iters=args.iters)
                print(f"{name:22s} {ms:8.3f} ms  rel_err={err:.2e}", flush=True)
            except Exception as e:
                print(f"{name:22s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()

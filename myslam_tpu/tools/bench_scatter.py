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


def bench_gather(n: int, iters: int) -> None:
    """Forward tri-plane gather: XLA row gather (ops/plane_sample) vs the
    Pallas VMEM-resident kernel (ops/pallas_sample) at room0 scale.

    The color atlas (~160k quad rows at 0.03 m) exceeds VMEM even in
    bf16, so the Pallas variant applies to the SDF atlas only — that is
    recorded here as part of the evidence (north-star Pallas item)."""
    import jax.tree_util  # noqa: F401

    from myslam_tpu.models.planes import make_layout
    from myslam_tpu.ops.pallas_sample import (
        make_sample_quad_pallas_vmem,
        plane_indices_and_fracs,
    )
    from myslam_tpu.ops.plane_sample import pack_quad, sample_fused

    bound = jnp.asarray([[-1.9, 8.18], [-2.2, 4.58], [-2.5, 2.78]])
    for res, label in (([0.24, 0.06], "sdf-atlas(0.06m)"),
                       ([0.24, 0.03], "color-atlas(0.03m)")):
        layout = make_layout(bound, res, 32)
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        atlas = 0.01 * jax.random.normal(
            k1, (layout.total_rows, 32), jnp.float32)
        quad = pack_quad(atlas, layout)
        p_nor = jax.random.uniform(k2, (n, 3), minval=-1.0, maxval=1.0)
        idx, wx, wy = plane_indices_and_fracs(layout, p_nor)
        vmem_mb = layout.total_rows * 128 * 2 / 1e6
        print(f"--- gather {label}: {layout.total_rows} rows "
              f"({vmem_mb:.1f} MB bf16 quad), {n} points ---", flush=True)

        @jax.jit
        def xla_fwd(quad, p_nor):
            return sample_fused(quad, layout, p_nor)

        def time_pts(fn, *args):
            from myslam_tpu.utils.timing import barrier
            out = fn(*args)
            barrier(out)
            t0 = time.time()
            for _ in range(iters):
                out = fn(*args)
            barrier(out)  # value fetch: block_until_ready lies via axon
            return (time.time() - t0) / iters * 1e3

        ref = np.asarray(xla_fwd(quad, p_nor))
        print(f"{'xla_sample_fused':22s} {time_pts(xla_fwd, quad, p_nor):8.3f} ms",
              flush=True)

        if vmem_mb < 13.0:
            try:
                pallas_fn = jax.jit(make_sample_quad_pallas_vmem(
                    layout, n, tile=512))
                got = np.asarray(pallas_fn(quad, idx, wx, wy))
                err = float(np.abs(got - ref).max()
                            / (np.abs(ref).max() + 1e-9))
                ms = time_pts(pallas_fn, quad, idx, wx, wy)
                print(f"{'pallas_vmem_bf16':22s} {ms:8.3f} ms  "
                      f"rel_err={err:.2e}", flush=True)
            except Exception as e:
                print(f"{'pallas_vmem_bf16':22s} FAILED: "
                      f"{type(e).__name__}: {e}", flush=True)
        else:
            print(f"{'pallas_vmem_bf16':22s} skipped: quad exceeds VMEM",
                  flush=True)

        # Manual-DMA gather (the idiom current Mosaic still lowers; f32
        # rows + tile<=512 per ops/pallas_sample.py toolchain notes).
        try:
            from myslam_tpu.ops.pallas_sample import (
                make_sample_quad_pallas_dma,
            )

            dma_fn = jax.jit(make_sample_quad_pallas_dma(
                layout, n, tile=256))
            got = np.asarray(dma_fn(quad, idx, wx, wy))
            err = float(np.abs(got - ref).max()
                        / (np.abs(ref).max() + 1e-9))
            ms = time_pts(dma_fn, quad, idx, wx, wy)
            print(f"{'pallas_dma_f32':22s} {ms:8.3f} ms  "
                  f"rel_err={err:.2e}", flush=True)
        except Exception as e:
            print(f"{'pallas_dma_f32':22s} FAILED: "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=160_000)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--gather", action="store_true",
                    help="also run the forward-gather comparison "
                         "(XLA vs Pallas)")
    args = ap.parse_args()
    n = args.n
    if args.gather:
        bench_gather(n, args.iters)

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

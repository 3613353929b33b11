#!/usr/bin/env python
"""A/B: mapping chunk with f32 vs bfloat16 quad-atlas reads.

``mapping.map_bf16`` casts the per-iteration packed quad atlases to
bf16 (engine/mapper.py queries_factory) — halving the gather +
pack-write HBM traffic of the sample path while Adam state, master
atlases, and loss math stay f32.  This tool measures what that buys at
the Replica operating point (680x1200, 4000 rays x 15 iters), for both
math lanes (reference-exact color and the top-K bench headline).

Interleaved rounds (A,B,A,B,...) with per-round pairing control the
tunnel's +-5-15 % drift better than two separate runs minutes apart
(the verify-skill rule); medians reported.

Usage: python -m myslam_tpu.tools.bench_map_bf16 [--rounds 5] [--iters 15]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=15)
    args = ap.parse_args()

    from myslam_tpu.tools.profile_mapping import build
    from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config
    from myslam_tpu.utils.timing import barrier

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cfg = load_config(
        os.path.join(repo, "configs", "Synthetic", "room.yaml"),
        DEFAULT_CONFIG)
    cfg = copy.deepcopy(cfg)
    cfg["cam"].update(H=680, W=1200, fx=600.0, fy=600.0,
                      cx=599.5, cy=339.5)
    cfg["mapping"]["pixels"] = 4000
    cfg["tracking"]["pixels"] = 2000
    topk = int(cfg["rendering"].get("color_topk", 12))

    import jax.numpy as jnp

    n_iters = args.iters
    results = {}
    for lane, k in (("topk", topk), ("exact", 0)):
        built = {}
        for name, bf16 in (("f32", False), ("bf16", True)):
            c = copy.deepcopy(cfg)
            c["mapping"]["map_bf16"] = bf16
            (jax, jnp, cam, scene, ms, poses, mask, slot_kf, kf_colors,
             kf_depths, mapper, _tracker, *_rest) = build(c, color_topk=k)
            params = {"map": ms, "poses": jnp.copy(poses)}
            opt_state = mapper.jit_init(params)
            W = poses.shape[0]
            key = jax.random.PRNGKey(1)

            def run(params, opt_state, mpr=mapper, args_=(mask, slot_kf,
                    jnp.int32(W), kf_colors, kf_depths, key)):
                return mpr.jit_chunk(
                    params, opt_state, *args_, jnp.int32(0),
                    jnp.float32(1.0), jnp.int32(n_iters), chunk=n_iters)

            params, opt_state, losses = run(params, opt_state)  # compile
            barrier(losses)
            built[name] = (run, params, opt_state)

        times = {"f32": [], "bf16": []}
        for _ in range(args.rounds):
            for name in ("f32", "bf16"):
                run, params, opt_state = built[name]
                t0 = time.time()
                params, opt_state, losses = run(params, opt_state)
                barrier(losses)
                times[name].append((time.time() - t0) * 1e3)
                built[name] = (run, params, opt_state)
        med = {n: sorted(ts)[len(ts) // 2] for n, ts in times.items()}
        results[lane] = {
            "f32_ms_per_iter": round(med["f32"] / n_iters, 2),
            "bf16_ms_per_iter": round(med["bf16"] / n_iters, 2),
            "speedup": round(med["f32"] / med["bf16"], 3),
            "all_ms": {n: [round(t, 1) for t in ts]
                       for n, ts in times.items()},
        }
        print(json.dumps({lane: results[lane]}), flush=True)
    print(json.dumps({"summary": {
        ln: {kk: vv for kk, vv in r.items() if kk != "all_ms"}
        for ln, r in results.items()}}))


if __name__ == "__main__":
    main()

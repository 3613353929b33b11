#!/usr/bin/env python
"""Empirical check of the scaling model's communication term (VERDICT r3
item 6).

SCALING.md's >=5x projection rests on two claims: (a) the mapping loss+
grad compute shards by n under ray DP (parity-tested on the virtual
mesh), and (b) the per-iteration collective volume equals the atlas
gradient pytree, rung at 2(n-1)/n (scaling_report.atlas_grad_bytes).
Wall-clock cannot be validated on this host (8 virtual devices share 2
physical cores — no real parallelism exists to measure), but claim (b)
CAN be checked exactly: compile the REAL ray-DP mapping chunk for an
n-device mesh and read the collective ops XLA actually inserted out of
the optimized HLO.

For each n this prints, per iteration: all-reduce / reduce-scatter /
all-gather bytes in the compiled program vs the model's payload, for
both the plain-DP optimizer (expect one all-reduce of the gradient
pytree) and the default ZeRO-style sharded optimizer (expect
reduce-scatter + all-gather of the same ring volume).

Usage: python -m myslam_tpu.tools.validate_scaling [--json]
       [--devices 2,4,8] [--smoke]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import re

import numpy as np

_COLLECTIVE_RE = re.compile(
    r"=\s*(\([^)]*\)|\S+)\s+"
    r"(all-reduce|all-gather|reduce-scatter|all-reduce-start|"
    r"all-gather-start|reduce-scatter-start|collective-permute)\(")
_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|u8|u16|u32|s8|s16|s32|pred)"
                       r"\[([\d,]*)\]")
_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "u8": 1,
                "u16": 2, "u32": 4, "s8": 1, "s16": 2, "s32": 4,
                "pred": 1}


def collective_bytes(hlo_text: str) -> dict:
    """Sum OUTPUT bytes of every collective op in an HLO module dump."""
    out: dict[str, float] = {}
    for m in _COLLECTIVE_RE.finditer(hlo_text):
        shape_str, op = m.group(1), m.group(2)
        op = op.replace("-start", "")
        b = 0
        for sm in _SHAPE_RE.finditer(shape_str):
            dims = sm.group(2)
            numel = int(np.prod([int(d) for d in dims.split(",") if d])
                        ) if dims else 1
            b += numel * _DTYPE_BYTES[sm.group(1)]
        out[op] = out.get(op, 0) + b
    return out


def compiled_collectives(cfg, n: int, zero_opt: bool,
                         impl: str = "spmd") -> dict:
    """Compile ONE real mapping iteration for an n-device mesh (abstract
    args — nothing executes) and return its collective byte counts.

    ``impl``: "spmd" = with_sharding_constraint ray DP (partitioner
    places the collectives); "shardmap" = explicit-collective DP (one
    psum of the gradient pytree per iteration)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from myslam_tpu.core.quaternion import matrix_to_cam_pose
    from myslam_tpu.engine.camera import Camera
    from myslam_tpu.engine.mapper import make_mapper
    from myslam_tpu.engine.scheduler import compute_bound
    from myslam_tpu.models.decoders import init_decoder_params
    from myslam_tpu.models.planes import init_map_state, make_layout
    from myslam_tpu.render.renderer import SceneGeometry

    cam = Camera.from_cfg(cfg)
    bound = compute_bound(cfg)
    c = int(cfg["model"]["c_dim"])
    pres, cres = cfg["planes_res"], cfg["c_planes_res"]
    sdf_layout = make_layout(bound, [pres["coarse"], pres["fine"]], c)
    color_layout = make_layout(bound, [cres["coarse"], cres["fine"]], c)
    r = cfg["rendering"]
    scene = SceneGeometry(
        sdf_layout, color_layout, tuple(map(tuple, bound.tolist())),
        float(cfg["model"]["truncation"]), int(r["n_stratified"]),
        int(r["n_importance"]), bool(r["perturb"]),
        color_topk=int(r.get("color_topk", 0)))

    mesh = Mesh(np.array(jax.devices()[:n]), ("dp",))
    if impl == "shardmap":
        mapper = make_mapper(cfg, scene, cam, dp_mesh=mesh)
    else:
        sharding = NamedSharding(mesh, P("dp"))
        opt_sharding = (NamedSharding(mesh, P("dp", None))
                        if zero_opt else None)
        mapper = make_mapper(cfg, scene, cam, ray_sharding=sharding,
                             opt_sharding=opt_sharding)

    key = jax.random.PRNGKey(0)
    ms = init_map_state(key, sdf_layout, color_layout,
                        init_decoder_params(key, c_dim=c))
    W = int(cfg["mapping"]["mapping_window_size"])
    poses = matrix_to_cam_pose(jnp.tile(jnp.eye(4), (W, 1, 1)))
    params = {"map": ms, "poses": poses}
    opt_struct = jax.eval_shape(mapper.jit_init, params)

    def st(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype)

    lowered = mapper.jit_chunk.lower(
        params, opt_struct,
        st((W,), jnp.float32), st((W,), jnp.int32), st((), jnp.int32),
        st((W, cam.H, cam.W, 3), jnp.float16),
        st((W, cam.H, cam.W), jnp.float32),
        st((2,), jnp.uint32), st((), jnp.int32), st((), jnp.float32),
        st((), jnp.int32), chunk=1)
    txt = lowered.compile().as_text()
    return collective_bytes(txt)


def run(cfg, devices, model_bytes):
    rows = []
    for n in devices:
        for impl, zero_opt in (("spmd", False), ("spmd", True),
                               ("shardmap", False)):
            cb = compiled_collectives(cfg, n, zero_opt, impl=impl)
            ring = 2.0 * (n - 1) / n
            # all-reduce moves the ring volume of its payload; ZeRO's
            # reduce-scatter + all-gather each move half of that same
            # ring volume -> compare WIRE volume to the model's.
            wire = (cb.get("all-reduce", 0) * ring
                    + (cb.get("reduce-scatter", 0)
                       + cb.get("all-gather", 0)) * ring / 2.0
                    + cb.get("collective-permute", 0))
            rows.append({
                "n": n, "impl": impl, "zero_opt": zero_opt,
                "hlo_bytes": cb,
                "wire_bytes_per_iter": int(wire),
                "model_wire_bytes": int(model_bytes * ring),
                "ratio_vs_model": round(
                    wire / (model_bytes * ring), 3) if n > 1 else None,
            })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=str, default="2,4,8")
    ap.add_argument("--smoke", action="store_true",
                    help="smoke-scale config (fast; CI-size atlases)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax
    if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        raise SystemExit(
            "run with XLA_FLAGS=--xla_force_host_platform_device_count=8 "
            "JAX_PLATFORMS=cpu (compile-only; no TPU needed)")
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from myslam_tpu.tools.scaling_report import atlas_grad_bytes
    from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cfg = load_config(
        os.path.join(repo, "configs", "Synthetic",
                     "room_smoke.yaml" if args.smoke else "room.yaml"),
        DEFAULT_CONFIG)
    cfg = copy.deepcopy(cfg)
    if not args.smoke:
        cfg["cam"].update(H=680, W=1200, fx=600.0, fy=600.0,
                          cx=599.5, cy=339.5)
        cfg["mapping"]["pixels"] = 4000

    model_bytes = atlas_grad_bytes(cfg)
    devices = [int(x) for x in args.devices.split(",")]
    rows = run(cfg, devices, model_bytes)
    report = {"model_grad_bytes": int(model_bytes), "rows": rows}
    if args.json:
        print(json.dumps(report))
    else:
        print(f"model atlas-grad payload: {model_bytes / 1e6:.2f} MB")
        for r in rows:
            print(r)


if __name__ == "__main__":
    main()

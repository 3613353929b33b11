#!/usr/bin/env python
"""Microbenchmarks of the render hot path on the current default device.

Times each stage of the mapping iteration in isolation (forward,
forward+grad, sampling, compositing) to locate where per-iteration time
goes.  Usage: python -m myslam_tpu.tools.microbench [--n 160000]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    # force a host fetch: block_until_ready may not cover remote tunnels
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.time() - t0) / iters * 1e3


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-rays", type=int, default=4000)
    parser.add_argument("--samples", type=int, default=40)
    args = parser.parse_args()

    from myslam_tpu.engine.scheduler import compute_bound
    from myslam_tpu.models.decoders import init_decoder_params
    from myslam_tpu.models.planes import init_map_state, make_layout
    from myslam_tpu.ops.plane_sample import (
        corner_row_map, pack_quad, sample_quad_corners)
    from myslam_tpu.models.decoders import decode_sdf_corners
    from myslam_tpu.render.renderer import SceneGeometry, render_rays
    from myslam_tpu.utils.config import load_config
    import os

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cfg = load_config(
        os.path.join(repo, "configs", "Synthetic", "room.yaml"),
        os.path.join(repo, "configs", "myslam.yaml"))
    bound = compute_bound(cfg)
    sdf_layout = make_layout(bound, [0.24, 0.06], 32)
    color_layout = make_layout(bound, [0.24, 0.03], 32)
    scene = SceneGeometry(
        sdf_layout, color_layout, tuple(map(tuple, bound.tolist())),
        0.06, 32, 8, True)
    key = jax.random.PRNGKey(0)
    ms = init_map_state(key, sdf_layout, color_layout,
                        init_decoder_params(key))
    print(f"sdf atlas rows: {sdf_layout.total_rows}, "
          f"color atlas rows: {color_layout.total_rows}")

    N = args.n_rays * args.samples
    p_nor = jax.random.uniform(key, (N, 3), jnp.float32, -1, 1)
    row_map_sdf = np.asarray(corner_row_map(sdf_layout))

    # stage 1: pack
    pack = jax.jit(lambda a: pack_quad(a, sdf_layout))
    print(f"pack_quad(sdf): {timeit(pack, ms.sdf_atlas):8.3f} ms")
    packc = jax.jit(lambda a: pack_quad(a, color_layout))
    print(f"pack_quad(color): {timeit(packc, ms.color_atlas):8.3f} ms")
    quad = pack(ms.sdf_atlas)

    # stage 2: gather + weight
    samp = jax.jit(lambda q, p: sample_quad_corners(q, sdf_layout, p))
    print(f"sample_quad_corners fwd ({N} pts): "
          f"{timeit(samp, quad, p_nor):8.3f} ms")

    # stage 3: + decode
    dec = jax.jit(lambda q, p, d: decode_sdf_corners(
        d, sample_quad_corners(q, sdf_layout, p), row_map_sdf))
    print(f"sample+decode fwd: {timeit(dec, quad, p_nor, ms.decoder):8.3f} ms")

    # stage 4: grad wrt atlas (pack + sample + decode + unpack-grad)
    def loss_atlas(a, p, d):
        q = pack_quad(a, sdf_layout)
        return jnp.sum(decode_sdf_corners(
            d, sample_quad_corners(q, sdf_layout, p), row_map_sdf))
    g_atlas = jax.jit(jax.grad(loss_atlas))
    print(f"grad wrt atlas: "
          f"{timeit(g_atlas, ms.sdf_atlas, p_nor, ms.decoder):8.3f} ms")

    # stage 5: grad wrt coords
    def loss_pts(p, q, d):
        return jnp.sum(decode_sdf_corners(
            d, sample_quad_corners(q, sdf_layout, p), row_map_sdf))
    g_pts = jax.jit(jax.grad(loss_pts))
    print(f"grad wrt coords: {timeit(g_pts, p_nor, quad, ms.decoder):8.3f} ms")

    # stage 6: full render_rays fwd
    rays_o = jnp.zeros((args.n_rays, 3)) + jnp.asarray(bound.mean(axis=1))
    rays_d = jax.random.normal(key, (args.n_rays, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    gt_depth = jnp.full((args.n_rays,), 1.5)

    for imp in (False, True):
        r = jax.jit(lambda m, ro, rd, gd, k, imp=imp: render_rays(
            k, m, scene, ro, rd, gd, importance=imp))
        print(f"render_rays fwd imp={int(imp)}: "
              f"{timeit(r, ms, rays_o, rays_d, gt_depth, key):8.3f} ms")

        def loss_render(m, ro, rd, gd, k, imp=imp):
            depth, color, sdf, z = render_rays(
                k, m, scene, ro, rd, gd, importance=imp)
            return jnp.sum(depth) + jnp.sum(color) + jnp.sum(sdf)
        g = jax.jit(jax.grad(loss_render))
        print(f"render_rays grad imp={int(imp)}: "
              f"{timeit(g, ms, rays_o, rays_d, gt_depth, key):8.3f} ms")


if __name__ == "__main__":
    main()

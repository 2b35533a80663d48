"""Probe VERDICT r4 task 2a: 16x16 sub-tile granules for depth-1.

Today's bench layout gives every 1024-lane traversal packet one 32x32
image tile and ONE shared secondary direction (rng_granule=1024 +
antithetic fold).  The candidate splits each packet into four 16x16
sub-tile granules (rng_granule=256): per packet the origins of each
granule span a quarter the area, but the packet now carries up to 8
(4 granules x antithetic pair) directions instead of 2.  This probe
times the depth-1 bounce + shadow DFS traversals under both layouts
(traversal only — the estimator is unbiased either way, same argument
as rng_granule's).

Usage: python tools/probe_quad.py [--reps 3]
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

SCENE = "/root/reference/media/pathtracer/advanced/CBbunny.dae"
C = 1024


def tile32_rank(width, height, quad=False):
    """Pixel-id -> rank for the tiles32 pixel order; quad=True orders
    each 32x32 tile by 16x16 quadrant first (so consecutive 256 ranks
    = one 16x16 sub-tile)."""
    py, px = np.meshgrid(np.arange(height), np.arange(width),
                         indexing="ij")
    t = 32
    tid = (py // t) * (width // t) + (px // t)
    iy, ix = py % t, px % t
    if quad:
        q = (iy // 16) * 2 + (ix // 16)
        within = q * 256 + (iy % 16) * 16 + (ix % 16)
    else:
        within = iy * t + ix
    return (tid * t * t + within).reshape(-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--spp", type=int, default=32)
    args = ap.parse_args()

    from cuda_raytracer_tpu.config import RenderConfig
    from cuda_raytracer_tpu.render.engine import WavefrontRenderer
    from cuda_raytracer_tpu.ops import shade as S
    from cuda_raytracer_tpu.ops.pallas.packet_dfs import (
        trace_closest_packets,
    )

    W, H, spp = 800, 600, args.spp
    WH = W * H
    cfg = RenderConfig(
        width=W, height=H, samples_per_frame=spp, max_depth=4,
        tree_width=4, max_leaf_size=32,
    )
    r = WavefrontRenderer(cfg, camera_mode="collada")
    r.load_scene(SCENE)
    scene = r.scene
    key = jax.random.PRNGKey(0)
    n = WH * spp
    valid = jnp.ones((n,), bool)

    # raster camera rays once; sample-major layouts via permutation:
    # slot j covers sample j // WH of the pixel at rank j % WH
    o0, d0 = S.generate_camera_rays(
        key, W, H, spp,
        jnp.asarray(r.camera.pos, jnp.float32),
        jnp.asarray(r.camera.c2w, jnp.float32),
        math.tan(math.radians(r.camera.hFov) / 2),
        math.tan(math.radians(r.camera.vFov) / 2),
    )

    dfs = jax.jit(lambda s, o, d, v: trace_closest_packets(
        s, o, d, v, kill_eps=cfg.shadow_eps))
    dfs_tl = jax.jit(lambda s, o, d, v, tl: trace_closest_packets(
        s, o, d, v, tl, kill_eps=cfg.shadow_eps))

    def bench(label, fn, rays):
        out = fn(scene, *rays)
        jax.block_until_ready(out.t)
        times = []
        for i in range(1, args.reps + 1):
            t0 = time.perf_counter()
            out = fn(scene, rays[0] + i * 1e-6, *rays[1:])
            float(jnp.sum(out.t))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"  {label:26s}: {dt*1e3:8.1f} ms "
              f"{n/dt/1e6:7.1f} Mrays/s", flush=True)
        return dt

    j = np.arange(n, dtype=np.int64)

    @jax.jit
    def make_d1(o, d, ug, us):
        """Full d1 ray construction in ONE program so the [N,*]
        intermediates (hit records etc.) die inside it — the probe
        otherwise OOMs holding three layouts' worth."""
        res = trace_closest_packets(scene, o, d, valid,
                                    kill_eps=cfg.shadow_eps)
        hit = S.compute_hits(scene, o, d, res.t, res.prim,
                             cfg.origin_eps)
        imp = jnp.ones((n, 3), jnp.float32)
        w_sh = S._spherical_sample(ug)
        o_b, d_b, imp_b, ok, _ = S.scatter(
            scene, hit, imp, jax.random.fold_in(key, 77),
            cfg.origin_eps, "uniform", w_shared=w_sh)
        res_b = trace_closest_packets(scene, o_b, d_b, ok,
                                      kill_eps=cfg.shadow_eps)
        hit_b = S.compute_hits(scene, o_b, d_b, res_b.t, res_b.prim,
                               cfg.origin_eps)
        o_s, d_s, max_t, li, ok_s = S.nee_shadow_rays(
            scene, hit_b, imp_b, 0, us, 1.0)
        return o_b, d_b, ok, o_s, d_s, max_t, ok_s

    results = {}
    for tag, quad, g in (("g1024 (bench)", False, 1024),
                         ("g256 quad", True, 256),
                         ("g256 raster-tile", False, 256)):
        rank = tile32_rank(W, H, quad=quad)
        pix_of_rank = np.argsort(rank)
        pixel_of_j = pix_of_rank[j % WH]
        perm = jnp.asarray(pixel_of_j * spp + (j // WH), jnp.int32)
        o, d = o0[perm], d0[perm]
        ug = jnp.repeat(
            jax.random.uniform(jax.random.fold_in(key, 6), (n // g, 2),
                               dtype=jnp.float32), g, axis=0)
        us = jnp.repeat(
            jax.random.uniform(jax.random.fold_in(key, 8), (n // g, 2),
                               dtype=jnp.float32), g, axis=0)
        o_b, d_b, ok, o_s, d_s, max_t, ok_s = make_d1(o, d, ug, us)
        del o, d, ug, us, perm
        print(f"-- layout {tag}", flush=True)
        tb = bench("bounce-d1 dfs", dfs, (o_b, d_b, ok))
        ts = bench("shadow-d1 dfs", dfs_tl, (o_s, d_s, ok_s, max_t))
        results[tag] = (tb, ts)
        del o_b, d_b, ok, o_s, d_s, max_t, ok_s
    print({k: (round(v[0] * 1e3, 1), round(v[1] * 1e3, 1))
           for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()

"""Probe: packet-correlated secondary sampling ("shared-u").

Hypothesis: the bounce/shadow passes are slow because hemisphere /
light samples are independent per ray, so every 1024-ray packet unions
~200 BVH nodes.  If all rays in a packet draw the SAME uniforms
(distinct per sample index, so each pixel's spp samples stay
independent — per-pixel variance is unchanged, only cross-pixel noise
correlation appears), rays leaving a flat surface share an exact
direction and packets become coherent by construction — the regime
where packet-DFS is 36x faster.

Emulates the sample-major layout by permuting depth-0 hits into
(sample-index s, pixel) order outside the timed region (production
would bake this into raygen, zero runtime cost), then draws shared
uniforms per 1024-lane packet.

Variants timed on the bounce-d1 and shadow-d1 passes:
  indep/dfs, indep/wf2+seed16 (current default), shared/dfs,
  shared/wf2+seed16 — for two pixel orders (tiles8 strip vs tiles32).

Usage: python tools/probe_shared_u.py [--spp 32] [--reps 3]
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


def tile_rank(width, height, t):
    py, px = np.meshgrid(np.arange(height), np.arange(width),
                         indexing="ij")
    rank = ((py // t) * (width // t) * t * t
            + (px // t) * t * t + (py % t) * t + (px % t))
    return rank.reshape(-1)  # pixel id -> rank


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from cuda_raytracer_tpu.config import RenderConfig
    from cuda_raytracer_tpu.render.engine import WavefrontRenderer
    from cuda_raytracer_tpu.ops import shade as S
    from cuda_raytracer_tpu.ops.seeds import seed_hits
    from cuda_raytracer_tpu.ops.pallas.packet_dfs import (
        trace_closest_packets,
    )
    from cuda_raytracer_tpu.ops.pallas.wavefront2 import (
        trace_closest_wavefront,
    )

    W, H, spp = 800, 600, args.spp
    WH = W * H
    cfg = RenderConfig(
        width=W, height=H, samples_per_frame=spp, max_depth=4,
        sample_order="tiles8", tree_width=4, max_leaf_size=32,
    )
    r = WavefrontRenderer(cfg, camera_mode="collada")
    r.load_scene(SCENE)
    scene = r.scene
    key = jax.random.PRNGKey(0)
    o, d = S.generate_camera_rays(
        key, W, H, spp,
        jnp.asarray(r.camera.pos, jnp.float32),
        jnp.asarray(r.camera.c2w, jnp.float32),
        math.tan(math.radians(r.camera.hFov) / 2),
        math.tan(math.radians(r.camera.vFov) / 2),
        pix_order="tiles8",
    )
    n = o.shape[0]
    valid = jnp.ones((n,), bool)
    print(f"N={n/1e6:.2f}M rays", flush=True)

    res = jax.jit(
        lambda s, o, d, v: trace_closest_packets(s, o, d, v)
    )(scene, o, d, valid)
    hit = S.compute_hits(scene, o, d, res.t, res.prim, cfg.origin_eps)
    imp = jnp.ones((n, 3), jnp.float32)

    # ---- permutations: new slot j = (s, pixel-rank) major ----
    # old slot = p8 * spp + s where p8 = tiles8 pixel rank
    j = np.arange(n, dtype=np.int64)
    s_of_j = j // WH
    perms = {}
    # tiles8 pixel order (packets = 128x8 pixel strips)
    p8_of_j = j % WH
    perms["t8"] = jnp.asarray(p8_of_j * spp + s_of_j, jnp.int32)
    # tiles32 pixel order (packets = 32x32 pixel squares)
    r8 = tile_rank(W, H, 8)     # pixel -> tiles8 rank
    pix_of_r8 = np.argsort(r8)  # tiles8 rank -> pixel
    r32 = tile_rank(W, H, 32)
    pix_of_r32 = np.argsort(r32)
    p8_of_pixel = r8
    q_of_j = j % WH
    pixel_of_j = pix_of_r32[q_of_j]
    perms["t32"] = jnp.asarray(
        p8_of_pixel[pixel_of_j] * spp + s_of_j, jnp.int32
    )

    def permute_hit(hit, perm):
        return jax.tree_util.tree_map(lambda a: a[perm], hit)

    def shared_u(k, npk):
        up = jax.random.uniform(k, (npk, 2), dtype=jnp.float32)
        return jnp.repeat(up, C, axis=0)

    k_sc = jax.random.fold_in(key, 77)

    def bounce_rays(hit_v, u):
        o_b, d_b, imp_b, ok, _ = S.scatter(
            scene, hit_v, imp, k_sc, cfg.origin_eps, "uniform", u=u
        )
        return o_b, d_b, ok

    def shadow_rays(hit_v, u):
        o_s, d_s, max_t, li_imp, ok = S.nee_shadow_rays(
            scene, hit_v, imp, 0, u, 1.0
        )
        return o_s, d_s, max_t, ok

    def t_dfs(s, o, d, v, tl=None):
        return trace_closest_packets(s, o, d, v, tl,
                                     kill_eps=cfg.shadow_eps)

    def t_wf2_seed(s, o, d, v, tl=None):
        sd = seed_hits(s, o, d, v, k=16)
        return trace_closest_wavefront(
            s, o, d, v, tl, kill_eps=cfg.shadow_eps,
            want_prim=tl is None, seed_t=sd.t, seed_prim=sd.prim)

    backends = {"dfs": jax.jit(t_dfs), "wf2+seed": jax.jit(t_wf2_seed)}

    def bench(label, fn, rays):
        try:
            out = fn(scene, *rays)
            jax.block_until_ready(out.t)
        except Exception as e:
            print(f"{label:26s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            return
        times = []
        o0 = rays[0]
        for i in range(1, args.reps + 1):
            t0 = time.perf_counter()
            out = fn(scene, o0 + i * 1e-6, *rays[1:])
            float(jnp.sum(out.t))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"{label:26s}: {dt*1e3:8.1f} ms  {n/dt/1e6:7.1f} Mrays/s",
              flush=True)

    # ---- bounce-d1 ----
    u_ind = jax.random.uniform(jax.random.fold_in(key, 5), (n, 2),
                               dtype=jnp.float32)
    rb = bounce_rays(hit, u_ind)
    for bk, fn in backends.items():
        bench(f"bounce indep/{bk}", fn, (rb[0], rb[1], rb[2]))
    for pname, perm in perms.items():
        hp = permute_hit(hit, perm)
        ub = shared_u(jax.random.fold_in(key, 6), n // C)
        rbp = bounce_rays(hp, ub)
        for bk, fn in backends.items():
            bench(f"bounce shared-{pname}/{bk}", fn,
                  (rbp[0], rbp[1], rbp[2]))

    # ---- shadow-d1 (NEE from the bounce-d1 hit points would need a
    # second trace; instead reuse d0 hits — coherence behavior is set
    # by the sampling, and live fractions match the d0 pass) ----
    rs = shadow_rays(hit, u_ind)
    for bk, fn in backends.items():
        bench(f"shadow indep/{bk}", fn, (rs[0], rs[1], rs[3], rs[2]))
    for pname, perm in perms.items():
        hp = permute_hit(hit, perm)
        us = shared_u(jax.random.fold_in(key, 8), n // C)
        rsp = shadow_rays(hp, us)
        for bk, fn in backends.items():
            bench(f"shadow shared-{pname}/{bk}", fn,
                  (rsp[0], rsp[1], rsp[3], rsp[2]))


if __name__ == "__main__":
    main()

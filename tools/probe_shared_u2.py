"""Probe 2 for packet-correlated sampling: the costs probe_shared_u
left unmeasured.

* primary pass under the tiles32 sample-major layout (32x32-pixel
  packets, 16x the tiles8-spp32 footprint) — does the camera pass get
  more expensive?
* RR-thinned depth-2/3 analogs: thin the shared-u bounce population to
  26%/11% live and time dfs vs dfs+compacted-payload vs wf2-compact.
  (Compaction preserves slot order, so thinned packets stay
  tile-local under shared-u.)

Usage: python tools/probe_shared_u2.py [--spp 32] [--reps 3]
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
    return rank.reshape(-1)


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

    def gen(order):
        return S.generate_camera_rays(
            key, W, H, spp,
            jnp.asarray(r.camera.pos, jnp.float32),
            jnp.asarray(r.camera.c2w, jnp.float32),
            math.tan(math.radians(r.camera.hFov) / 2),
            math.tan(math.radians(r.camera.vFov) / 2),
            pix_order=order,
        )

    o8, d8 = gen("tiles8")
    n = o8.shape[0]
    valid = jnp.ones((n,), bool)
    print(f"N={n/1e6:.2f}M rays", flush=True)

    # tiles32 sample-major camera rays via permutation of tiles8 rays
    j = np.arange(n, dtype=np.int64)
    s_of_j = j // WH
    r8 = tile_rank(W, H, 8)
    r32 = tile_rank(W, H, 32)
    pix_of_r32 = np.argsort(r32)
    pixel_of_j = pix_of_r32[j % WH]
    perm = jnp.asarray(r8[pixel_of_j] * spp + s_of_j, jnp.int32)
    o32, d32 = o8[perm], d8[perm]

    dfs = jax.jit(lambda s, o, d, v: trace_closest_packets(
        s, o, d, v, kill_eps=cfg.shadow_eps))
    dfs_tl = jax.jit(lambda s, o, d, v, tl: trace_closest_packets(
        s, o, d, v, tl, kill_eps=cfg.shadow_eps))
    wf2c = jax.jit(lambda s, o, d, v: trace_closest_wavefront(
        s, o, d, v, None, kill_eps=cfg.shadow_eps, compact=True))
    dfs_c = None  # packet-DFS has no compact arg; emulate via wf2 partition

    def bench(label, fn, rays):
        try:
            out = fn(scene, *rays)
            jax.block_until_ready(out.t)
        except Exception as e:
            print(f"{label:28s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            return
        times = []
        for i in range(1, args.reps + 1):
            t0 = time.perf_counter()
            out = fn(scene, rays[0] + i * 1e-6, *rays[1:])
            float(jnp.sum(out.t))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"{label:28s}: {dt*1e3:8.1f} ms  {n/dt/1e6:7.1f} Mrays/s",
              flush=True)

    bench("primary tiles8-spp32/dfs", dfs, (o8, d8, valid))
    bench("primary tiles32-smaj/dfs", dfs, (o32, d32, valid))

    # ---- RR-thinned shared-u bounce (depth-2/3 analog) ----
    res = dfs(scene, o32, d32, valid)
    hit = jax.tree_util.tree_map(lambda a: a, None) if False else None
    hitrec = S.compute_hits(scene, o32, d32, res.t, res.prim,
                            cfg.origin_eps)
    imp = jnp.ones((n, 3), jnp.float32)
    up = jnp.repeat(
        jax.random.uniform(jax.random.fold_in(key, 6), (n // C, 2),
                           dtype=jnp.float32), C, axis=0)
    o_b, d_b, imp_b, ok, _ = S.scatter(
        scene, hitrec, imp, jax.random.fold_in(key, 77),
        cfg.origin_eps, "uniform", u=up)
    for frac, tag in ((0.26, "d2"), (0.11, "d3")):
        rr = jax.random.uniform(jax.random.fold_in(key, 99),
                                (n,)) < frac
        v_thin = ok & rr
        live = float(jnp.mean(v_thin.astype(jnp.float32)))
        print(f"-- thinned {tag}: live={live:.2f}", flush=True)
        bench(f"bounce-{tag} shared/dfs", dfs, (o_b, d_b, v_thin))
        bench(f"bounce-{tag} shared/wf2-cmp", wf2c, (o_b, d_b, v_thin))


if __name__ == "__main__":
    main()

"""Probe: depth-0 NEE shadow pass backend A/B at the bench operating
point (spp=32, tiles8, W=4/ml=32).

The r3 hybrid table (BENCHNOTES) picked DFS for shadow-d0 (221 vs 574
ms at 7.68M rays), but that wf2 number predates the lite merge
(want_prim=False), the x2 merge cascade, and the K=16 seeded bounds —
each of which specifically helps the shadow pass.  Re-measure at the
current code: dfs vs dfs+seed16 vs wf2-lite vs wf2-lite+seed16.

Usage: python tools/probe_shadow0.py [--spp 32] [--reps 3]
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

    cfg = RenderConfig(
        width=800, height=600, samples_per_frame=args.spp,
        max_depth=2, sample_order="tiles8", tree_width=4,
        max_leaf_size=32,
    )
    r = WavefrontRenderer(cfg, camera_mode="collada")
    r.load_scene(SCENE)
    scene = r.scene
    key = jax.random.PRNGKey(0)
    o, d = S.generate_camera_rays(
        key, cfg.width, cfg.height, cfg.samples_per_frame,
        jnp.asarray(r.camera.pos, jnp.float32),
        jnp.asarray(r.camera.c2w, jnp.float32),
        math.tan(math.radians(r.camera.hFov) / 2),
        math.tan(math.radians(r.camera.vFov) / 2),
        pix_order="tiles8",
    )
    n = o.shape[0]
    valid = jnp.ones((n,), bool)
    print(f"N={n/1e6:.2f}M camera rays", flush=True)

    # primary hit points -> depth-0 NEE shadow rays (the real pass)
    res = jax.jit(
        lambda s, o, d, v: trace_closest_packets(s, o, d, v)
    )(scene, o, d, valid)
    hit = S.compute_hits(scene, o, d, res.t, res.prim, cfg.origin_eps)
    u = jax.random.uniform(jax.random.fold_in(key, 7), (n, 2),
                           dtype=jnp.float32)
    imp = jnp.ones((n, 3), jnp.float32)
    o_s, d_s, max_t, li_imp, ok = S.nee_shadow_rays(
        scene, hit, imp, 0, u, 1.0
    )
    jax.block_until_ready(o_s)
    live = float(jnp.mean(ok.astype(jnp.float32)))
    print(f"shadow-d0 live fraction: {live:.2f}", flush=True)

    def var_dfs(s, o, d, v, tl):
        return trace_closest_packets(s, o, d, v, tl,
                                     kill_eps=cfg.shadow_eps)

    def var_dfs_seed(s, o, d, v, tl):
        sd = seed_hits(s, o, d, v, k=16)
        return trace_closest_packets(s, o, d, v, tl,
                                     kill_eps=cfg.shadow_eps,
                                     seed_t=sd.t, seed_prim=sd.prim)

    def var_wf2(s, o, d, v, tl):
        return trace_closest_wavefront(s, o, d, v, tl,
                                       kill_eps=cfg.shadow_eps,
                                       want_prim=False)

    def var_wf2_seed(s, o, d, v, tl):
        sd = seed_hits(s, o, d, v, k=16)
        return trace_closest_wavefront(s, o, d, v, tl,
                                       kill_eps=cfg.shadow_eps,
                                       want_prim=False,
                                       seed_t=sd.t, seed_prim=sd.prim)

    for name, fn in (("dfs", var_dfs), ("dfs+seed16", var_dfs_seed),
                     ("wf2-lite", var_wf2),
                     ("wf2-lite+seed16", var_wf2_seed)):
        f = jax.jit(fn)
        try:
            out = f(scene, o_s, d_s, ok, max_t)
            jax.block_until_ready(out.t)
        except Exception as e:
            print(f"{name:16s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        times = []
        for i in range(1, args.reps + 1):
            t0 = time.perf_counter()
            out = f(scene, o_s + i * 1e-6, d_s, ok, max_t)
            float(jnp.sum(out.t))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"{name:16s}: {dt*1e3:8.1f} ms  {n/dt/1e6:7.1f} Mrays/s",
              flush=True)


if __name__ == "__main__":
    main()

"""Per-stage TPU timing of the traversal pipeline on CBbunny.

Usage: python tools/profile_trace.py [--n N] [--xla] [--scatter]

Measures (wall, post-block_until_ready):
  - full trace_closest_wavefront on N camera rays
  - the final scatter-min merge alone (microbench)
  - optionally the XLA fallback trace_closest
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SCENE = "/root/reference/media/pathtracer/advanced/CBbunny.dae"


def timed(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=960 * 1024)
    ap.add_argument("--xla", action="store_true")
    ap.add_argument("--scatter", action="store_true")
    ap.add_argument("--pallas2", action="store_true")
    args = ap.parse_args()

    from cuda_raytracer_tpu.config import RenderConfig
    from cuda_raytracer_tpu.render.engine import WavefrontRenderer
    from cuda_raytracer_tpu.ops import shade as S

    cfg = RenderConfig(width=800, height=600, samples_per_frame=2)
    r = WavefrontRenderer(cfg, camera_mode="collada")
    r.load_scene(SCENE)
    scene = r.scene
    print("prims:", scene.num_prims, "nodes:", scene.bvh.outlets.shape[0],
          "levels:", scene.bvh.num_levels,
          "level profile:", [len(lv) for lv in scene.bvh.levels],
          "level_leaf:", scene.bvh.level_leaf)

    N = args.n
    key = jax.random.PRNGKey(0)
    o, d = S.generate_camera_rays(
        key, cfg.width, cfg.height, cfg.samples_per_frame,
        jnp.asarray(r.camera.pos, jnp.float32),
        jnp.asarray(r.camera.c2w, jnp.float32),
        math.tan(math.radians(r.camera.hFov) / 2),
        math.tan(math.radians(r.camera.vFov) / 2),
    )
    N = min(N, o.shape[0])
    o, d = o[:N], d[:N]
    valid = jnp.ones((N,), bool)
    print("rays:", N)

    if args.pallas2:
        from cuda_raytracer_tpu.ops.pallas.wavefront2 import (
            trace_closest_wavefront as trace2,
        )

        f = jax.jit(lambda s, o, d, v: trace2(s, o, d, v))
        dt, res = timed(f, scene, o, d, valid)
        print(f"pallas2 trace: {dt*1e3:.2f} ms  -> {N/dt/1e6:.2f} Mrays/s, "
              f"hits={int((res.prim >= 0).sum())}, dropped={int(res.dropped)}")
        # shadow variant (early-kill path)
        tl = jnp.full((N,), 1.5, jnp.float32)
        f2 = jax.jit(lambda s, o, d, v, tl: trace2(s, o, d, v, tl))
        dt, res = timed(f2, scene, o, d, valid, tl)
        print(f"pallas2 shadow: {dt*1e3:.2f} ms -> {N/dt/1e6:.2f} Mrays/s")

    if args.xla:
        from cuda_raytracer_tpu.ops.traverse import trace_closest

        f = jax.jit(lambda s, o, d, v: trace_closest(s, o, d, v))
        dt, res = timed(f, scene, o, d, valid)
        print(f"xla trace:  {dt*1e3:.2f} ms  -> {N/dt/1e6:.2f} Mrays/s, "
              f"hits={int((res.prim >= 0).sum())}")

    if args.scatter:
        # merge microbench: M entries scatter-min into N rays
        for M in (N, 3 * N):
            ray = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, N)
            bits = jax.random.randint(
                jax.random.PRNGKey(2), (M,), 0, 2**30, dtype=jnp.int32
            )

            def merge(ray, bits):
                best = jnp.full((N,), 2**30, jnp.int32)
                best = best.at[ray].min(bits, mode="drop")
                win = bits == best[ray]
                tgt = jnp.where(win, ray, N)
                prim = jnp.full((N + 1,), -1, jnp.int32)
                prim = prim.at[tgt].set(jnp.arange(M, dtype=jnp.int32) % 1000,
                                        mode="drop")
                return best, prim

            dt, _ = timed(jax.jit(merge), ray, bits)
            print(f"scatter-min merge M={M}: {dt*1e3:.2f} ms "
                  f"({M/dt/1e6:.1f} M entries/s)")


if __name__ == "__main__":
    main()

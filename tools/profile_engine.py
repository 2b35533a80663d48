"""Per-depth wall-time profile of the engine at the bench operating
point (CBbunny 800x600, spp=32/pass, tiles8, W=4/ml=32, hybrid
backends, RR@2, seeds on secondary passes).

Forces a real device sync after each per-depth executable by reducing
one carry array to a python float (the axon runtime's
block_until_ready does not synchronize — BENCHNOTES).  Perturbs the
key per rep so the runtime cannot dedupe byte-identical dispatches.

Usage: python tools/profile_engine.py [--spp 32] [--reps 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SCENE = "/root/reference/media/pathtracer/advanced/CBbunny.dae"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ps", type=int, default=0,
                    help="packet_size override (0 = default)")
    ap.add_argument("--pss", type=int, default=0,
                    help="packet_size_secondary override")
    args = ap.parse_args()

    from cuda_raytracer_tpu.config import RenderConfig
    from cuda_raytracer_tpu.render.engine import WavefrontRenderer

    cfg = RenderConfig(
        width=800, height=600, samples_per_frame=args.spp,
        total_samples=64, max_depth=4,
        nee_schedule=((1, 1.0), (1, 1.0), (1, 1.0), (1, 1.0)),
        tree_width=4, max_leaf_size=32,
        # bench.py operating point (shared-u, BENCHNOTES r3)
        sample_order="tiles32s", rng_granule=1024,
        rr_start_depth=2, traversal="dfs", traversal_secondary="dfs",
        traversal_rr="pallas",
        **({"packet_size": args.ps} if args.ps else {}),
        **({"packet_size_secondary": args.pss} if args.pss else {}),
    )
    r = WavefrontRenderer(cfg, camera_mode="collada")
    r.load_scene(SCENE)
    r.setup()

    scene = r.scene
    cam = r._camera_arrays()
    raygen_jit = r._raygen_frame_jit
    depth_jits = r._depth_jits
    film_jit = r._film_jit

    def sync(x):
        return float(jnp.sum(x))

    import numpy as np
    final = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    for rep in range(args.reps):
        key = jax.random.PRNGKey(100 + rep)
        t0 = time.perf_counter()
        carry = raygen_jit(cam, key)
        sync(carry[0][::4096, 0])
        tg = time.perf_counter() - t0
        line = [("gen", tg)]
        for i, dj in enumerate(depth_jits):
            t0 = time.perf_counter()
            carry = dj(scene, carry, key)
            sync(carry[4][::4096, 0])
            line.append((f"d{i}", time.perf_counter() - t0))
        t0 = time.perf_counter()
        final2, post = film_jit(carry[4], final, jnp.int32(64), False)
        sync(post[::4096, 0])
        line.append(("film", time.perf_counter() - t0))
        tot = sum(dt for _, dt in line)
        print("  ".join(f"{k}={dt*1e3:7.1f}" for k, dt in line)
              + f"   total={tot*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()

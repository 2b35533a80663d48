"""Does WavefrontRenderer.render() actually block on the axon runtime?

render() ends with final.block_until_ready(), which BENCHNOTES says is
a no-op on this runtime.  If so, per-frame walls measured by bench.py
and tools/ab_engine.py are pipeline-skewed: a frame's wall charges the
PREVIOUS frame's unfinished device work (or none, while the queue
fills).  Measure: time render(), then time a forced reduction of the
final image (float(jnp.sum(...)) forces execution), then time a numpy
readback.  If render() truly blocks, the sum is ~instant.

Usage: python tools/probe_sync.py [--spp 32]
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
    args = ap.parse_args()

    from cuda_raytracer_tpu.config import RenderConfig
    from cuda_raytracer_tpu.render.engine import WavefrontRenderer

    cfg = RenderConfig(
        width=800, height=600, samples_per_frame=args.spp,
        total_samples=256, max_depth=4,
        nee_schedule=((1, 1.0),) * 4,
        tree_width=4, max_leaf_size=32,
        sample_order="tiles32s", rng_granule=1024,
        rr_start_depth=2, traversal="dfs", traversal_secondary="dfs",
        traversal_rr="pallas",
    )
    r = WavefrontRenderer(cfg, camera_mode="collada")
    r.load_scene(SCENE)
    r.render()  # compile + warm
    float(jnp.sum(r._final_image))  # drain the queue

    for i in range(4):
        t0 = time.perf_counter()
        r.render()
        t_render = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(r._final_image))
        t_sum = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = r.get_raw_image()
        t_np = time.perf_counter() - t0
        print(f"rep {i}: render()={t_render*1e3:7.1f} ms  "
              f"forced-sum={t_sum*1e3:7.1f} ms  numpy={t_np*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()

"""Interleaved engine-level A/B at the bench operating point.

Separate bench.py invocations vary by ~10% on the tunneled v5e, so
engine variants must be timed ROUND-ROBIN in one process: each variant
gets its own WavefrontRenderer (compiled once), then frames run
interleaved and per-frame wall times are compared.

Usage: python tools/ab_engine.py [--variants seeded,noseed,allseed]
       [--reps 6]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.render.engine import WavefrontRenderer

SCENE = "/root/reference/media/pathtracer/advanced/CBbunny.dae"

VARIANTS = {
    # kwargs on top of the bench operating point
    "seeded": {},                                  # current defaults
    "noseed": {"seed_k": 0},
    "allseed": {"seed_primary": True},
    "seed32": {"seed_k": 32},
    "bf16": {"slab_bf16": True},
    "fc": {},  # placeholder for future knobs
    # packet-correlated sampling (r3): sample-major 32x32 tiles +
    # shared draws per 1024-lane packet; secondary passes coherent by
    # construction -> packet-DFS everywhere except RR-thinned depths
    "shared": {"sample_order": "tiles32s", "rng_granule": 1024,
               "traversal_secondary": "dfs", "traversal_rr": "pallas"},
    # same but keep wavefront2 on secondary passes (isolates the
    # sampling change from the backend switch)
    "sharedwf2": {"sample_order": "tiles32s", "rng_granule": 1024},
    # shared draws at granule 1024 but DFS also on RR depths
    "shareddfs": {"sample_order": "tiles32s", "rng_granule": 1024,
                  "traversal_secondary": "dfs", "traversal_rr": "dfs"},
    # bench.py r3e defaults, for A/B against the variants below
    "r3e": {"sample_order": "tiles32s", "rng_granule": 1024,
            "traversal_secondary": "dfs", "traversal_rr": "pallas"},
    # r3e without the antithetic direction fold (shared local-frame
    # uniforms only — isolates the fold's packet-coherence win)
    "r3e_nofold": {"sample_order": "tiles32s", "rng_granule": 1024,
                   "traversal_secondary": "dfs", "traversal_rr": "pallas",
                   "rng_fold_dirs": False},
    # granule sweep: more draws per packet (finer stratification,
    # less coherence) at the same tiles32s layout
    "r3e_g512": {"sample_order": "tiles32s", "rng_granule": 512,
                 "traversal_secondary": "dfs", "traversal_rr": "pallas"},
    "r3e_g2048": {"sample_order": "tiles32s", "rng_granule": 2048,
                  "traversal_secondary": "dfs", "traversal_rr": "pallas"},
    # secondary packet-size sweep under shared-u (C<=granule keeps
    # one draw per packet)
    "r3e_c512": {"sample_order": "tiles32s", "rng_granule": 1024,
                 "traversal_secondary": "dfs", "traversal_rr": "pallas",
                 "packet_size_secondary": 512},
    "r3e_c2048": {"sample_order": "tiles32s", "rng_granule": 1024,
                  "traversal_secondary": "dfs", "traversal_rr": "pallas",
                  "packet_size_secondary": 2048},
    # round 4: whole-depth compaction at RR depths (r3e + compact)
    "r4": {"sample_order": "tiles32s", "rng_granule": 1024,
           "traversal_secondary": "dfs", "traversal_rr": "pallas",
           "compact_depths": True},
    # secondary packet-size re-sweep UNDER shared-u + fold + compaction
    # (the r3 C-sweep predates all three — VERDICT r3 task 8)
    "r4_c512": {"sample_order": "tiles32s", "rng_granule": 1024,
                "traversal_secondary": "dfs", "traversal_rr": "pallas",
                "compact_depths": True, "packet_size_secondary": 512},
    "r4_c2048": {"sample_order": "tiles32s", "rng_granule": 1024,
                 "traversal_secondary": "dfs", "traversal_rr": "pallas",
                 "compact_depths": True, "packet_size_secondary": 2048},
    # granule sweep under compaction
    "r4_g512": {"sample_order": "tiles32s", "rng_granule": 512,
                "traversal_secondary": "dfs", "traversal_rr": "pallas",
                "compact_depths": True},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="seeded,noseed")
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()
    names = args.variants.split(",")

    rs = {}
    for nm in names:
        kw = dict(
            width=800, height=600, samples_per_frame=32, total_samples=64,
            max_depth=4, nee_schedule=((1, 1.0),) * 4,
            sample_order="tiles8", rr_start_depth=2,
            tree_width=4, max_leaf_size=32,
            traversal="dfs", traversal_secondary="pallas",
        )
        kw.update(VARIANTS[nm])
        cfg = RenderConfig(**kw)
        r = WavefrontRenderer(cfg, camera_mode="collada")
        r.load_scene(SCENE)
        r.render()  # compile + warm
        rs[nm] = r
        print(f"{nm}: compiled", flush=True)

    times = {nm: [] for nm in names}
    for rep in range(args.reps):
        order = names[rep % len(names):] + names[: rep % len(names)]
        for nm in order:
            r = rs[nm]
            t0 = time.perf_counter()
            r.render()  # render() blocks on the final image
            times[nm].append(time.perf_counter() - t0)
    for nm in names:
        ts = sorted(times[nm])
        print(f"{nm:8s}: min {ts[0]:.3f}s  med {ts[len(ts)//2]:.3f}s  "
              f"all {[f'{t:.2f}' for t in times[nm]]}", flush=True)


if __name__ == "__main__":
    main()

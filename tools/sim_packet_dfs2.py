"""Packet-DFS sim round 2: ray binning + BVH shape tuning.

Measures union-visit counts for bounce rays after Morton(origin)+octant
sorting, and sweeps max_leaf_size / tree_width, to pick the design
point for the DFS kernel.
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from sim_packet_dfs import sim_traversal, ray_sets, load_scene


def morton_octant_key(o, d, bb_min, bb_max, bits=5):
    q = ((o - bb_min) / (bb_max - bb_min + 1e-9) * (1 << bits)).astype(np.int64)
    q = np.clip(q, 0, (1 << bits) - 1)
    key = np.zeros(len(o), np.int64)
    for b in range(bits):
        for a in range(3):
            key |= ((q[:, a] >> b) & 1) << (3 * b + a)
    octant = ((d[:, 0] > 0).astype(np.int64) * 4
              + (d[:, 1] > 0).astype(np.int64) * 2
              + (d[:, 2] > 0).astype(np.int64))
    # direction-major: packets share an octant, then cluster by origin
    return octant * (1 << (3 * bits)) + key


def run(scene_np, name, o, d, valid, tl, C, shadow=False):
    N = len(o)
    nC = N // C
    take = np.linspace(0, nC - 1, min(nC, 48)).astype(int)
    idx = (take[:, None] * C + np.arange(C)[None]).reshape(-1)
    t0 = time.time()
    iv, lv, lp, _, _ = sim_traversal(
        scene_np, o[idx], d[idx], valid[idx], tl[idx], C, shadow=shadow)
    dt = time.time() - t0
    vr = C / 1024
    W = scene_np[0].shape[1]
    cyc = (iv.sum() * (W * 38 * vr + 100) + lv.sum() * 100
           + lp.sum() / 8 * 70 * vr)
    us = cyc / 940
    per_ray = us / (len(take) * C)
    full_ms = per_ray * N / 1e3
    print(f"  {name:16s}: inner={iv.mean():7.1f} leaf={lv.mean():6.1f} "
          f"prims={lp.mean():7.0f} -> {full_ms:6.2f} ms "
          f"({N/(full_ms/1e3)/1e6:6.1f} Mrays/s) [{dt:.0f}s]")
    return full_ms


def main():
    dae = "/root/reference/media/pathtracer/advanced/CBbunny.dae"

    for tw, ml in ((4, 32), (4, 8), (8, 16)):
        from cuda_raytracer_tpu.render.engine import WavefrontRenderer
        from cuda_raytracer_tpu.config import RenderConfig
        cfg = RenderConfig(width=800, height=600, samples_per_frame=1,
                           max_depth=2, traversal="xla", tree_width=tw,
                           max_leaf_size=ml)
        r = WavefrontRenderer(cfg, camera_mode="cutracer")
        r.load_scene(dae)
        s = r.scene
        scene_np = (
            np.asarray(s.bvh.outlets), np.asarray(s.bvh.child_min),
            np.asarray(s.bvh.child_max), np.asarray(s.bvh.leaf_start),
            np.asarray(s.bvh.leaf_range), np.asarray(s.v0),
            np.asarray(s.v1), np.asarray(s.v2), np.asarray(s.prim_type),
        )
        print(f"\n=== W={tw} max_leaf={ml}: {len(scene_np[0])} nodes, "
              f"{len(s.bvh.levels)} levels ===")
        sets = ray_sets(r)
        o, d, valid, tl = sets["bounce"]
        bb_min = np.asarray(s.bvh.child_min)[0].min(0)
        bb_max = np.asarray(s.bvh.child_max)[0].max(0)
        key = morton_octant_key(o, d, bb_min, bb_max)
        order = np.argsort(key, kind="stable")

        for C in (256, 512, 1024):
            print(f"  -- C={C}")
            run(scene_np, "primary", *sets["primary"], C)
            run(scene_np, "shadow", *sets["shadow"], C, shadow=True)
            run(scene_np, "bounce-sorted", o[order], d[order], valid[order],
                tl[order], C)


if __name__ == "__main__":
    main()

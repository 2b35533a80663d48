"""Large-scene traversal benchmark (VERDICT r3 task 8).

The reference streams dragon-class scenes (200k-900k prims) from GPU
global memory; this measures the TPU equivalents on the procedural
terrain (models/terrain.py): packet-DFS with HBM-resident tables vs
wavefront2 (HBM-native by design), on primary/shadow/bounce passes.

Usage: python tools/bench_large.py [--n 500] [--spp 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cuda_raytracer_tpu.models.terrain import terrain_scene
from cuda_raytracer_tpu.ops import shade as S
from cuda_raytracer_tpu.ops.pallas.packet_dfs import (
    dfs_tables_fit_vmem, trace_closest_packets,
)
from cuda_raytracer_tpu.ops.pallas.wavefront2 import trace_closest_wavefront
from cuda_raytracer_tpu.render.flatscene import flatten_scene


def bench(f, scene, args, n, label, reps=3):
    try:
        res = f(scene, *args)
        jax.block_until_ready(res.t)
    except Exception as e:
        print(f"{label:28s}: FAILED {type(e).__name__}: {e}", flush=True)
        return None
    times = []
    for i in range(1, reps + 1):
        args_i = (args[0] + i * 1e-6,) + tuple(args[1:])
        t0 = time.perf_counter()
        r2 = f(scene, *args_i)
        float(jnp.sum(r2.t))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{label:28s}: {dt*1e3:8.1f} ms  {n/dt/1e6:7.1f} Mrays/s",
          flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    args = ap.parse_args()

    t0 = time.perf_counter()
    sc = terrain_scene(n=args.n)
    t1 = time.perf_counter()
    scene, bvh = flatten_scene(sc, tree_width=8, max_leaf_size=16)
    t2 = time.perf_counter()
    ntris = 2 * (args.n - 1) ** 2
    print(f"terrain n={args.n}: {ntris} tris, gen {t1-t0:.2f}s, "
          f"BVH+flatten {t2-t1:.2f}s", flush=True)
    print(f"node_dfs {scene.bvh.node_dfs.shape} "
          f"({scene.bvh.node_dfs.nbytes/1e6:.1f} MB), prim_groups "
          f"{scene.bvh.prim_groups.shape} "
          f"({scene.bvh.prim_groups.nbytes/1e6:.1f} MB), "
          f"fits_vmem={dfs_tables_fit_vmem(scene.bvh)}", flush=True)

    # camera above the terrain looking down at an angle
    import math
    n_rays = args.width * args.height * args.spp
    key = jax.random.PRNGKey(0)
    pos = jnp.asarray([0.0, 1.0, 1.6], jnp.float32)
    fwd = np.array([0.0, -0.55, -1.0])
    fwd /= np.linalg.norm(fwd)
    right = np.cross([0, 1, 0], -fwd)
    right /= np.linalg.norm(right)
    up = np.cross(-fwd, right)
    c2w = jnp.asarray(np.stack([right, up, -fwd], axis=1), jnp.float32)
    o, d = S.generate_camera_rays(
        key, args.width, args.height, args.spp, pos, c2w,
        math.tan(math.radians(50.0) / 2), math.tan(math.radians(38.0) / 2),
        pix_order="tiles8",
    )
    valid = jnp.ones((n_rays,), bool)

    dfs_hbm = jax.jit(lambda s, o, d, v: trace_closest_packets(
        s, o, d, v, vmem_tables=False))
    wf2 = jax.jit(lambda s, o, d, v: trace_closest_wavefront(s, o, d, v))
    backends = [("dfs-hbm", dfs_hbm), ("wavefront2", wf2)]
    if dfs_tables_fit_vmem(scene.bvh):
        backends.insert(0, ("dfs-vmem", jax.jit(
            lambda s, o, d, v: trace_closest_packets(s, o, d, v))))

    print(f"\n-- primary ({n_rays} rays, tiles8 spp={args.spp})",
          flush=True)
    res = None
    for name, f in backends:
        r = bench(f, scene, (o, d, valid), n_rays, f"  {name}")
        res = res or r

    # parity spot-check on 64k rays vs the XLA oracle
    from cuda_raytracer_tpu.ops.traverse import trace_closest

    m = 65536
    sub = trace_closest(scene, o[:m], d[:m], valid[:m])
    got = dfs_hbm(scene, o[:m], d[:m], valid[:m])
    pa, pb = np.asarray(got.prim), np.asarray(sub.prim)
    agree = np.array_equal(pa < 0, pb < 0)
    both = (pa >= 0) & (pb >= 0)
    pm = float(np.mean(pa[both] == pb[both])) if both.any() else 1.0
    print(f"parity dfs-hbm vs xla: hit/miss {agree} prim {pm:.5f}",
          flush=True)

    if res is not None:
        hit = S.compute_hits(scene, o, d, res.t, res.prim, 1e-3)
        u = jax.random.uniform(jax.random.fold_in(key, 7),
                               (n_rays, 2), dtype=jnp.float32)
        o_s, d_s, max_t, li, ok = S.nee_shadow_rays(
            scene, hit, jnp.ones_like(o), 0, u, 1.0)
        dfs_hbm_s = jax.jit(lambda s, o, d, v, tl: trace_closest_packets(
            s, o, d, v, tl, vmem_tables=False))
        wf2_s = jax.jit(lambda s, o, d, v, tl: trace_closest_wavefront(
            s, o, d, v, tl))
        print("-- shadow", flush=True)
        bench(dfs_hbm_s, scene, (o_s, d_s, ok, max_t), n_rays,
              "  dfs-hbm")
        bench(wf2_s, scene, (o_s, d_s, ok, max_t), n_rays,
              "  wavefront2")
        o_b, d_b, imp2, vb, _ = S.scatter(
            scene, hit, jnp.ones_like(o), jax.random.fold_in(key, 9))
        print("-- bounce", flush=True)
        bench(dfs_hbm, scene, (o_b, d_b, vb), n_rays, "  dfs-hbm")
        bench(wf2, scene, (o_b, d_b, vb), n_rays, "  wavefront2")


if __name__ == "__main__":
    main()

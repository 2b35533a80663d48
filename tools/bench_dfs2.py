"""Benchmark packet-DFS v3 on TPU: spp=2 raster vs spp=16 8x8-tiled
sample order, primary / shadow / bounce (sorted and unsorted)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.render.engine import WavefrontRenderer
from cuda_raytracer_tpu.ops import shade as S
from cuda_raytracer_tpu.ops.pallas.packet_dfs import trace_closest_packets

WI, HI = 800, 600


def tiled_rays(cut_cam, spp, tile, seed=0):
    """Camera rays in (tile-major, pixel, sample) order."""
    py, px = np.meshgrid(np.arange(HI), np.arange(WI), indexing="ij")
    order = ((py // tile) * (WI // tile) * tile * tile
             + (px // tile) * tile * tile
             + (py % tile) * tile + (px % tile))
    inv = np.argsort(order.reshape(-1))
    n = WI * HI * spp
    rng = np.random.default_rng(seed)
    u = rng.random((n, 2)).astype(np.float32)
    pidx = np.repeat(inv, spp)
    x = ((pidx % WI) + u[:, 0]) / WI
    y = ((pidx // WI) + u[:, 1]) / HI
    origin, look, up, left = (np.asarray(a) for a in cut_cam.as_arrays())
    k = np.stack([x - 0.5, y - 0.5, np.ones_like(x)], axis=-1)
    k /= np.linalg.norm(k, axis=1, keepdims=True)
    d = (k @ np.stack([left, up, look])).astype(np.float32)
    o = np.broadcast_to(origin.astype(np.float32), d.shape)
    return jnp.asarray(o), jnp.asarray(d)


def bench_one(f, args, n, label, reps=3):
    # the runtime caches identical executions; perturb the origin per
    # rep so every timing is a real device run
    res = f(*args)
    jax.block_until_ready(res.t)
    times = []
    for i in range(1, reps + 1):
        args_i = (args[0] + i * 1e-6,) + tuple(args[1:])
        t0 = time.perf_counter()
        r2 = f(*args_i)
        float(jnp.sum(r2.t))  # forced device readback = true sync
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{label:24s}: {dt*1e3:8.2f} ms  {n/dt/1e6:7.1f} Mrays/s",
          flush=True)
    return res


def main():
    dae = "/root/reference/media/pathtracer/advanced/CBbunny.dae"
    for tw, ml in ((8, 16),):
        cfg = RenderConfig(width=WI, height=HI, samples_per_frame=2,
                           max_depth=2, traversal="xla", tree_width=tw,
                           max_leaf_size=ml)
        r = WavefrontRenderer(cfg, camera_mode="cutracer")
        r.load_scene(dae)
        s = r.scene
        print(f"=== W={tw} ml={ml}: node_dfs {s.bvh.node_dfs.shape} "
              f"prim_groups {s.bvh.prim_groups.shape} ===", flush=True)
        key = jax.random.PRNGKey(15618)
        f0 = jax.jit(lambda s, o, d, v: trace_closest_packets(s, o, d, v))
        fs0 = jax.jit(
            lambda s, o, d, v, tl: trace_closest_packets(s, o, d, v, tl))

        for spp, tile in ((2, 1), (16, 8)):
            o, d = tiled_rays(r.cutracer_camera, spp, tile)
            n = o.shape[0]
            valid = jnp.ones(n, bool)
            print(f"-- spp={spp} tile={tile} N={n}", flush=True)
            res = bench_one(lambda o, d, v: f0(s, o, d, v),
                            (o, d, valid), n, "primary")
            hit = S.compute_hits(s, o, d, res.t, res.prim, 1e-3)
            u = jax.random.uniform(jax.random.fold_in(key, 7), (n, 2),
                                   dtype=jnp.float32)
            o_s, d_s, max_t, li, ok = S.nee_shadow_rays(
                s, hit, jnp.ones_like(o), 0, u, 1.0)
            bench_one(lambda o, d, v, tl: fs0(s, o, d, v, tl),
                      (o_s, d_s, ok, max_t), n, "shadow")
            o_b, d_b, imp2, vb, _ = S.scatter(
                s, hit, jnp.ones_like(o), jax.random.fold_in(key, 9))
            bench_one(lambda o, d, v: f0(s, o, d, v),
                      (o_b, d_b, vb), n, "bounce")
            # direction-major sorted bounce
            ob = np.asarray(o_b)
            db = np.asarray(d_b)
            octant = ((db[:, 0] > 0) * 4 + (db[:, 1] > 0) * 2
                      + (db[:, 2] > 0)).astype(np.int64)
            bb_min = ob.min(0)
            bb_ext = ob.max(0) - bb_min + 1e-6
            q = np.clip(((ob - bb_min) / bb_ext * 32), 0,
                        31).astype(np.int64)
            mort = np.zeros(n, np.int64)
            for b in range(5):
                for a in range(3):
                    mort |= ((q[:, a] >> b) & 1) << (3 * b + a)
            perm = np.argsort(octant * (1 << 15) + mort, kind="stable")
            pj = jnp.asarray(perm)
            bench_one(lambda o, d, v: f0(s, o, d, v),
                      (o_b[pj], d_b[pj], vb[pj]), n, "bounce-sorted")

        # correctness spot check
        from cuda_raytracer_tpu.ops.traverse import trace_closest
        o, d = tiled_rays(r.cutracer_camera, 2, 1)
        res = f0(s, o[:65536], d[:65536], jnp.ones(65536, bool))
        rx = trace_closest(s, o[:65536], d[:65536], jnp.ones(65536, bool))
        pm = np.mean(np.asarray(res.prim) == np.asarray(rx.prim))
        td, tx = np.asarray(res.t), np.asarray(rx.t)
        with np.errstate(invalid="ignore"):
            tm = np.mean((np.abs(td - tx) <= 2e-4 * np.maximum(1, np.abs(tx)))
                         | (np.isinf(td) & np.isinf(tx)))
        print(f"parity vs XLA: prim {pm:.6f} t {tm:.6f}", flush=True)


if __name__ == "__main__":
    main()

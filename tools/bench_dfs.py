"""Benchmark the packet-DFS traversal on TPU with CBbunny rays.

Times primary / shadow / bounce traversals at 800x600x2spp, checks a
subsample against the XLA scan traversal, and reports Mrays/s.
"""

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


def main():
    dae = "/root/reference/media/pathtracer/advanced/CBbunny.dae"
    cfg = RenderConfig(width=800, height=600, samples_per_frame=2,
                       max_depth=2, traversal="xla")
    r = WavefrontRenderer(cfg, camera_mode="cutracer")
    r.load_scene(dae)
    s = r.scene
    print(f"scene: {s.num_prims} prims, node_dfs {s.bvh.node_dfs.shape}, "
          f"prim_groups {s.bvh.prim_groups.shape}")

    key = jax.random.PRNGKey(15618)
    o, d = S.generate_camera_rays_cutracer(
        key, cfg.width, cfg.height, cfg.samples_per_frame,
        *r.cutracer_camera.as_arrays())
    valid = jnp.ones(o.shape[0], bool)
    N = o.shape[0]
    print(f"N = {N}")

    f0 = jax.jit(lambda s, o, d, v: trace_closest_packets(s, o, d, v))
    f = lambda o, d, v: f0(s, o, d, v)
    t0 = time.perf_counter()
    res = f(o, d, valid)
    jax.block_until_ready(res.t)
    print(f"compile+run: {time.perf_counter()-t0:.1f}s")
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        res = f(o, d, valid)
    jax.block_until_ready(res.t)
    dt = (time.perf_counter() - t0) / reps
    print(f"primary: {dt*1e3:8.2f} ms  {N/dt/1e6:7.1f} Mrays/s  "
          f"hits={float(jnp.mean(res.prim >= 0)):.3f} "
          f"visits~{float(res.t[0]):.0f}")

    # shadow pass from primary hits
    hit = S.compute_hits(s, o, d, res.t, res.prim, 1e-3)
    u = jax.random.uniform(jax.random.fold_in(key, 7), (N, 2),
                           dtype=jnp.float32)
    o_s, d_s, max_t, li, ok = S.nee_shadow_rays(
        s, hit, jnp.ones_like(o), 0, u, 1.0)
    fs0 = jax.jit(lambda s, o, d, v, tl: trace_closest_packets(s, o, d, v, tl))
    fs = lambda o, d, v, tl: fs0(s, o, d, v, tl)
    rs = fs(o_s, d_s, ok, max_t)
    jax.block_until_ready(rs.t)
    t0 = time.perf_counter()
    for _ in range(reps):
        rs = fs(o_s, d_s, ok, max_t)
    jax.block_until_ready(rs.t)
    dt = (time.perf_counter() - t0) / reps
    print(f"shadow : {dt*1e3:8.2f} ms  {N/dt/1e6:7.1f} Mrays/s")

    # bounce pass
    o_b, d_b, imp2, vb, _ = S.scatter(
        s, hit, jnp.ones_like(o), jax.random.fold_in(key, 9))
    rb = f(o_b, d_b, vb)
    jax.block_until_ready(rb.t)
    t0 = time.perf_counter()
    for _ in range(reps):
        rb = f(o_b, d_b, vb)
    jax.block_until_ready(rb.t)
    dt = (time.perf_counter() - t0) / reps
    print(f"bounce : {dt*1e3:8.2f} ms  {N/dt/1e6:7.1f} Mrays/s  "
          f"valid={float(jnp.mean(vb)):.3f}")

    # correctness vs XLA trace on a subsample
    from cuda_raytracer_tpu.ops.traverse import trace_closest
    sub = 65536
    rx = trace_closest(s, o[:sub], d[:sub], valid[:sub])
    pd = np.asarray(res.prim[:sub])
    px = np.asarray(rx.prim)
    td = np.asarray(res.t[:sub])
    tx = np.asarray(rx.t)
    pm = (pd == px)
    tm = (np.abs(td - tx) <= 2e-4 * np.maximum(1, np.abs(tx))) | (
        np.isinf(td) & np.isinf(tx))
    print(f"parity vs XLA: prim {pm.mean():.6f}  t {tm.mean():.6f}  "
          f"({(~(pm & tm)).sum()} mismatches / {sub})")


if __name__ == "__main__":
    main()

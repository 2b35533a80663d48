"""Probe: dyn_alloc (bump-cursor queue allocation, no count kernel)
vs the legacy pre-counted wavefront2 on the real TPU.

Parity on a random soup (multi-level tree) + timing on bench-shaped
incoherent bounce rays at N=7.68M over the CBbunny tree.
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cuda_raytracer_tpu.ops.pallas.wavefront2 import trace_closest_wavefront
from cuda_raytracer_tpu.ops.traverse import trace_bruteforce
from cuda_raytracer_tpu.render.flatscene import flatten_scene
from cuda_raytracer_tpu.scene import static_scene as st
from cuda_raytracer_tpu.scene.bsdf import DiffuseBSDF


def soup_scene(ntri=1200, width=4, ml=8, seed=5):
    rng = np.random.default_rng(seed)
    base = rng.random((ntri, 3)) * 4 - 2
    v = base[:, None, :] + rng.random((ntri, 3, 3)) * 0.3
    mesh = st.Mesh(
        v.reshape(-1, 3),
        np.tile([[0.0, 0.0, 1.0]], (ntri * 3, 1)),
        np.arange(ntri * 3).reshape(-1, 3),
        DiffuseBSDF([1, 1, 1]),
    )
    scene, _ = flatten_scene(st.Scene([mesh], []), tree_width=width,
                             max_leaf_size=ml)
    return scene


def random_rays(n, seed, origin_box=1.0):
    rng = np.random.default_rng(seed)
    o = (rng.random((n, 3)) * 2 - 1) * origin_box
    d = rng.standard_normal((n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def parity():
    for width, ml in ((4, 8), (8, 16)):
        scene = soup_scene(width=width, ml=ml)
        o, d = random_rays(20000, 11)
        valid = jnp.ones((20000,), bool)
        a = trace_closest_wavefront(scene, o, d, valid, dyn_alloc=True)
        b = trace_closest_wavefront(scene, o, d, valid, dyn_alloc=False)
        c = trace_bruteforce(scene, o, d, valid)
        ta, tb, tc = (np.asarray(x.t) for x in (a, b, c))
        pa, pb, pc = (np.asarray(x.prim) for x in (a, b, c))
        exact = np.array_equal(ta, tb) and np.array_equal(pa, pb)
        hm = np.array_equal(pa < 0, pc < 0)
        both = (pa >= 0) & (pc >= 0)
        tol = np.allclose(ta[both], tc[both], rtol=1e-4, atol=2e-3)
        print(f"W={width} ml={ml}: dyn==legacy exact: {exact}  "
              f"vs oracle hit/miss: {hm} t: {tol}  "
              f"dropped dyn={int(a.dropped)} legacy={int(b.dropped)}",
              flush=True)
        # shadow semantics
        tl = jnp.full((20000,), 1.5, jnp.float32)
        a2 = trace_closest_wavefront(scene, o, d, valid, tl, dyn_alloc=True)
        b2 = trace_closest_wavefront(scene, o, d, valid, tl, dyn_alloc=False)
        print(f"  shadow exact: "
              f"{np.array_equal(np.asarray(a2.t), np.asarray(b2.t))}",
              flush=True)
        # compacted path
        a3 = trace_closest_wavefront(scene, o, d, valid, dyn_alloc=True,
                                     compact=True)
        print(f"  compact dyn==dyn exact: "
              f"{np.array_equal(np.asarray(a3.t), ta)}", flush=True)


def timing():
    from cuda_raytracer_tpu.config import RenderConfig
    from cuda_raytracer_tpu.render.engine import WavefrontRenderer
    path = "/root/reference/media/pathtracer/advanced/CBbunny.dae"
    if not os.path.exists(path):
        print("no CBbunny; skipping timing", flush=True)
        return
    cfg = RenderConfig(width=800, height=600, samples_per_frame=2,
                       max_depth=2, traversal="xla", tree_width=4,
                       max_leaf_size=32)
    r = WavefrontRenderer(cfg, camera_mode="cutracer")
    r.load_scene(path)
    scene = r.scene
    n = 7_680_000
    rng = np.random.default_rng(3)
    # hemisphere-scattered rays from the box interior: bounce-shaped
    o = np.array([0.25, 0.8, 0.25]) + (rng.random((n, 3)) - 0.5) * 1.4
    d = rng.standard_normal((n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    valid = jnp.ones((n,), bool)

    for name, kw in (("legacy", dict(dyn_alloc=False)),
                     ("legacy+fc", dict(dyn_alloc=False, fused_counts=True)),
                     ("dyn", dict(dyn_alloc=True))):
        f = jax.jit(lambda s, o, d, v, kw=kw: trace_closest_wavefront(
            s, o, d, v, **kw))
        try:
            r = f(scene, o, d, valid)
            jax.block_until_ready(r.t)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        times = []
        for i in range(1, 4):
            t0 = time.perf_counter()
            r2 = f(scene, o + i * 1e-6, d, valid)
            float(jnp.sum(r2.t))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"{name:10s}: {dt*1e3:8.1f} ms  {n/dt/1e6:7.1f} Mrays/s",
              flush=True)


if __name__ == "__main__":
    if "--timing-only" not in sys.argv:
        parity()
    if "--parity-only" not in sys.argv:
        timing()

"""Trustworthy Pallas VPU microbenchmarks (anti-hoist carried chains).

Every benchmark threads a VMEM carry through the op under test so
Mosaic cannot hoist or DCE it, and subtracts a measured empty-loop
baseline.  Reports cycles/iter at 940 MHz.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 5000
GHZ = 0.94


def bench(name, body, shape=(8, 1024), iters=ITERS, reps=5, state=None):
    """body(x, i) -> x' threaded through a fori loop in VMEM."""

    def kernel(x_ref, o_ref, *scr):
        def f(i, x):
            return body(x, i, *scr)

        o_ref[...] = jax.lax.fori_loop(0, iters, f, x_ref[...])

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(state or []),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    x = (jnp.arange(shape[0] * shape[1], dtype=jnp.float32)
         .reshape(shape) % 7.0) * 0.1
    f = jax.jit(f)
    out = jax.block_until_ready(f(x))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        best = min(best, time.perf_counter() - t0)
    cyc = best / iters * GHZ * 1e9
    print(f"{name:34s}: {best/iters*1e9:9.1f} ns/iter = {cyc:8.0f} cyc")
    return cyc


def main():
    # baseline: loop with a single add
    bench("baseline x+1 [8,1024]", lambda x, i: x + 1.0)
    bench("baseline x+1 [8,128]", lambda x, i: x + 1.0, shape=(8, 128))
    bench("baseline x+1 [1,1024]", lambda x, i: x + 1.0, shape=(1, 1024))

    # 20 chained adds at various shapes (per-op cost)
    def chain20(x, i):
        for _ in range(20):
            x = x * 1.0001 + 0.3
        return x

    bench("20 fma [8,1024]", chain20)
    bench("20 fma [8,128]", chain20, shape=(8, 128))
    bench("20 fma [1,1024]", chain20, shape=(1, 1024))
    bench("20 fma [1,128]", chain20, shape=(1, 128))
    bench("20 fma [8,256]", chain20, shape=(8, 256))

    # static vs dynamic roll
    bench("static roll [8,1024]", lambda x, i: pltpu.roll(x, 17, axis=1) + 1.0)
    bench("dyn roll [8,1024]",
          lambda x, i: pltpu.roll(x, i % 1024, axis=1) + 1.0)
    bench("static roll [8,128]",
          lambda x, i: pltpu.roll(x, 17, axis=1) + 1.0, shape=(8, 128))
    bench("dyn roll [8,128]",
          lambda x, i: pltpu.roll(x, i % 128, axis=1) + 1.0, shape=(8, 128))

    # reduction to scalar + scalar use (pl.when-style control)
    def red(x, i):
        s = jnp.sum(x[0:1, :])
        return x + s * 1e-9

    bench("row-sum + broadcast [8,1024]", red)

    # compaction network + append tail
    from cuda_raytracer_tpu.ops.pallas.wavefront2 import (
        _compact_lanes, _append_tail)

    def comp(x, i):
        m = (x[0:1, :] + i % 5) > 3.0
        d, n = _compact_lanes(x, m)
        return d + (n % 3).astype(jnp.float32) * 0.001

    bench("compact_lanes [8,1024]", comp)

    def app(x, i, tail):
        m = (x[0:1, :] + i % 5) > 3.0
        n = _append_tail(tail, x, m, i % 800)
        return x + tail[0, 0] * 1e-9 + n * 1e-9

    bench("append_tail [8,1024]->2048", app,
          state=[pltpu.VMEM((8, 2048), jnp.float32)])

    # box test, [1, C] row layout (wavefront2 style): 4 children
    def boxes_rows(x, i):
        o_x, o_y, o_z = x[0:1], x[1:2], x[2:3]
        ix, iy, iz = x[3:4], x[4:5], x[5:6]
        tub = x[7:8]
        acc = jnp.zeros_like(o_x)
        fi = (i % 9).astype(jnp.float32)
        for w in range(4):
            t0x = (fi - o_x) * ix
            t1x = (fi + w + 1 - o_x) * ix
            t0y = (fi - o_y) * iy
            t1y = (fi + 2 - o_y) * iy
            t0z = (fi - o_z) * iz
            t1z = (fi + 3 - o_z) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            ok = (tn <= tf) & (tf >= 0.0) & (tn <= tub)
            acc = acc + jnp.where(ok, tn, 0.0)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        return jnp.where(lane == 7, x + jnp.sum(acc) * 1e-9, x)

    bench("boxtest x4 [1,1024] rows", boxes_rows)

    # box test, [8, L] tile layout: 4 children over 1024 rays in [8,128]
    def boxes_tile(x, i):
        # x is [64, 128]: 8 attrs x [8,128] ray tiles
        o_x, o_y, o_z = x[0:8], x[8:16], x[16:24]
        ix, iy, iz = x[24:32], x[32:40], x[40:48]
        tub = x[56:64]
        acc = jnp.zeros_like(o_x)
        fi = (i % 9).astype(jnp.float32)
        for w in range(4):
            t0x = (fi - o_x) * ix
            t1x = (fi + w + 1 - o_x) * ix
            t0y = (fi - o_y) * iy
            t1y = (fi + 2 - o_y) * iy
            t0z = (fi - o_z) * iz
            t1z = (fi + 3 - o_z) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            ok = (tn <= tf) & (tf >= 0.0) & (tn <= tub)
            acc = acc + jnp.where(ok, tn, 0.0)
        sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        return jnp.where(sub >= 56, x + jnp.sum(acc) * 1e-9, x)

    bench("boxtest x4 [8,128]x1024rays", boxes_tile, shape=(64, 128))

    # Moller-Trumbore, 8 prims (sublanes) x 1024 lanes (wavefront2 style)
    def mt8(x, i, pb):
        o_x, o_y, o_z = x[0:1], x[1:2], x[2:3]
        d_x, d_y, d_z = x[3:4], x[4:5], x[5:6]
        fi = (i % 9).astype(jnp.float32)
        v0x = pb[:, 0:1] + fi
        e1x, e1y, e1z = pb[:, 1:2], pb[:, 2:3], pb[:, 3:4]
        e2x, e2y, e2z = pb[:, 4:5], pb[:, 5:6], pb[:, 6:7]
        v0y, v0z = pb[:, 7:8], pb[:, 8:9]
        px = d_y * e2z - d_z * e2y
        py = d_z * e2x - d_x * e2z
        pz = d_x * e2y - d_y * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv = 1.0 / jnp.where(jnp.abs(det) < 1e-9, 1.0, det)
        tx, ty, tz = o_x - v0x, o_y - v0y, o_z - v0z
        u = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (d_x * qx + d_y * qy + d_z * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv
        ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
        tmin = jnp.min(jnp.where(ok, t, 1e30), axis=0, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        return jnp.where(lane == 7, jnp.minimum(x, tmin), x)

    bench("MT 8prim x 1024 lanes", mt8,
          state=[pltpu.VMEM((8, 128), jnp.float32)])

    # SMEM scalar push/pop loop overhead
    def smem_ops(x, i, st):
        st[i % 64] = i
        v = st[(i + 31) % 64]
        return x + v.astype(jnp.float32) * 1e-12

    bench("SMEM store+load+bcast", smem_ops,
          state=[pltpu.SMEM((64,), jnp.int32)])

    # dynamic VMEM sublane-row read (node fetch analog)
    def vrow(x, i, tbl):
        r = tbl[pl.ds((i * 7) % 1800, 1), :]
        return x + r[0, 0] * 1e-12

    bench("dyn VMEM row read [1,128]", vrow,
          state=[pltpu.VMEM((1824, 128), jnp.float32)])


if __name__ == "__main__":
    main()

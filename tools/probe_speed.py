"""Microbenchmark the wavefront2 chunk-body primitives on TPU.

Each kernel runs ITERS iterations of one primitive in a fori loop;
reported time is per iteration.
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

from cuda_raytracer_tpu.ops.pallas.wavefront2 import (
    _compact_lanes, _append_tail, _box_terms, CHUNK,
)

C = CHUNK
ITERS = 2000


def bench(name, kernel, out_shape, scratch=(), reps=3):
    f = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(scratch),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    x = jnp.arange(8 * C, dtype=jnp.float32).reshape(8, C) * 1e-3
    f = jax.jit(f)
    out = f(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(x)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:24s}: {dt / ITERS * 1e6:8.3f} us/iter  ({dt*1e3:.1f} ms total)")


def k_roll(x_ref, o_ref):
    def body(i, acc):
        return acc + pltpu.roll(x_ref[:], C - 1, axis=1)[0, 0]
    o_ref[...] = jnp.full((1, 128), jax.lax.fori_loop(0, ITERS, body, 0.0))


def k_compact(x_ref, o_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

    def body(i, acc):
        mask = (x_ref[0:1, :] * (i + 1) % 7.0) > 3.0
        data, n = _compact_lanes(x_ref[:], mask)
        return acc + data[0, 0] + n.astype(jnp.float32)
    o_ref[...] = jnp.full((1, 128), jax.lax.fori_loop(0, ITERS, body, 0.0))


def k_append(x_ref, o_ref, tail):
    def body(i, tcnt):
        mask = (x_ref[0:1, :] * (i + 1) % 7.0) > 3.0
        n = _append_tail(tail, x_ref[:], mask, tcnt)
        return jnp.where(tcnt + n >= C, tcnt + n - C, tcnt + n)
    t = jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))
    o_ref[...] = jnp.full((1, 128), t.astype(jnp.float32) + tail[0, 0])


def k_boxes(x_ref, o_ref):
    o_x, o_y, o_z = x_ref[0:1, :], x_ref[1:2, :], x_ref[2:3, :]
    inv_x, inv_y, inv_z = 1.0 / x_ref[3:4, :], 1.0 / x_ref[4:5, :], 1.0 / x_ref[5:6, :]

    def body(i, acc):
        fi = i.astype(jnp.float32)
        s = 0.0
        for w in range(4):
            slab, tnear, inside = _box_terms(
                (fi, fi, fi, fi + w + 1, fi + 2, fi + 3),
                o_x, o_y, o_z, inv_x, inv_y, inv_z)
            s = s + jnp.sum(jnp.where(slab & inside, tnear, 0.0))
        return acc + s
    o_ref[...] = jnp.full((1, 128), jax.lax.fori_loop(0, ITERS, body, 0.0))


def k_cumsum(x_ref, o_ref):
    from cuda_raytracer_tpu.ops.pallas.wavefront2 import _cumsum_lanes

    def body(i, acc):
        m = (x_ref[0:1, :] > i).astype(jnp.int32)
        return acc + _cumsum_lanes(m, C)[0, C - 1]
    o_ref[...] = jnp.full((1, 128), jax.lax.fori_loop(0, ITERS, body, 0).astype(jnp.float32))


def k_sum(x_ref, o_ref):
    def body(i, acc):
        return acc + jnp.sum(x_ref[:] * (1.0 + i))
    o_ref[...] = jnp.full((1, 128), jax.lax.fori_loop(0, ITERS, body, 0.0))


def main():
    one = jax.ShapeDtypeStruct((1, 128), jnp.float32)
    bench("roll[8,1024]", k_roll, one)
    bench("sum[8,1024]", k_sum, one)
    bench("cumsum_lanes[1,1024]", k_cumsum, one)
    bench("box_terms x4", k_boxes, one)
    bench("compact[8,1024]", k_compact, one)
    bench("append_tail", k_append, one,
          scratch=[pltpu.VMEM((8, 2 * C), jnp.float32)])


if __name__ == "__main__":
    main()

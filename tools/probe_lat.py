"""Latency probes for the packet-DFS control path.

All probes build TRUE dependency chains (pointer chases / value
feedback) so Mosaic cannot hoist, fold, or overlap what we are trying
to measure.  Reports ns and cycles (0.94 GHz) per link.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GHZ = 0.94
HOPS = 2000


def run(name, kernel, scratch, table):
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    f = jax.jit(f)
    out = jax.block_until_ready(f(table))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(table))
        best = min(best, time.perf_counter() - t0)
    ns = best / HOPS * 1e9
    print(f"{name:40s}: {ns:8.1f} ns/link = {ns*GHZ:7.0f} cyc")


def main():
    R = 1891  # node-table-like row count
    rng = np.random.default_rng(0)
    # each row's col 0 holds the next row to visit (random permutation)
    perm = rng.permutation(R)
    nxt = np.zeros(R, np.int32)
    nxt[perm[:-1]] = perm[1:]
    nxt[perm[-1]] = perm[0]
    tbl = np.zeros((R * 8, 128), np.float32)
    for i in range(R):
        tbl[i * 8, 0] = nxt[i]
    tbl_j = jnp.asarray(tbl)

    # 1: serialized DMA pointer chase (start; wait; read next id)
    def chase_dma(tref, o_ref, buf, sem):
        def body(i, node):
            pltpu.make_async_copy(
                tref.at[pl.ds(node * 8, 8), :], buf, sem
            ).start()
            pltpu.make_async_copy(
                tref.at[pl.ds(node * 8, 8), :], buf, sem
            ).wait()
            return buf[0, 0].astype(jnp.int32)

        last = jax.lax.fori_loop(0, HOPS, body, 0)
        o_ref[...] = jnp.zeros((1, 128), jnp.float32) + last.astype(
            jnp.float32
        )

    run("DMA chase [8,128] VMEM->VMEM", chase_dma,
        [pltpu.VMEM((8, 128), jnp.float32), pltpu.SemaphoreType.DMA(())],
        tbl_j)

    # 2: wave of 8 independent DMAs per link (amortization test)
    def chase_wave(tref, o_ref, buf, sem):
        def body(i, node):
            for k in range(8):
                pltpu.make_async_copy(
                    tref.at[pl.ds((node + k * 64) % (R * 8 - 8), 8), :],
                    buf.at[k],
                    sem.at[k],
                ).start()
            for k in range(8):
                pltpu.make_async_copy(
                    tref.at[pl.ds((node + k * 64) % (R * 8 - 8), 8), :],
                    buf.at[k],
                    sem.at[k],
                ).wait()
            return buf[0][0, 0].astype(jnp.int32) * 8

        last = jax.lax.fori_loop(0, HOPS, body, 0)
        o_ref[...] = jnp.zeros((1, 128), jnp.float32) + last.astype(
            jnp.float32
        )

    run("DMA wave x8 (per wave)", chase_wave,
        [pltpu.VMEM((8, 8, 128), jnp.float32),
         pltpu.SemaphoreType.DMA((8,))], tbl_j)

    # 3: vector->scalar extract chain
    def chase_extract(tref, o_ref):
        v0 = tref[0:8, :]

        def body(i, s):
            v = v0 + s.astype(jnp.float32)
            return jnp.sum(v[0:1, 0:128]).astype(jnp.int32) % 7

        last = jax.lax.fori_loop(0, HOPS, body, 0)
        o_ref[...] = jnp.zeros((1, 128), jnp.float32) + last.astype(
            jnp.float32
        )

    run("vector->scalar reduce chain", chase_extract, [], tbl_j)

    # 4: scalar SMEM chase (control-flow-only cost)
    def chase_smem(tref, o_ref, st):
        st[0] = 1

        def body(i, s):
            st[(s + i) % 64] = s + 1
            return st[(s * 3 + 1) % 64]

        last = jax.lax.fori_loop(0, HOPS, body, 0)
        o_ref[...] = jnp.zeros((1, 128), jnp.float32) + last.astype(
            jnp.float32
        )

    run("SMEM scalar chase", chase_smem,
        [pltpu.SMEM((64,), jnp.int32)], tbl_j)

    # 5: data-dependent pl.when branch chain
    def chase_when(tref, o_ref, st):
        st[0] = 0

        def body(i, s):
            @pl.when(s % 2 == 0)
            def _():
                st[0] = s + 1

            @pl.when(s % 2 == 1)
            def _():
                st[0] = s + 2

            return st[0]

        last = jax.lax.fori_loop(0, HOPS, body, 0)
        o_ref[...] = jnp.zeros((1, 128), jnp.float32) + last.astype(
            jnp.float32
        )

    run("pl.when branch chain", chase_when,
        [pltpu.SMEM((64,), jnp.int32)], tbl_j)

    # 6: dynamic VMEM vector read chase (select-tree lowering cost)
    def chase_read(tref, o_ref):
        def body(i, node):
            row = tref[pl.ds(node * 8, 1), :]
            return row[0, 0].astype(jnp.int32)

        last = jax.lax.fori_loop(0, HOPS, body, 0)
        o_ref[...] = jnp.zeros((1, 128), jnp.float32) + last.astype(
            jnp.float32
        )

    run("dyn VMEM [1,128] read chase", chase_read, [], tbl_j)


if __name__ == "__main__":
    main()

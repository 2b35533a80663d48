"""Probe: how large can a scalar-prefetch (SMEM) array be on this
Mosaic/v5e, and do dynamic scalar reads from it lower correctly?

Feasibility gate for the chunk-chained dynamic queue allocation in
wavefront2 (the chunk table is a [cap_chunks] i32 scalar-prefetch array
with cap_chunks ~ 30k at the bench operating point).  Also probes the
fallback: DMA'ing table blocks HBM->SMEM scratch.

Usage: python tools/probe_smem.py [--n 32768]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_prefetch(n):
    """Scalar-prefetch table of n i32; kernel gathers 8 chunks of a
    [8, 8*128] input via dynamic table reads."""

    def kernel(tab, data, out, sem):
        for j in range(8):
            idx = tab[n - 1 - j * (n // 8)]  # scattered dynamic reads
            pltpu.make_async_copy(
                data.at[:, pl.ds(idx * 128, 128)],
                out.at[:, pl.ds(j * 128, 128)],
                sem,
            ).start()
            pltpu.make_async_copy(
                data.at[:, pl.ds(idx * 128, 128)],
                out.at[:, pl.ds(j * 128, 128)],
                sem,
            ).wait()

    tab = jnp.arange(n, dtype=jnp.int32) % 8
    data = jnp.tile(jnp.arange(8, dtype=jnp.float32)[None, :].repeat(8, 0), (1, 128)).reshape(8, 8 * 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 8 * 128), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    out = f(tab, data)
    jax.block_until_ready(out)
    return True


def probe_smem_dma(n):
    """Fallback: table lives in HBM (as a [1, n] i32 row), kernel DMAs a
    block into SMEM scratch and reads scalars from it."""

    def kernel(tabrow, data, out, smem, sem, sem2):
        cp = pltpu.make_async_copy(
            tabrow.at[0, pl.ds(0, 512)], smem, sem
        )
        cp.start()
        cp.wait()
        for j in range(8):
            idx = smem[j * 7]
            pltpu.make_async_copy(
                data.at[:, pl.ds(idx * 128, 128)],
                out.at[:, pl.ds(j * 128, 128)],
                sem2,
            ).start()
            pltpu.make_async_copy(
                data.at[:, pl.ds(idx * 128, 128)],
                out.at[:, pl.ds(j * 128, 128)],
                sem2,
            ).wait()

    tab = (jnp.arange(n, dtype=jnp.int32) % 8).reshape(1, n)
    data = jnp.zeros((8, 8 * 128), jnp.float32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 8 * 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.SMEM((512,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    out = f(tab, data)
    jax.block_until_ready(out)
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32768)
    args = ap.parse_args()
    for n in (1024, 8192, args.n, 2 * args.n):
        try:
            probe_prefetch(n)
            print(f"scalar-prefetch [{n}] i32: OK", flush=True)
        except Exception as e:
            print(f"scalar-prefetch [{n}] i32: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            break
    try:
        probe_smem_dma(4096)
        print("HBM->SMEM block DMA + scalar read: OK", flush=True)
    except Exception as e:
        print(f"HBM->SMEM block DMA: FAIL {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()

"""Scatter/gather design-space microbench for the hit-log merge.

The r3 decomposition (tools/ab_interleave.py) put the XLA merge at
~50% of every wavefront2 pass at the W=4/spp=32 operating point
(e.g. primary-d0: 258 ms kernels vs 942 ms merge).  The current merge
is 3 linear passes (scatter-min t_bits, win gather+compare, scatter-max
prim).  Candidate replacements measured here on bench-shaped sizes:

  * i64 packed single scatter-min: key = t_bits<<22 | (2^22-1-prim)
    — exact t, exact max-prim tie-break, ONE pass (if i64 scatter is
    cheap enough).
  * windowed row scatter: one scatter of [M, K] records vs K scalar
    scatters — if XLA charges per ROW not per element, carrying wide
    records (normals, bsdf) through the merge becomes affordable.
  * wide-row gather (the engine already relies on this: shade_packed).

Usage: python tools/probe_scatter2.py [--n 15360000] [--m 23000000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)  # real int64, not demoted i32

import numpy as np
import jax.numpy as jnp


def timed(f, *args, reps=3):
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for i in range(reps):
        a2 = (args[0] + i,) + args[1:]
        t0 = time.perf_counter()
        out = f(*a2)
        # forced readback sync (axon block_until_ready is a no-op)
        if isinstance(out, tuple):
            float(jnp.sum(out[0][:128].astype(jnp.float32)))
        else:
            float(jnp.sum(out[:128].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=15_360_000)
    ap.add_argument("--m", type=int, default=23_000_000)
    args = ap.parse_args()
    N, M = args.n, args.m

    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, N, size=M).astype(np.int32))
    vals = jnp.asarray(rng.randint(1, 1 << 30, size=M).astype(np.int32))

    @jax.jit
    def scatter_min_i32(v, idx):
        tgt = jnp.full((N + 1,), np.int32(2**31 - 1), jnp.int32)
        return tgt.at[idx].min(v, mode="drop")

    dt = timed(scatter_min_i32, vals, idx)
    print(f"scatter-min i32 1col  M={M}: {dt*1e3:7.1f} ms "
          f"({dt/M*1e9:.1f} ns/el)", flush=True)

    vals64 = vals.astype(jnp.int64) << 22
    @jax.jit
    def scatter_min_i64(v, idx):
        tgt = jnp.full((N + 1,), np.int64(2**62), jnp.int64)
        return tgt.at[idx].min(v, mode="drop")

    try:
        dt = timed(scatter_min_i64, vals64, idx)
        print(f"scatter-min i64 1col M={M}: {dt*1e3:7.1f} ms "
              f"({dt/M*1e9:.1f} ns/el)", flush=True)
    except Exception as e:
        print(f"scatter-min i64: FAILED {type(e).__name__}: {e}",
              flush=True)

    for K in (4, 8):
        valsK = jnp.asarray(
            rng.randint(1, 1 << 30, size=(M, K)).astype(np.float32)
        )

        @jax.jit
        def scatter_set_rows(v, idx, K=K):
            tgt = jnp.zeros((N + 1, K), jnp.float32)
            return tgt.at[idx].set(v, mode="drop",
                                   unique_indices=False)

        dt = timed(scatter_set_rows, valsK, idx)
        print(f"scatter-set rows K={K} M={M}: {dt*1e3:7.1f} ms "
              f"({dt/M*1e9:.1f} ns/row)", flush=True)

    for K in (1, 8, 32):
        table = jnp.asarray(
            rng.rand(N + 1, K).astype(np.float32)
        )

        @jax.jit
        def gather_rows(t, idx):
            return t[idx]

        dt = timed(gather_rows, table, idx)
        print(f"gather rows K={K} M={M}: {dt*1e3:7.1f} ms "
              f"({dt/M*1e9:.1f} ns/row)", flush=True)


if __name__ == "__main__":
    main()

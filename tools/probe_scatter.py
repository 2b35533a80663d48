"""Characterize XLA scatter-min cost on this TPU: cols x distinct.

The wavefront2 merge is two scatters + a gather over the log prefix.
Per-pass measurements (tools/probe_merge2.py) contradict a pure
cost-per-column model: shadow-d1 (3.84M-col branch, 5.3M distinct ray
targets) pays ~440 ms while bounce-d2 (same branch, 2.0M distinct)
pays ~120 ms.  This probe grids update-count x distinct-target-count
to expose the actual law (perturb + forced readback per the axon
timing rules).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 7_680_000


def timed(f, *args, reps=3):
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for i in range(1, reps + 1):
        a0 = args[0] + i  # perturb
        t0 = time.perf_counter()
        r = f(a0, *args[1:])
        float(jnp.sum(r))  # forced readback
        ts.append(time.perf_counter() - t0)
    return min(ts)


@jax.jit
def scatter_min(bits, ray):
    best = jnp.full((N + 1,), 2**30, jnp.int32)
    return best.at[ray].min(bits, mode="drop")[:N]


@jax.jit
def gather_only(bits, ray):
    best = jnp.full((N + 1,), 2**30, jnp.int32)
    return best[jnp.clip(ray, 0, N)] + bits


def main():
    rng = np.random.default_rng(0)
    for cols_m in (4, 8, 16):
        cols = cols_m << 20
        for distinct_m in (1, 2, 4, 7):
            distinct = min(distinct_m << 20, N)
            ray = rng.integers(0, distinct, cols).astype(np.int32)
            # tail mimics dead log entries: all collide on slot N
            ndead = cols // 4
            ray[-ndead:] = N
            bits = rng.integers(0, 2**29, cols).astype(np.int32)
            rayj = jnp.asarray(ray)
            bitsj = jnp.asarray(bits)
            dt = timed(scatter_min, bitsj, rayj)
            dtg = timed(gather_only, bitsj, rayj)
            print(
                f"cols={cols_m:3d}M distinct={distinct_m}M: "
                f"scatter-min {dt*1e3:7.1f} ms   "
                f"gather {dtg*1e3:7.1f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()

"""Measure merge-by-ray strategies on TPU: scatter-min vs sort-based."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 960 * 1024


def timed(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def scatter_merge(ray, bits, prim):
    best = jnp.full((N + 1,), 2**30, jnp.int32)
    best = best.at[ray].min(bits, mode="drop")
    win = bits == best[jnp.clip(ray, 0, N)]
    tgt = jnp.where(win, ray, N)
    bp = jnp.full((N + 1,), -1, jnp.int32)
    bp = bp.at[tgt].set(prim, mode="drop")
    return best[:N], bp[:N]


def sort_merge(ray, bits, prim):
    # sort by (ray, bits); first entry per ray wins
    r, b, p = jax.lax.sort((ray, bits, prim), num_keys=2)
    first = jnp.concatenate([jnp.ones((1,), bool), r[1:] != r[:-1]])
    tgt = jnp.where(first, r, N)
    best = jnp.full((N + 1,), 2**30, jnp.int32).at[tgt].set(b, mode="drop")
    bp = jnp.full((N + 1,), -1, jnp.int32).at[tgt].set(p, mode="drop")
    return best[:N], bp[:N]


def scatter_only(ray, bits, prim):
    best = jnp.full((N + 1,), 2**30, jnp.int32)
    return best.at[ray].min(bits, mode="drop")[:N]


def main():
    for M in (1 << 20, 2 << 20, 4 << 20):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        ray_rand = jax.random.randint(k1, (M,), 0, N, dtype=jnp.int32)
        # "segment-sorted" variant: blocks of ascending rays (realistic)
        ray_seg = jnp.sort(ray_rand.reshape(-1, 4096), axis=1).reshape(-1)
        bits = jax.random.randint(k2, (M,), 0, 2**29, dtype=jnp.int32)
        prim = jnp.arange(M, dtype=jnp.int32) % 28588
        for name, f in (("scatter2", scatter_merge),
                        ("scatter1", scatter_only),
                        ("sort", sort_merge)):
            for dist, r in (("rand", ray_rand), ("seg", ray_seg)):
                dt, _ = timed(jax.jit(f), r, bits, prim)
                print(f"M={M>>20}M {name:9s} {dist:4s}: {dt*1e3:8.2f} ms "
                      f"({M/dt/1e6:8.1f} M/s)")


if __name__ == "__main__":
    main()

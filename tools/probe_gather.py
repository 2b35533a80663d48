"""Gather cost vs row width at the bench population (N=15.36M).

Decides whether the per-depth compute_hits wide-row gather is priced
per gathered ROW (index) or per ELEMENT on this chip — i.e. whether
narrowing/packing shade_packed buys anything.  Also times a coherent
(tile-sorted) index distribution vs uniform, and a f32 vs bf16 table.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

N = 15_360_000
P = 28_600


def bench(fn, *args, reps=3):
    out = fn(*args)
    jnp.sum(out[::4096]).block_until_ready()
    best = 1e9
    for r in range(reps):
        a0 = args[0]
        # perturb so the runtime can't dedupe the dispatch — and sync
        # the perturbation BEFORE the timer, or its device execution
        # lands inside the timed window (inflates the cheap cases)
        args2 = (jax.block_until_ready((a0 + r + 1) % P),) + args[1:]
        t0 = time.perf_counter()
        out = fn(*args2, *())
        float(jnp.sum(out[::4096]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, P, dtype=jnp.int32)
    # coherent: packets of 1024 lanes share ~1-4 distinct rows
    idx_coh = jnp.repeat(
        jax.random.randint(key, (N // 1024,), 0, P, dtype=jnp.int32), 1024
    )
    for W in (32, 8, 1):
        tab = jnp.ones((P, W), jnp.float32)
        g = jax.jit(lambda i, t=tab: t[i])
        ms = bench(g, idx) * 1e3
        ms_c = bench(g, idx_coh) * 1e3
        print(f"W={W:3d} f32: uniform {ms:7.1f} ms   coherent {ms_c:7.1f} ms",
              flush=True)
    tab16 = jnp.ones((P, 32), jnp.bfloat16)
    g16 = jax.jit(lambda i: tab16[i])
    print(f"W=32 bf16: uniform {bench(g16, idx)*1e3:7.1f} ms", flush=True)
    # 1-D flat gather (take) for comparison
    flat = jnp.ones((P,), jnp.float32)
    gf = jax.jit(lambda i: flat[i])
    print(f"flat f32 take: {bench(gf, idx)*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()

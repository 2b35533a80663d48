"""Composite probe: replicate the packet-DFS visit loop synthetically
and toggle pieces to find where the ~2.7us/visit goes.

Chain: pop(SMEM) -> DMA node block -> 38-op box test [8,C] -> lane
reduce -> mask extract -> 8 conditional SMEM pushes.  All variants run
VISITS iterations of a pointer-chase over a fake table so nothing can
be hoisted or overlapped across iterations.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VISITS = 2000
C = 1024
R = 928  # nodes


def bench(name, use_while, do_box, do_reduce, do_push, nops=38):
    def kernel(tbl_ref, pay_ref, o_ref, nblk, sem, stack):
        stack[0] = 0
        stack[255] = 0
        o_x = pay_ref[0:1, :]
        inv_x = 1.0 / pay_ref[3:4, :]

        def body_fn(c):
            sp, it, acc = c
            node = stack[jnp.maximum(sp - 1, 0)]
            cp = pltpu.make_async_copy(
                tbl_ref.at[pl.ds(node * 8, 8), :], nblk, sem
            )
            cp.start()
            cp.wait()
            mask = it  # fallback
            if do_box:
                mn = nblk[:, 0:1]
                mx = nblk[:, 3:4]
                x = (mn - o_x) * inv_x
                y = (mx - o_x) * inv_x
                for _ in range(nops // 2 - 2):
                    x = jnp.maximum(x * 1.0001, y - x)
                    y = jnp.minimum(y, x + 0.3)
                m = x < y
                if do_reduce:
                    anyv = jnp.max(jnp.where(m, 1.0, 0.0), axis=1,
                                   keepdims=True)
                    wexp = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                    w2 = jax.lax.shift_left(jnp.int32(1), wexp).astype(
                        jnp.float32)
                    mask = jnp.sum(anyv * w2).astype(jnp.int32)
                    acc = acc + mask
            nxt = nblk[0, 7].astype(jnp.int32)  # chase pointer
            if do_push:
                spw = sp
                for w in range(8):
                    act = (jax.lax.shift_right_logical(mask, w) & 1) == 1
                    idx = jnp.where(act, jnp.minimum(spw, 200), 255)
                    stack[idx] = jnp.where(act, nxt, 0)
                    spw = spw + act.astype(jnp.int32)
                sp = jnp.minimum(jnp.maximum(spw, 1), 64)
            else:
                stack[0] = nxt
                sp = 1
            return (sp, it + 1, acc)

        if use_while:
            def cond(c):
                return c[1] < VISITS

            sp, it, acc = jax.lax.while_loop(cond, body_fn, (1, 0, 0))
        else:
            sp, it, acc = jax.lax.fori_loop(
                0, VISITS, lambda i, c: body_fn(c), (1, 0, 0))
        o_ref[...] = jnp.zeros((1, 128), jnp.float32) + (
            acc + sp).astype(jnp.float32)

    rng = np.random.default_rng(0)
    tbl = np.zeros((R * 8, 128), np.float32)
    perm = rng.permutation(R)
    nxt = np.zeros(R, np.int64)
    nxt[perm[:-1]] = perm[1:]
    nxt[perm[-1]] = perm[0]
    for i in range(R):
        tbl[i * 8, 7] = nxt[i]
        tbl[i * 8 : i * 8 + 8, 0] = rng.random(8)
        tbl[i * 8 : i * 8 + 8, 3] = rng.random(8) + 1
    pay = rng.random((8, C)).astype(np.float32) + 0.5

    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SMEM((256,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    ))
    tbl_j = jnp.asarray(tbl)
    pay_j = jnp.asarray(pay)
    float(jnp.sum(f(tbl_j, pay_j)))
    best = 1e9
    for i in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(f(tbl_j, pay_j + i * 1e-6)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s}: {best/VISITS*1e9:7.0f} ns/visit", flush=True)


def main():
    bench("while+DMA only", True, False, False, False)
    bench("fori+DMA only", False, False, False, False)
    bench("while+DMA+box38", True, True, False, False)
    bench("while+DMA+box38+reduce+extract", True, True, True, False)
    bench("while+DMA+box38+reduce+push8", True, True, True, True)
    bench("while+DMA+box152+reduce+push8", True, True, True, True,
          nops=152)


if __name__ == "__main__":
    main()

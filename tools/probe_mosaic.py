"""Probe Mosaic/Pallas TPU support for the primitives the new wavefront
kernels rely on.  Run with JAX_PLATFORMS default (TPU) or cpu+interpret."""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = os.environ.get("PROBE_INTERPRET", "0") == "1"
C = 1024


def run(name, fn, *args, **kw):
    try:
        out = fn(*args, **kw)
        out = jax.tree.map(np.asarray, out)
        print(f"OK   {name}: {jax.tree.map(lambda x: x.shape, out)}")
        return out
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
        return None


# 1. static roll on lanes
def k_roll_static(x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], x_ref.shape[1] - 4, axis=1)


# 2. dynamic roll on lanes
def k_roll_dyn(s_ref, x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], axis=1)


# 3. cumsum along lanes
def k_cumsum(x_ref, o_ref):
    o_ref[:] = _cumsum_lanes(x_ref[:].astype(jnp.int32)).astype(jnp.float32)


# 4. dynamic sublane-row store
def k_rowstore(x_ref, o_ref):
    def body(s, _):
        o_ref[pl.ds(s, 1), :] = x_ref[pl.ds(s, 1), :] * 2.0
        return 0

    jax.lax.fori_loop(0, 16, body, 0)


# 5. argmin over sublanes
def k_argmin(x_ref, o_ref, p_ref):
    o_ref[:] = jnp.min(x_ref[:], axis=0, keepdims=True)
    p_ref[:] = jnp.argmin(x_ref[:], axis=0, keepdims=True).astype(jnp.int32)


# 6. full compaction network
def _cumsum_lanes(m):
    # [1, C] i32 inclusive cumsum via log-shift adds
    x = m
    for b in range(10):
        s = 1 << b
        sh = pltpu.roll(x, s, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = x + jnp.where(lane >= s, sh, 0)
    return x


def _compact(data, mask):
    """Stable-compact live lanes of data [R, C] to the front."""
    m = mask.astype(jnp.int32)
    rank = _cumsum_lanes(m) - m
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    rem = jnp.where(mask, lane - rank, C)
    for b in range(10):
        s = 1 << b
        data_in = pltpu.roll(data, C - s, axis=1)
        rem_in = pltpu.roll(rem, C - s, axis=1)
        take = (rem_in & s) != 0
        keep = (rem & s) == 0
        data = jnp.where(take, data_in, data)
        rem = jnp.where(take, rem_in - s, jnp.where(keep, rem, C))
    return data, jnp.sum(m)


def k_compact(x_ref, m_ref, o_ref, n_ref):
    data, n = _compact(x_ref[:], m_ref[:] > 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    o_ref[:] = jnp.where(lane < n, data, 0.0)
    n_ref[0, 0] = n


# 7. narrow DMA [32, 16] from [P, 16] HBM at dynamic row
def k_narrowdma(s_ref, hbm_ref, o_ref, buf, sem):
    cp = pltpu.make_async_copy(hbm_ref.at[pl.ds(s_ref[0], 32), :], buf, sem)
    cp.start()
    cp.wait()
    o_ref[:] = buf[:]


# 8. dynamic-shift blend append into a [R, 2C] tail
def k_append(t_ref, x_ref, m_ref, tail_in, o_ref):
    tcnt = t_ref[0]
    data, n = _compact(x_ref[:], m_ref[:] > 0)
    pad = jnp.concatenate([data, jnp.zeros_like(data)], axis=1)
    rolled = pltpu.roll(pad, tcnt, axis=1)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * C), 1)
    sel = (lane2 >= tcnt) & (lane2 < tcnt + n)
    o_ref[:] = jnp.where(sel, rolled, jnp.where(lane2 < tcnt, o_ref[:], 0.0))


def main():
    x = jnp.arange(8 * C, dtype=jnp.float32).reshape(8, C)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    out = run("roll_static", pl.pallas_call(
        k_roll_static, out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32),
        in_specs=[vm], out_specs=vm, interpret=INTERPRET), x)
    if out is not None:
        ref = np.roll(np.asarray(x), -4, axis=1)
        print("   roll_static matches np.roll(-4):", np.array_equal(out, ref))

    out = run("roll_dyn", pl.pallas_call(
        k_roll_dyn, out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,), in_specs=[vm], out_specs=vm),
        interpret=INTERPRET), jnp.array([5], jnp.int32), x)
    if out is not None:
        ref = np.roll(np.asarray(x), 5, axis=1)
        print("   roll_dyn matches np.roll(+5):", np.array_equal(out, ref))

    run("cumsum_lanes", pl.pallas_call(
        k_cumsum, out_shape=jax.ShapeDtypeStruct((1, C), jnp.float32),
        in_specs=[vm], out_specs=vm, interpret=INTERPRET),
        jnp.ones((1, C), jnp.float32))

    run("dyn_rowstore", pl.pallas_call(
        k_rowstore, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        in_specs=[vm], out_specs=vm, interpret=INTERPRET),
        jnp.ones((16, 128), jnp.float32))

    out = run("argmin_sublane", pl.pallas_call(
        k_argmin, out_shape=(jax.ShapeDtypeStruct((1, C), jnp.float32),
                             jax.ShapeDtypeStruct((1, C), jnp.int32)),
        in_specs=[vm], out_specs=(vm, vm), interpret=INTERPRET),
        jax.random.uniform(jax.random.PRNGKey(0), (32, C)))

    key = jax.random.PRNGKey(1)
    mask = (jax.random.uniform(key, (1, C)) < 0.3).astype(jnp.float32)
    out = run("compact_network", pl.pallas_call(
        k_compact, out_shape=(jax.ShapeDtypeStruct((8, C), jnp.float32),
                              jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        in_specs=[vm, vm],
        out_specs=(vm, pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=INTERPRET), x, mask)
    if out is not None:
        data, n = out
        mnp = np.asarray(mask)[0] > 0
        ref = np.asarray(x)[:, mnp]
        got = data[:, : int(n[0, 0])]
        print("   compact correct:", np.array_equal(got, ref),
              "n:", int(n[0, 0]), "expected:", int(mnp.sum()))

    P = 4096
    tbl = jnp.arange(P * 16, dtype=jnp.float32).reshape(P, 16)
    out = run("narrow_dma", pl.pallas_call(
        k_narrowdma, out_shape=jax.ShapeDtypeStruct((32, 16), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)], out_specs=vm,
            scratch_shapes=[pltpu.VMEM((32, 16), jnp.float32),
                            pltpu.SemaphoreType.DMA(())]),
        interpret=INTERPRET), jnp.array([100], jnp.int32), tbl)
    if out is not None:
        ref = np.asarray(tbl)[100:132]
        print("   narrow_dma correct:", np.array_equal(out, ref))

    tail0 = jnp.zeros((8, 2 * C), jnp.float32).at[:, :37].set(7.0)
    out = run("append_blend", pl.pallas_call(
        k_append, out_shape=jax.ShapeDtypeStruct((8, 2 * C), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,), in_specs=[vm, vm, vm],
            out_specs=vm),
        input_output_aliases={3: 0},
        interpret=INTERPRET),
        jnp.array([37], jnp.int32), x, mask, tail0)
    if out is not None:
        mnp = np.asarray(mask)[0] > 0
        n = int(mnp.sum())
        ref = np.asarray(x)[:, mnp]
        ok = (np.array_equal(out[:, 37:37 + n], ref)
              and np.all(out[:, :37] == 7.0)
              and np.all(out[:, 37 + n:] == 0.0))
        print("   append_blend correct:", ok)


if __name__ == "__main__":
    main()

"""Live-lane payload compaction for the wavefront backend.

Russian roulette kills 75-90% of lanes at depths 2/3, yet every
traversal still sweeps full-size buffers: wavefront2's level-0 pass
DMAs and box-tests every chunk whether its lanes are live or not
(dead lanes just fail the masks).  Because wavefront2's final merge
scatters hits BY RAY ID (payload row 6), a compacted queue needs no
inverse permutation at all — results come back in original ray order
for free.  So the entire "ray compaction" machinery of the reference
(exclusive scan + scatter, src/exclusiveScan.cu_inl:73-110,
src/cudaRenderer.cu:1025-1057) reduces on TPU to this one kernel:
stable-compact the live lanes of the [8, N] payload to a prefix, and
run the same wavefront with seg_count = n_live.  Every downstream
kernel sweep is dynamically bounded by the live count, so traversal
cost scales with liveness while all shapes stay static.

Cost: one payload sweep (two HBM passes) + one shift network per
1024-lane block — ~10 ms at 7.7M rays, vs hundreds of ms saved on
RR-thinned passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavefront2 import ROWS, _append_tail

_INTERPRET = False

#: lanes per block (matches the wavefront CHUNK so the compacted
#: queue's chunk structure lines up)
C = 1024


def _partition_kernel(
    payload_hbm,  # [R, N] ANY — input payload, swept by DMA
    out_ref,  # [R, N] ANY — live lanes packed to the prefix
    nlive_ref,  # [1, 1] SMEM i32
    ebuf,  # [2][R, C] VMEM double buffer
    tail,  # [R, 2C]
    fbuf,  # [R, C]
    esem,
    fsem,
    *,
    nblocks: int,
    rows: int = ROWS,
):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)

    def start(i, slot):
        pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(i * C, C)], ebuf.at[slot], esem.at[slot]
        ).start()

    start(0, 0)

    def body(i, carry):
        tcnt, chunks, last = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nblocks)
        def _():
            start(i + 1, jax.lax.rem(i + 1, 2))

        pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(i * C, C)], ebuf.at[slot],
            esem.at[slot],
        ).wait()
        e = ebuf[slot]
        live = e[7:8, :] >= 0.0
        n = jnp.sum(live.astype(jnp.int32))

        @pl.when(n == C)
        def _():
            # fully-live block (the common case before RR thins the
            # population): skip the compaction network, just roll the
            # whole block into the tail
            padded = jnp.concatenate([e, jnp.zeros_like(e)], axis=1)
            rolled = pltpu.roll(padded, tcnt, axis=1)
            lane2 = jax.lax.broadcasted_iota(
                jnp.int32, (1, 2 * C), 1
            )
            sel = (lane2 >= tcnt) & (lane2 < tcnt + C)
            tail[...] = jnp.where(
                sel, rolled,
                jnp.where(lane2 < tcnt, tail[...], 0.0),
            )

        @pl.when((n > 0) & (n < C))
        def _():
            _append_tail(tail, e, live, tcnt)

        tcnt = tcnt + n
        flush = tcnt >= C

        @pl.when(flush)
        def _():
            @pl.when(last >= 0)
            def _():
                pltpu.make_async_copy(
                    fbuf, out_ref.at[:, pl.ds(last * C, C)], fsem
                ).wait()

            fbuf[...] = tail[:, 0:C]
            pltpu.make_async_copy(
                fbuf, out_ref.at[:, pl.ds(chunks * C, C)], fsem
            ).start()
            tail[...] = pltpu.roll(tail[...], C, axis=1)

        last = jnp.where(flush, chunks, last)
        chunks = chunks + jnp.where(flush, 1, 0)
        tcnt = tcnt - jnp.where(flush, C, 0)
        return (tcnt, chunks, last)

    tcnt, chunks, last = jax.lax.fori_loop(
        0, nblocks, body, (jnp.int32(0), jnp.int32(0), jnp.int32(-1))
    )

    # final partial chunk: pad the unfilled lanes dead (tub = -1) so
    # the consumer's last dynamic chunk never sees garbage lanes
    @pl.when(tcnt > 0)
    def _():
        @pl.when(last >= 0)
        def _():
            pltpu.make_async_copy(
                fbuf, out_ref.at[:, pl.ds(last * C, C)], fsem
            ).wait()

        dead = jnp.where(
            jnp.broadcast_to(rowid == 7, (rows, C)), -1.0, 0.0
        )
        fbuf[...] = jnp.where(lane < tcnt, tail[:, 0:C], dead)
        pltpu.make_async_copy(
            fbuf, out_ref.at[:, pl.ds(chunks * C, C)], fsem
        ).start()
        pltpu.make_async_copy(
            fbuf, out_ref.at[:, pl.ds(chunks * C, C)], fsem
        ).wait()

    @pl.when((tcnt == 0) & (last >= 0))
    def _():
        pltpu.make_async_copy(
            fbuf, out_ref.at[:, pl.ds(last * C, C)], fsem
        ).wait()

    nlive_ref[0, 0] = chunks * C + tcnt


def compact_live_payload(payload: jnp.ndarray):
    """Stable-compact live lanes (row 7 >= 0) of a payload [R, N] to
    the prefix (R = 8 for the wavefront queue payload; any row count
    with liveness in row 7 works — render/bounce.py's whole-depth
    compaction uses R = 16 full-state payloads).  Returns
    (packed [R, N], n_live [] i32).  Lanes past n_live in the last
    written chunk are marked dead; lanes beyond that chunk are
    unwritten garbage — consumers must bound their sweeps by n_live
    (wavefront2 does, via seg_count)."""
    R, N = payload.shape
    assert R >= 8 and N % C == 0, (R, N)
    nblocks = N // C
    out, nlive = pl.pallas_call(
        lambda p, o, nl, eb, tl, fb, es, fs: _partition_kernel(
            p, o, nl, eb, tl, fb, es, fs, nblocks=nblocks, rows=R
        ),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, N), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, R, C), jnp.float32),
            pltpu.VMEM((R, 2 * C), jnp.float32),
            pltpu.VMEM((R, C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(payload)
    return out, nlive[0, 0]


def _interpret() -> bool:
    from . import wavefront2 as _wf2

    return _INTERPRET or _wf2._INTERPRET

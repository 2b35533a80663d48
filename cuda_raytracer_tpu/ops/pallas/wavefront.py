"""Segment-major block-wavefront BVH traversal (Pallas TPU kernels).

TPU-native realization of the reference's wavefront design thesis
(README.md:8-21; rayIntersectSingle, src/cudaRenderer.cu:846-1297):
*keep rays grouped by BVH node so node/triangle data is loaded once per
group, not once per ray*.  The CUDA version stages a subtree node and
its <=32 triangles in shared memory per 64-ray block; here each level's
queue is laid out as per-node *segments* (contiguous block-aligned
column ranges of an [8, cols] payload), and the kernels walk segments:
one node-record DMA per segment, then dense [1, 1024]-lane chunk math
on the VPU.

A preorder-DFS property of the wide tree (asserted by
tests/test_bvh.py) makes scheduling almost free: the level-(l+1) node
list *is* the ordered concatenation of level-l children, so next-level
segments map statically to (segment, child) pairs and the whole
"kernelScanCounts" machinery (src/cudaRenderer.cu:1317-1489, incl. the
device->host maxBlocks round trip at :2236-2248) reduces to one
exclusive scan over per-child survivor counts.

Kernels per level:

1. **classify**: per segment, DMA the node record once; per 1024-lane
   chunk, slab-test all rays against the W child boxes (scalar
   constants — no gathers); write per-child hit masks (aligned with the
   queue) and per-(segment, child) counts.
2. **pack**: per (segment, child) with survivors, stream the segment's
   chunks: compact survivors to the front with a one-hot permutation
   matmul on the MXU (full f32 precision — the bf16 default rounds
   payloads) and blend them into the child's region via read-modify-
   write of the covering aligned blocks; a running in-kernel offset
   replaces the reference's atomicAdd slot grabbing
   (src/cudaRenderer.cu:1038).
3. **leaf**: per leaf segment, DMA the leaf's <=K primitive rows once;
   per chunk, test all rays against them (mirror of the shared-memory
   triangle stage, src/cudaRenderer.cu:1126-1294) and write per-lane
   (t, prim, ray) results, merged by a deterministic scatter-min in XLA
   (replacing kernelMergeIntersections' racy token scan,
   src/cudaRenderer.cu:515-540, 1187-1196).

Queue payload layout: [8, cols] float32 — rows 0-2 ray origin, 3-5 ray
direction, 6 ray id (exact f32 integer), 7 ray t-limit (shadow maxT;
finite sentinel, never inf — inf would NaN-poison the pack matmul).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...render.flatscene import FlatScene

INF = jnp.float32(jnp.inf)
#: finite "no t limit" sentinel for the payload (must not be inf)
T_NO_LIMIT = 1e30
#: miss marker in leaf outputs (> T_NO_LIMIT)
T_MISS = 2e30
#: queue block granularity (lane tile width, DMA alignment unit)
BLOCK = 128
#: lanes processed per chunk iteration (8 blocks = one full VPU fold)
CHUNK = 1024
#: payload rows
ROWS = 8
HIGH = jax.lax.Precision.HIGHEST


def _f2bits(t):
    return jax.lax.bitcast_convert_type(t, jnp.int32)


def _bits2f(b):
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# kernel 1: classify
# ---------------------------------------------------------------------------


def _classify_kernel(
    # scalar prefetch
    seg_node,  # [S] int32 (static node ids of this level)
    seg_base,  # [S] int32 (block base of each segment)
    seg_count,  # [S] int32 (entries in each segment)
    # inputs (ANY)
    queue,
    node_packed,
    # outputs (ANY, manually written)
    masks_out,  # [8, cols] f32, rows 0..W-1 aligned with queue columns
    counts_out,  # [S, 128] f32, lanes 0..W-1 = per-child counts
    # scratch
    entries,  # [8, CHUNK]
    nrow,  # [1, 128]
    m_all,  # [8, CHUNK]
    crow,  # [1, 128]
    sem,
    width: int,
    num_segs: int,
):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def seg_body(s, carry):
        cnt = seg_count[s]

        @pl.when(cnt > 0)
        def _():
            node = seg_node[s]
            base_col = seg_base[s] * BLOCK
            nchunks = (cnt + CHUNK - 1) // CHUNK
            cpn = pltpu.make_async_copy(
                node_packed.at[pl.ds(node, 1), :], nrow, sem.at[1]
            )
            cpn.start()

            def start_chunk(c, slot):
                pltpu.make_async_copy(
                    queue.at[:, pl.ds(base_col + c * CHUNK, CHUNK)],
                    entries.at[slot],
                    sem.at[2 + slot],
                ).start()

            start_chunk(0, 0)
            cpn.wait()
            # hoist loop-invariant node constants out of the chunk loop
            # (scalar VMEM reads are not free)
            boxes = []
            for w in range(width):
                boxes.append((
                    nrow[0, 3 * w + 0], nrow[0, 3 * w + 1],
                    nrow[0, 3 * w + 2],
                    nrow[0, 3 * width + 3 * w + 0],
                    nrow[0, 3 * width + 3 * w + 1],
                    nrow[0, 3 * width + 3 * w + 2],
                    nrow[0, 6 * width + w],
                ))

            def chunk_body(c, csums):
                slot = jax.lax.rem(c, 2)

                @pl.when(c + 1 < nchunks)
                def _():
                    start_chunk(c + 1, jax.lax.rem(c + 1, 2))

                col = base_col + c * CHUNK
                pltpu.make_async_copy(
                    queue.at[:, pl.ds(col, CHUNK)],
                    entries.at[slot],
                    sem.at[2 + slot],
                ).wait()
                ebuf = entries.at[slot]
                o_x = ebuf[0:1, :]
                o_y = ebuf[1:2, :]
                o_z = ebuf[2:3, :]
                d_x = ebuf[3:4, :]
                d_y = ebuf[4:5, :]
                d_z = ebuf[5:6, :]
                tlim = ebuf[7:8, :]
                valid = (lane + c * CHUNK) < cnt
                inv_x = 1.0 / d_x
                inv_y = 1.0 / d_y
                inv_z = 1.0 / d_z
                new_sums = []
                for w in range(width):
                    mnx, mny, mnz, mxx, mxy, mxz, outlet = boxes[w]
                    t0x = (mnx - o_x) * inv_x
                    t1x = (mxx - o_x) * inv_x
                    t0y = (mny - o_y) * inv_y
                    t1y = (mxy - o_y) * inv_y
                    t0z = (mnz - o_z) * inv_z
                    t1z = (mxz - o_z) * inv_z
                    tnear = jnp.maximum(
                        jnp.maximum(
                            jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)
                        ),
                        jnp.minimum(t0z, t1z),
                    )
                    tfar = jnp.minimum(
                        jnp.minimum(
                            jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)
                        ),
                        jnp.maximum(t0z, t1z),
                    )
                    inside = (
                        (o_x >= mnx)
                        & (o_x <= mxx)
                        & (o_y >= mny)
                        & (o_y <= mxy)
                        & (o_z >= mnz)
                        & (o_z <= mxz)
                    )
                    # intersectBBox semantics (cu:154-207): inside -> 0,
                    # behind/miss -> reject; gate by the ray's t-limit
                    hit = (
                        ((tnear <= tfar) & (tfar >= 0.0) & (tnear <= tlim))
                        | inside
                    )
                    hit = hit & valid & (outlet >= 0.0)
                    hit_f = hit.astype(jnp.float32)
                    m_all[w : w + 1, :] = hit_f
                    new_sums.append(csums[w] + jnp.sum(hit_f))
                for w in range(width, ROWS):
                    m_all[w : w + 1, :] = jnp.zeros((1, CHUNK), jnp.float32)
                cpm = pltpu.make_async_copy(
                    m_all, masks_out.at[:, pl.ds(col, CHUNK)], sem.at[0]
                )
                cpm.start()
                cpm.wait()
                return tuple(new_sums)

            sums = jax.lax.fori_loop(
                0, nchunks, chunk_body,
                tuple(jnp.float32(0.0) for _ in range(width)),
            )
            row = jnp.zeros((1, 128), jnp.float32)
            for w in range(width):
                row = jnp.where(lane128 == w, sums[w], row)
            crow[...] = row
            cpc = pltpu.make_async_copy(crow, counts_out.at[pl.ds(s, 1), :], sem.at[0])
            cpc.start()
            cpc.wait()

        return carry

    jax.lax.fori_loop(0, num_segs, seg_body, 0, unroll=False)


# ---------------------------------------------------------------------------
# kernel 2: pack
# ---------------------------------------------------------------------------


def _pack_kernel(
    # scalar prefetch
    seg_base,
    seg_count,
    pair_dest,  # [S * W] int32 element column of the child region, -1 = skip
    # inputs (ANY)
    queue_in,
    masks,
    # output (ANY, manually read+written)
    queue_out,
    # scratch
    entries,
    mblock,  # [8, CHUNK]
    window,  # [8, CHUNK + BLOCK]
    sem,
    width: int,
    num_segs: int,
):
    WIN = CHUNK + BLOCK
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    def seg_body(s, carry):
        cnt = seg_count[s]
        base_col = seg_base[s] * BLOCK

        @pl.when(cnt > 0)
        def _():
            def chunk_body(c, runnings):
                col = base_col + c * CHUNK
                cpq = pltpu.make_async_copy(
                    queue_in.at[:, pl.ds(col, CHUNK)], entries, sem.at[0]
                )
                cpq.start()
                cpm = pltpu.make_async_copy(
                    masks.at[:, pl.ds(col, CHUNK)], mblock, sem.at[1]
                )
                cpm.start()
                cpq.wait()
                cpm.wait()

                valid = (lane + c * CHUNK) < cnt
                # clear garbage lanes (select, not multiply: NaN * 0
                # stays NaN and would poison the MXU)
                ev = jnp.broadcast_to(valid, (ROWS, CHUNK))
                entries[...] = jnp.where(ev, entries[...], 0.0)

                new_runnings = []
                for w in range(width):
                    running = runnings[w]
                    m = jnp.where(valid, mblock[w : w + 1, :], 0.0)
                    n = jnp.sum(m).astype(jnp.int32)

                    @pl.when((running >= 0) & (n > 0))
                    def _():
                        blk0 = running // BLOCK
                        a = running % BLOCK
                        cpr = pltpu.make_async_copy(
                            queue_out.at[:, pl.ds(blk0 * BLOCK, WIN)],
                            window,
                            sem.at[2],
                        )
                        cpr.start()
                        src = jax.lax.broadcasted_iota(
                            jnp.int32, (CHUNK, CHUNK), 0
                        )
                        dcol = jax.lax.broadcasted_iota(
                            jnp.int32, (CHUNK, CHUNK), 1
                        )
                        tri = (src < dcol).astype(jnp.float32)
                        pos = jnp.dot(
                            m, tri,
                            preferred_element_type=jnp.float32,
                            precision=HIGH,
                        )
                        tgt = pos.astype(jnp.int32) + a
                        dst2 = jax.lax.broadcasted_iota(
                            jnp.int32, (CHUNK, WIN), 1
                        )
                        perm = (
                            (jnp.broadcast_to(tgt.T, (CHUNK, WIN)) == dst2)
                            & (jnp.broadcast_to(m.T, (CHUNK, WIN)) > 0.5)
                        ).astype(jnp.float32)
                        contrib = jnp.dot(
                            entries[...], perm,
                            preferred_element_type=jnp.float32,
                            precision=HIGH,
                        )
                        cpr.wait()
                        wlane = jax.lax.broadcasted_iota(
                            jnp.int32, (ROWS, WIN), 1
                        )
                        sel = (wlane >= a) & (wlane < a + n)
                        window[...] = jnp.where(sel, contrib, window[...])
                        cpw = pltpu.make_async_copy(
                            window,
                            queue_out.at[:, pl.ds(blk0 * BLOCK, WIN)],
                            sem.at[2],
                        )
                        cpw.start()
                        cpw.wait()

                    new_runnings.append(
                        jnp.where(running >= 0, running + n, running)
                    )
                return tuple(new_runnings)

            nchunks = (cnt + CHUNK - 1) // CHUNK
            jax.lax.fori_loop(
                0, nchunks, chunk_body,
                tuple(pair_dest[s * width + w] for w in range(width)),
            )

        return carry

    jax.lax.fori_loop(0, num_segs, seg_body, 0, unroll=False)


# ---------------------------------------------------------------------------
# kernel 3: leaf intersection
# ---------------------------------------------------------------------------


def _leaf_kernel(
    # scalar prefetch
    leaf_flag,  # [S] int32 (static leaf-ness of this level's nodes)
    seg_node,
    seg_base,
    seg_count,
    cursor_in,  # [1] int32 — append position in the results buffer
    # inputs (ANY)
    queue,
    node_packed,
    prim_packed,
    results_in,  # aliased to out_hbm
    # outputs (ANY): results [8, rescap] rows 0=t 1=prim 2=ray (append
    # log across all levels of one trace), cursor row [1, 128]
    out_hbm,
    cursor_out,
    # scratch
    entries,
    nrow,
    prows,  # [K8, 128]
    outs,  # [8, CHUNK]
    crow,  # [1, 128]
    window,  # [8, CHUNK + BLOCK]
    sem,
    width: int,
    max_leaf: int,
    num_segs: int,
    rescap: int,
):
    k8 = ((max_leaf + 7) // 8) * 8
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    def seg_body(s, cursor):
        cnt = seg_count[s]
        live = (cnt > 0) & (leaf_flag[s] > 0)

        def process():
            node = seg_node[s]
            base_col = seg_base[s] * BLOCK
            nchunks = (cnt + CHUNK - 1) // CHUNK
            cpn = pltpu.make_async_copy(
                node_packed.at[pl.ds(node, 1), :], nrow, sem.at[1]
            )
            cpn.start()

            def start_chunk(c, slot):
                pltpu.make_async_copy(
                    queue.at[:, pl.ds(base_col + c * CHUNK, CHUNK)],
                    entries.at[slot],
                    sem.at[3 + slot],
                ).start()

            start_chunk(0, 0)
            cpn.wait()
            start = nrow[0, 7 * width].astype(jnp.int32)
            rng = nrow[0, 7 * width + 1].astype(jnp.int32)
            cpp = pltpu.make_async_copy(
                prim_packed.at[pl.ds(start, k8), :], prows, sem.at[2]
            )
            cpp.start()
            cpp.wait()
            prim_consts = []
            for kk in range(max_leaf):
                prim_consts.append((
                    prows[kk, 0], prows[kk, 1], prows[kk, 2],
                    prows[kk, 3], prows[kk, 4], prows[kk, 5],
                    prows[kk, 6], prows[kk, 7], prows[kk, 8],
                    prows[kk, 9],
                ))

            def chunk_body(c, cur):
                slot = jax.lax.rem(c, 2)

                @pl.when(c + 1 < nchunks)
                def _():
                    start_chunk(c + 1, jax.lax.rem(c + 1, 2))

                col = base_col + c * CHUNK
                pltpu.make_async_copy(
                    queue.at[:, pl.ds(col, CHUNK)],
                    entries.at[slot],
                    sem.at[3 + slot],
                ).wait()
                ebuf = entries.at[slot]
                o_x = ebuf[0:1, :]
                o_y = ebuf[1:2, :]
                o_z = ebuf[2:3, :]
                d_x = ebuf[3:4, :]
                d_y = ebuf[4:5, :]
                d_z = ebuf[5:6, :]
                valid = (lane + c * CHUNK) < cnt

                tmin = jnp.full((1, CHUNK), jnp.inf, jnp.float32)
                pmin = jnp.zeros((1, CHUNK), jnp.float32)
                for kk in range(max_leaf):
                    (v0x, v0y, v0z, v1x, v1y, v1z,
                     v2x, v2y, v2z, ptype) = prim_consts[kk]
                    in_range = kk < rng

                    # triangle plane + half-plane tests
                    # (intersectRayTriangle, cu:217-270)
                    e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
                    e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
                    nx = e1y * e2z - e1z * e2y
                    ny = e1z * e2x - e1x * e2z
                    nz = e1x * e2y - e1y * e2x
                    denom = nx * d_x + ny * d_y + nz * d_z
                    parallel = jnp.abs(denom) < 1e-6
                    dplane = nx * v0x + ny * v0y + nz * v0z
                    t_tri = (
                        dplane - (nx * o_x + ny * o_y + nz * o_z)
                    ) / jnp.where(parallel, 1.0, denom)
                    px = o_x + t_tri * d_x
                    py = o_y + t_tri * d_y
                    pz = o_z + t_tri * d_z

                    def edge_ok(ax, ay, az, bx, by, bz):
                        ex, ey, ez = bx - ax, by - ay, bz - az
                        wx, wy, wz = px - ax, py - ay, pz - az
                        cx = ey * wz - ez * wy
                        cy = ez * wx - ex * wz
                        cz = ex * wy - ey * wx
                        return nx * cx + ny * cy + nz * cz >= 0.0

                    inside = (
                        edge_ok(v0x, v0y, v0z, v1x, v1y, v1z)
                        & edge_ok(v1x, v1y, v1z, v2x, v2y, v2z)
                        & edge_ok(v2x, v2y, v2z, v0x, v0y, v0z)
                    )
                    ok_tri = (~parallel) & inside & (t_tri >= 0.0)

                    # sphere (center v0, radius prows[kk,3])
                    radius = v1x
                    ocx, ocy, ocz = o_x - v0x, o_y - v0y, o_z - v0z
                    a_q = d_x * d_x + d_y * d_y + d_z * d_z
                    b_q = 2.0 * (ocx * d_x + ocy * d_y + ocz * d_z)
                    c_q = ocx * ocx + ocy * ocy + ocz * ocz - radius * radius
                    disc = b_q * b_q - 4.0 * a_q * c_q
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    ts1 = (-b_q - sq) / (2.0 * a_q)
                    ts2 = (-b_q + sq) / (2.0 * a_q)
                    t_sph = jnp.where(ts1 > 0, ts1, ts2)
                    ok_sph = (disc >= 0) & (t_sph > 0)

                    is_sph = ptype > 0.5
                    t_k = jnp.where(is_sph, t_sph, t_tri)
                    # logical blend: Mosaic can't select i1 vectors
                    ok = (
                        ((is_sph & ok_sph) | ((~is_sph) & ok_tri))
                        & in_range
                        & valid
                    )
                    better = ok & (t_k < tmin)
                    tmin = jnp.where(better, t_k, tmin)
                    pmin = jnp.where(
                        better,
                        jnp.float32(kk) + start.astype(jnp.float32),
                        pmin,
                    )

                hitm = (tmin < jnp.inf).astype(jnp.float32)
                n = jnp.sum(hitm).astype(jnp.int32)
                outs[0:1, :] = jnp.where(tmin < jnp.inf, tmin, T_MISS)
                outs[1:2, :] = pmin
                outs[2:3, :] = jnp.where(valid, ebuf[6:7, :], -1.0)
                outs[3:8, :] = jnp.zeros((5, CHUNK), jnp.float32)

                # compact the hits and append at the element-granular
                # cursor via a read-modify-write of the covering blocks
                # (buffer has CHUNK+BLOCK slack beyond rescap)
                @pl.when((n > 0) & (cur <= rescap))
                def _():
                    WIN = CHUNK + BLOCK
                    blk0 = cur // BLOCK
                    a = cur % BLOCK
                    cpr = pltpu.make_async_copy(
                        out_hbm.at[:, pl.ds(blk0 * BLOCK, WIN)], window,
                        sem.at[0],
                    )
                    cpr.start()
                    src = jax.lax.broadcasted_iota(
                        jnp.int32, (CHUNK, CHUNK), 0
                    )
                    dcol = jax.lax.broadcasted_iota(
                        jnp.int32, (CHUNK, CHUNK), 1
                    )
                    tri2 = (src < dcol).astype(jnp.float32)
                    pos = jnp.dot(
                        hitm, tri2,
                        preferred_element_type=jnp.float32, precision=HIGH,
                    )
                    tgt = pos.astype(jnp.int32) + a
                    dst2 = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, WIN), 1)
                    perm = (
                        (jnp.broadcast_to(tgt.T, (CHUNK, WIN)) == dst2)
                        & (jnp.broadcast_to(hitm.T, (CHUNK, WIN)) > 0.5)
                    ).astype(jnp.float32)
                    contrib = jnp.dot(
                        outs[...], perm,
                        preferred_element_type=jnp.float32, precision=HIGH,
                    )
                    cpr.wait()
                    wlane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, WIN), 1)
                    sel = (wlane >= a) & (wlane < a + n)
                    window[...] = jnp.where(sel, contrib, window[...])
                    cpw = pltpu.make_async_copy(
                        window, out_hbm.at[:, pl.ds(blk0 * BLOCK, WIN)],
                        sem.at[0],
                    )
                    cpw.start()
                    cpw.wait()

                return cur + n

            return jax.lax.fori_loop(0, nchunks, chunk_body, cursor)

        return jax.lax.cond(live, process, lambda: cursor)

    cursor = jax.lax.fori_loop(
        0, num_segs, seg_body, cursor_in[0], unroll=False
    )
    crow[...] = jnp.full((1, 128), 1.0, jnp.float32) * cursor.astype(
        jnp.float32
    )
    cpc = pltpu.make_async_copy(crow, cursor_out, sem.at[0])
    cpc.start()
    cpc.wait()


# ---------------------------------------------------------------------------
# kernel runners
# ---------------------------------------------------------------------------


def _any_spec(n):
    return [pl.BlockSpec(memory_space=pltpu.ANY) for _ in range(n)]


def _hbm():
    return pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)


def _run_classify(queue, node_packed, seg_node, seg_base, seg_count,
                  width: int, cols: int):
    S = seg_node.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[_hbm(), pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(_hbm(), pl.BlockSpec(memory_space=pltpu.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.VMEM((ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_classify_kernel, width=width, num_segs=S),
        out_shape=(
            jax.ShapeDtypeStruct((ROWS, cols), jnp.float32),
            jax.ShapeDtypeStruct((S, 128), jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(seg_node, seg_base, seg_count, queue, node_packed)


def _run_pack(queue_in, masks, seg_base, seg_count, pair_dest,
              width: int, cols_out: int):
    S = seg_base.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[_hbm(), _hbm()],
        out_specs=_hbm(),
        scratch_shapes=[
            pltpu.VMEM((ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((ROWS, CHUNK + BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_pack_kernel, width=width, num_segs=S),
        out_shape=jax.ShapeDtypeStruct((ROWS, cols_out), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(seg_base, seg_count, pair_dest, queue_in, masks)


def _run_leaf(queue, node_packed, prim_packed, results, leaf_flag,
              seg_node, seg_base, seg_count, cursor,
              width: int, max_leaf: int, rescap: int):
    S = seg_node.shape[0]
    k8 = ((max_leaf + 7) // 8) * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(1,),
        in_specs=[
            _hbm(),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            _hbm(),
        ],
        out_specs=(_hbm(), pl.BlockSpec(memory_space=pltpu.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.VMEM((k8, 128), jnp.float32),
            pltpu.VMEM((ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.VMEM((ROWS, CHUNK + BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _leaf_kernel, width=width, max_leaf=max_leaf, num_segs=S,
            rescap=rescap,
        ),
        out_shape=(
            jax.ShapeDtypeStruct(results.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ),
        grid_spec=grid_spec,
        # the results buffer is an append log threaded through levels
        input_output_aliases={8: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(leaf_flag, seg_node, seg_base, seg_count, cursor,
      queue, node_packed, prim_packed, results)


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------


class WaveTraceResult(NamedTuple):
    t: jnp.ndarray
    prim: jnp.ndarray
    dropped: jnp.ndarray


def trace_closest_wavefront(
    scene: FlatScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    valid: jnp.ndarray,
    t_limit: jnp.ndarray = None,
    queue_multiplier: int = 4,
) -> WaveTraceResult:
    """Closest-hit traversal for N rays via the segment-major Pallas
    pipeline.  Semantics match ops.traverse.trace_closest except that
    box pruning uses the static per-ray ``t_limit`` (shadow maxT)
    instead of the evolving minT — strictly conservative."""
    # pad the ray count to a CHUNK multiple: partial final chunks at
    # level 0 trigger a data-dependent TPU fault for some (N, coherent
    # workload) combinations (observed at N=74892/59996 coherent;
    # full-chunk shapes never fault).  Padding costs <0.2% at render
    # sizes and makes every chunk DMA full.
    N_in = o.shape[0]
    npad = (-N_in) % CHUNK
    if npad:
        zero3 = jnp.zeros((npad, 3), o.dtype)
        o = jnp.concatenate([o, zero3])
        d = jnp.concatenate([d, zero3])
        valid = jnp.concatenate([valid, jnp.zeros((npad,), bool)])
        if t_limit is not None:
            t_limit = jnp.concatenate(
                [t_limit, jnp.zeros((npad,), t_limit.dtype)]
            )
    bvh = scene.bvh
    N = o.shape[0]
    W = bvh.width
    levels = bvh.num_levels
    max_level_nodes = max(len(lv) for lv in bvh.levels)
    #: block capacity per level: payload-tight + one partial block per
    #: node (overflow counted in `dropped`)
    capb = _cdiv(queue_multiplier * N, BLOCK) + max_level_nodes + 2
    cols = capb * BLOCK + CHUNK + BLOCK  # window/chunk DMA headroom

    # static per-level metadata (preorder-DFS child-order invariant)
    seg_nodes_np = [np.asarray(lv, dtype=np.int32) for lv in bvh.levels]
    pair_next_np = []
    for lvl in range(levels - 1):
        flat_valid = np.asarray(bvh.level_child_valid[lvl], dtype=bool)
        nxt = np.full(flat_valid.shape, -1, np.int32)
        nxt[flat_valid] = np.arange(flat_valid.sum(), dtype=np.int32)
        pair_next_np.append(nxt)

    ray_f = jnp.arange(N, dtype=jnp.int32).astype(jnp.float32)
    tlim = (
        jnp.full((N,), T_NO_LIMIT, jnp.float32)
        if t_limit is None
        else jnp.minimum(t_limit.astype(jnp.float32), T_NO_LIMIT)
    )
    vmask = valid[:, None]
    # park invalid rays far outside every AABB (zero direction alone
    # still passes the origin-inside test)
    o_sane = jnp.where(vmask, o.astype(jnp.float32), 2e30)
    d_sane = jnp.where(vmask, d.astype(jnp.float32), 0.0)
    payload = jnp.concatenate(
        [o_sane.T, d_sane.T, ray_f[None, :], tlim[None, :]],
        axis=0,
    )

    best_bits = jnp.full((N,), _f2bits(INF), jnp.int32)
    best_prim = jnp.full((N,), -1, jnp.int32)
    dropped = jnp.int32(0)

    # level-0 queue only needs the ray payload (downstream kernels never
    # read beyond each segment's count) — keep it small, skipping a
    # full-capacity zero fill
    cols0 = _cdiv(N, CHUNK) * CHUNK + CHUNK + BLOCK
    queue = jnp.zeros((ROWS, cols0), jnp.float32).at[:, :N].set(payload)
    seg_base = jnp.zeros((1,), jnp.int32)
    seg_count = jnp.full((1,), N, jnp.int32)

    #: append log of per-lane leaf results across all levels; merged
    #: once at the end (vs. the reference's per-bounce
    #: kernelMergeIntersections over 16-token buffers)
    # only hits are appended (compacted); a ray hits in at most a few
    # visited leaves, so ~3N covers real scenes (overflow -> dropped)
    rescap = max((3 * N // BLOCK + 1) * BLOCK, 8 * CHUNK)
    # slack must cover the full RMW window (CHUNK + BLOCK) at cur=rescap
    results = jnp.zeros((ROWS, rescap + CHUNK + BLOCK), jnp.float32)
    cursor = jnp.zeros((1,), jnp.int32)

    for level in range(levels):
        seg_node = jnp.asarray(seg_nodes_np[level])

        # --- leaf segments of this level: append (t, prim, ray) ---
        if bvh.level_leaf[level] > 0:
            leaf_flag = jnp.asarray(
                (np.asarray(
                    [1 if n_leaf else 0
                     for n_leaf in _leaf_flags_np(bvh, level)]
                )).astype(np.int32)
            )
            results, cursor_row = _run_leaf(
                queue, bvh.node_packed, scene.prim_packed, results,
                leaf_flag, seg_node, seg_base, seg_count, cursor,
                W, bvh.max_leaf, rescap,
            )
            cursor = cursor_row[0, 0].astype(jnp.int32).reshape(1)

        if level == levels - 1 or bvh.level_inner[level] == 0:
            break

        # --- classify + schedule + pack ---
        masks, counts128 = _run_classify(
            queue, bvh.node_packed, seg_node, seg_base, seg_count, W, cols
        )
        counts = counts128[:, :W].astype(jnp.int32)  # [S, W]

        pair_next = pair_next_np[level]  # [S*W] static
        S_next = len(seg_nodes_np[level + 1])
        next_idx = jnp.asarray(
            np.where(pair_next >= 0, pair_next, S_next).astype(np.int32)
        )
        count_next = (
            jnp.zeros((S_next + 1,), jnp.int32)
            .at[next_idx]
            .set(counts.reshape(-1))[:S_next]
        )
        blocks_next = (count_next + BLOCK - 1) // BLOCK
        base_next = jnp.cumsum(blocks_next) - blocks_next
        fits = base_next + blocks_next <= capb
        dropped = dropped + jnp.sum(jnp.where(fits, 0, count_next))
        count_next = jnp.where(fits, count_next, 0)
        dest_all = jnp.where(fits, base_next * BLOCK, -1)  # [S_next]
        pair_dest = jnp.concatenate(
            [dest_all, jnp.full((1,), -1, jnp.int32)]
        )[next_idx].astype(jnp.int32)

        queue = _run_pack(
            queue, masks, seg_base, seg_count, pair_dest, W, cols
        )
        seg_base = base_next.astype(jnp.int32)
        seg_count = count_next.astype(jnp.int32)

    # --- single deterministic merge over the append log ---
    used = jnp.minimum(cursor[0], rescap)
    dropped = dropped + jnp.maximum(cursor[0] - rescap, 0)
    colid = jnp.arange(results.shape[1], dtype=jnp.int32)
    t_flat = results[0]
    p_flat = results[1]
    r_flat = results[2]
    finite = (t_flat < T_NO_LIMIT) & (r_flat >= 0) & (colid < used)
    ray_i = jnp.where(finite, r_flat, 0.0).astype(jnp.int32)
    ray_i = jnp.where(finite, ray_i, N)
    bits = _f2bits(jnp.where(finite, t_flat, INF))
    best_bits = best_bits.at[ray_i].min(bits, mode="drop")
    win = finite & (bits == best_bits[jnp.clip(ray_i, 0, N - 1)])
    tgt = jnp.where(win, ray_i, N)
    best_prim = best_prim.at[tgt].set(p_flat.astype(jnp.int32), mode="drop")

    return WaveTraceResult(
        t=jnp.where(best_prim >= 0, _bits2f(best_bits), INF)[:N_in],
        prim=best_prim[:N_in],
        dropped=dropped,
    )


def _leaf_flags_np(bvh, level):
    """Static leaf-ness of a level's nodes (from the static metadata)."""
    # level_child_valid gives outlets validity; leaf-ness is recorded in
    # levels/level_leaf via leaf_range, exposed statically here through
    # the per-level leaf counts: recompute from the level node ids and
    # the static levels structure
    return bvh.level_is_leaf[level]

"""Block-wavefront BVH traversal with Pallas TPU kernels.

This is the TPU-native realization of the reference's core design
thesis (README.md:8-21; rayIntersectSingle, src/cudaRenderer.cu:846-
1297): *keep rays grouped by BVH node and process them in fixed-size
blocks so node/triangle data is loaded once per block, not once per
ray*.  The CUDA version stages a subtree node and <=32 triangles in
shared memory per 64-ray block; here every queue block of B=128 rays
belongs to one wide-BVH node, the kernels DMA that node's record (and
its leaf primitives) into VMEM once, and all per-ray math runs dense on
8x128 VPU tiles.

Pipeline per level (the analog of kernelScanCounts +
kernelRayIntersectLevel, src/cudaRenderer.cu:1317-1489):

1. **classify kernel**: per queue block, test its B rays against the
   node's W child AABBs -> per-child hit masks.
2. **schedule** (XLA, tiny arrays): group the (block, child) survivor
   groups by child node and assign exact element offsets in the next
   level's queue by exclusive scan — kernelScanCounts' wOffset /
   blockOffsets logic without the device->host ``maxBlocks`` round trip
   (src/cudaRenderer.cu:2236-2248).  Child regions are block-aligned at
   their base (so each block belongs to one node) but internally tight:
   occupancy loses at most one partial block per *node*, not per group.
3. **pack kernel**: compact each group's survivors to the front with a
   one-hot permutation matmul on the MXU (the TPU's version of the
   shared-memory exclusive-scan scatter, src/exclusiveScan.cu_inl:73-
   110), then blend them into the destination via a read-modify-write
   of the two aligned blocks covering [off, off+n) — writes touch only
   their own lanes, so group write order is irrelevant and no alignment
   padding is needed.
4. **leaf kernel**: per leaf block, DMA the leaf's <=K primitive rows
   into VMEM once and test all B rays against them (mirror of the
   shared-memory triangle stage, src/cudaRenderer.cu:1126-1294);
   per-ray (t, prim) minima go back to XLA for the deterministic
   scatter-min merge (replacing kernelMergeIntersections' token scan,
   src/cudaRenderer.cu:515-540).

All kernels run as a single grid step with an internal ``fori_loop``
over the *live* block count, so empty queue capacity costs nothing.

Queue payload layout: [8, cols] float32 — rows 0-2 ray origin, 3-5 ray
direction, 6 ray id (as an exact f32 integer), 7 ray t-limit (shadow
maxT; finite sentinel, never inf — inf would NaN-poison the pack
matmul).  Blocks are B consecutive columns; per-block node ids and
valid counts live in int32 side arrays (the kernels' scalar-prefetch
arguments).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...render.flatscene import FlatScene

INF = jnp.float32(jnp.inf)
#: finite "no t limit" sentinel for the payload (must not be inf)
T_NO_LIMIT = 1e30
#: rays per queue block = lane tile width (DMA alignment unit)
BLOCK = 128
#: payload rows
ROWS = 8


def _f2bits(t):
    return jax.lax.bitcast_convert_type(t, jnp.int32)


def _bits2f(b):
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# kernel 1: classify (box tests -> per-child hit masks)
# ---------------------------------------------------------------------------


def _classify_kernel(
    # scalar prefetch
    block_node,
    block_count,
    num_blocks,
    # inputs (ANY)
    queue,
    node_packed,
    # output (ANY, manually written)
    masks_out,  # [maxb, 8, BLOCK] f32
    # scratch
    entries,
    nrow,
    m_all,
    sem,
    width: int,
):
    def body(b, _):
        node = block_node[b]
        cnt = block_count[b]
        cp1 = pltpu.make_async_copy(
            queue.at[:, pl.ds(b * BLOCK, BLOCK)], entries, sem.at[0]
        )
        cp1.start()
        cp2 = pltpu.make_async_copy(
            node_packed.at[pl.ds(node, 1), :], nrow, sem.at[1]
        )
        cp2.start()
        cp1.wait()
        cp2.wait()

        o_x = entries[0:1, :]
        o_y = entries[1:2, :]
        o_z = entries[2:3, :]
        d_x = entries[3:4, :]
        d_y = entries[4:5, :]
        d_z = entries[5:6, :]
        tlim = entries[7:8, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
        valid = lane < cnt

        inv_x = 1.0 / d_x
        inv_y = 1.0 / d_y
        inv_z = 1.0 / d_z

        for w in range(width):
            mnx = nrow[0, 3 * w + 0]
            mny = nrow[0, 3 * w + 1]
            mnz = nrow[0, 3 * w + 2]
            mxx = nrow[0, 3 * width + 3 * w + 0]
            mxy = nrow[0, 3 * width + 3 * w + 1]
            mxz = nrow[0, 3 * width + 3 * w + 2]
            outlet = nrow[0, 6 * width + w]

            t0x = (mnx - o_x) * inv_x
            t1x = (mxx - o_x) * inv_x
            t0y = (mny - o_y) * inv_y
            t1y = (mxy - o_y) * inv_y
            t0z = (mnz - o_z) * inv_z
            t1z = (mxz - o_z) * inv_z
            tnear = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z),
            )
            tfar = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
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
            # slab semantics of intersectBBox (cu:154-207): inside -> 0,
            # behind/miss -> reject; gate by the ray's t-limit
            hit = ((tnear <= tfar) & (tfar >= 0.0) & (tnear <= tlim)) | inside
            hit = hit & valid & (outlet >= 0.0)
            hit_f = hit.astype(jnp.float32)
            m_all[w : w + 1, :] = hit_f
            # per-child count broadcast into row W+w: lets XLA read
            # counts with a cheap slice instead of a [maxb,8,128] reduce
            m_all[width + w : width + w + 1, :] = jnp.full(
                (1, BLOCK), jnp.sum(hit_f)
            )

        cp3 = pltpu.make_async_copy(m_all, masks_out.at[b], sem.at[0])
        cp3.start()
        cp3.wait()
        return _

    jax.lax.fori_loop(0, num_blocks[0], body, 0, unroll=False)


# ---------------------------------------------------------------------------
# kernel 2: pack each (block, child) group into the child's queue region
# ---------------------------------------------------------------------------


def _pack_kernel(
    # scalar prefetch
    offsets,  # [maxb * W] int32 — destination element column, -1 = skip
    block_count,
    num_blocks,
    # inputs (ANY)
    queue_in,
    masks,
    # output (ANY, manually read+written)
    queue_out,
    # scratch
    entries,
    mblock,
    window,  # [8, 2*BLOCK]
    sem,
    width: int,
):
    def body(b, carry):
        cnt = block_count[b]
        cp1 = pltpu.make_async_copy(
            queue_in.at[:, pl.ds(b * BLOCK, BLOCK)], entries, sem.at[0]
        )
        cp1.start()
        cp2 = pltpu.make_async_copy(masks.at[b], mblock, sem.at[1])
        cp2.start()
        cp1.wait()
        cp2.wait()

        # clear invalid tail lanes: they hold garbage (possibly NaN) and
        # 0 * NaN in the one-hot matmul would poison every output.
        # select, not multiply — NaN * 0 stays NaN.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
        valid = jnp.broadcast_to(lane < cnt, (ROWS, BLOCK))
        entries[...] = jnp.where(valid, entries[...], 0.0)

        for w in range(width):
            off = offsets[b * width + w]

            @pl.when(off >= 0)
            def _():
                blk0 = off // BLOCK
                a = off % BLOCK
                m = mblock[w : w + 1, :]  # [1, B] f32 0/1
                n = jnp.sum(m).astype(jnp.int32)
                # read-modify-write window of the two aligned blocks
                # covering [off, off + n)
                cpr = pltpu.make_async_copy(
                    queue_out.at[:, pl.ds(blk0 * BLOCK, 2 * BLOCK)],
                    window,
                    sem.at[2],
                )
                cpr.start()
                # exclusive prefix sum as a strict-lower-triangular
                # matmul (Mosaic has no cumsum; the MXU is faster):
                # pos[i] = sum_j m[j] * [j < i]
                src = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
                dcol = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
                tri = (src < dcol).astype(jnp.float32)
                pos = jnp.dot(m, tri, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
                # one-hot scatter into the window: perm[src, dst] =
                # m[src] and (pos[src] + a) == dst
                tgt = pos.astype(jnp.int32) + a  # [1, B]
                dst2 = jax.lax.broadcasted_iota(
                    jnp.int32, (BLOCK, 2 * BLOCK), 1
                )
                perm = (
                    (jnp.broadcast_to(tgt.T, (BLOCK, 2 * BLOCK)) == dst2)
                    & (jnp.broadcast_to(m.T, (BLOCK, 2 * BLOCK)) > 0.5)
                ).astype(jnp.float32)
                # HIGHEST precision: the default bf16 MXU pass would
                # round payload floats (ray ids > 256, coordinates)
                contrib = jnp.dot(
                    entries[...], perm, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [8, 2B]
                cpr.wait()
                wlane = jax.lax.broadcasted_iota(
                    jnp.int32, (ROWS, 2 * BLOCK), 1
                )
                sel = (wlane >= a) & (wlane < a + n)
                window[...] = jnp.where(sel, contrib, window[...])
                cpw = pltpu.make_async_copy(
                    window,
                    queue_out.at[:, pl.ds(blk0 * BLOCK, 2 * BLOCK)],
                    sem.at[2],
                )
                cpw.start()
                cpw.wait()

        return carry

    jax.lax.fori_loop(0, num_blocks[0], body, 0, unroll=False)


# ---------------------------------------------------------------------------
# kernel 3: leaf intersection (primitives staged in VMEM per block)
# ---------------------------------------------------------------------------


def _leaf_kernel(
    # scalar prefetch
    block_node,
    block_count,
    num_blocks,
    # inputs (ANY)
    queue,
    node_packed,
    prim_packed,  # [P + pad, 128] f32
    # output (ANY, manually written) [maxb, 8, BLOCK]
    out_hbm,
    # scratch
    entries,
    nrow,
    prows,  # [K8, 128]
    outs,
    sem,
    width: int,
    max_leaf: int,
):
    k8 = ((max_leaf + 7) // 8) * 8

    def body(b, _):
        node = block_node[b]
        cnt = block_count[b]
        cp1 = pltpu.make_async_copy(
            queue.at[:, pl.ds(b * BLOCK, BLOCK)], entries, sem.at[0]
        )
        cp1.start()
        cp2 = pltpu.make_async_copy(
            node_packed.at[pl.ds(node, 1), :], nrow, sem.at[1]
        )
        cp2.start()
        cp2.wait()
        start = nrow[0, 7 * width].astype(jnp.int32)
        rng = nrow[0, 7 * width + 1].astype(jnp.int32)
        cp3 = pltpu.make_async_copy(
            prim_packed.at[pl.ds(start, k8), :], prows, sem.at[2]
        )
        cp3.start()
        cp1.wait()
        cp3.wait()

        o_x = entries[0:1, :]
        o_y = entries[1:2, :]
        o_z = entries[2:3, :]
        d_x = entries[3:4, :]
        d_y = entries[4:5, :]
        d_z = entries[5:6, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
        valid = lane < cnt

        tmin = jnp.full((1, BLOCK), jnp.inf, jnp.float32)
        pmin = jnp.zeros((1, BLOCK), jnp.float32)

        for kk in range(max_leaf):
            v0x, v0y, v0z = prows[kk, 0], prows[kk, 1], prows[kk, 2]
            v1x, v1y, v1z = prows[kk, 3], prows[kk, 4], prows[kk, 5]
            v2x, v2y, v2z = prows[kk, 6], prows[kk, 7], prows[kk, 8]
            ptype = prows[kk, 9]
            in_range = kk < rng

            # triangle: plane + half-plane tests (intersectRayTriangle,
            # cu:217-270)
            e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
            e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
            nx = e1y * e2z - e1z * e2y
            ny = e1z * e2x - e1x * e2z
            nz = e1x * e2y - e1y * e2x
            denom = nx * d_x + ny * d_y + nz * d_z
            parallel = jnp.abs(denom) < 1e-6
            dplane = nx * v0x + ny * v0y + nz * v0z
            t_tri = (dplane - (nx * o_x + ny * o_y + nz * o_z)) / jnp.where(
                parallel, 1.0, denom
            )
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
            # logical blend instead of where: Mosaic can't select i1
            # vectors
            ok = (
                ((is_sph & ok_sph) | ((~is_sph) & ok_tri))
                & in_range
                & valid
            )

            better = ok & (t_k < tmin)
            tmin = jnp.where(better, t_k, tmin)
            pmin = jnp.where(
                better, jnp.float32(kk) + start.astype(jnp.float32), pmin
            )

        outs[0:1, :] = jnp.where(tmin < jnp.inf, tmin, T_NO_LIMIT * 2.0)
        outs[1:2, :] = pmin
        outs[2:3, :] = jnp.where(valid, entries[6:7, :], -1.0)
        outs[3:8, :] = jnp.zeros((5, BLOCK), jnp.float32)
        cp4 = pltpu.make_async_copy(outs, out_hbm.at[b], sem.at[0])
        cp4.start()
        cp4.wait()
        return _

    jax.lax.fori_loop(0, num_blocks[0], body, 0, unroll=False)


# ---------------------------------------------------------------------------
# XLA-side scheduling: tight, block-aligned-per-node regions
# ---------------------------------------------------------------------------


def _schedule_groups(pair_node, pair_count, pair_valid, maxb_out: int):
    """Group (block, child) survivor groups by child node and assign
    tight element offsets within block-aligned per-node regions.

    Returns (pair_offset [PAIRS] int32 element columns (-1 = skip),
    block_node [maxb_out], block_count [maxb_out], num_blocks, dropped).
    """
    PAIRS = pair_node.shape[0]
    live = pair_valid & (pair_count > 0)
    key = jnp.where(live, pair_node, jnp.int32(2**30))
    order = jnp.argsort(key, stable=True)
    snode = key[order]
    scount = jnp.where(live, pair_count, 0)[order]

    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), snode[1:] != snode[:-1]]
    ) & (snode < 2**30)
    seg_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    num_segs = jnp.maximum(seg_id[-1] + 1, 0)
    seg_id_c = jnp.maximum(seg_id, 0)

    csum = jnp.cumsum(scount) - scount
    seg_base_csum = jax.ops.segment_max(
        jnp.where(is_start, csum, -1), seg_id_c, num_segments=PAIRS
    )
    within = csum - seg_base_csum[seg_id_c]

    seg_total = jax.ops.segment_sum(scount, seg_id_c, num_segments=PAIRS)
    seg_live = jnp.arange(PAIRS) < num_segs
    seg_blocks = jnp.where(seg_live, (seg_total + BLOCK - 1) // BLOCK, 0)
    seg_block_base = jnp.cumsum(seg_blocks) - seg_blocks
    total_blocks = seg_block_base[-1] + seg_blocks[-1]

    seg_fits = seg_block_base + seg_blocks <= maxb_out
    dropped = jnp.sum(jnp.where(seg_live & (~seg_fits), seg_total, 0))

    pair_base = seg_block_base[seg_id_c] * BLOCK
    ok = (snode < 2**30) & seg_fits[seg_id_c] & (scount > 0)
    pair_offset_sorted = jnp.where(ok, pair_base + within, -1)
    pair_offset = (
        jnp.full((PAIRS,), -1, jnp.int32)
        .at[order]
        .set(pair_offset_sorted.astype(jnp.int32))
    )

    # block metadata: slot -> segment via searchsorted over bases
    slot = jnp.arange(maxb_out, dtype=jnp.int32)
    gidx = (
        jnp.searchsorted(seg_block_base, slot, side="right") - 1
    ).astype(jnp.int32)
    gidx = jnp.clip(gidx, 0, PAIRS - 1)
    slot_in_seg = slot - seg_block_base[gidx]
    slot_live = (
        (slot < total_blocks)
        & (slot_in_seg < seg_blocks[gidx])
        & seg_fits[gidx]
        & (gidx < num_segs)
    )
    first_sorted_idx = jax.ops.segment_min(
        jnp.where(is_start, jnp.arange(PAIRS), PAIRS - 1),
        seg_id_c,
        num_segments=PAIRS,
    )
    seg_node = snode[jnp.clip(first_sorted_idx, 0, PAIRS - 1)]
    block_node = jnp.where(slot_live, seg_node[gidx], 0).astype(jnp.int32)
    block_count = jnp.where(
        slot_live,
        jnp.clip(seg_total[gidx] - slot_in_seg * BLOCK, 0, BLOCK),
        0,
    ).astype(jnp.int32)
    num_blocks = jnp.minimum(total_blocks, maxb_out).astype(jnp.int32)
    return pair_offset, block_node, block_count, num_blocks, dropped


# ---------------------------------------------------------------------------
# kernel runners
# ---------------------------------------------------------------------------


def _any_spec(n):
    return [pl.BlockSpec(memory_space=pltpu.ANY) for _ in range(n)]


def _run_classify(queue, node_packed, block_node, block_count, num_blocks,
                  maxb: int, width: int):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=_any_spec(2),
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((ROWS, BLOCK), jnp.float32),
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.VMEM((ROWS, BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_classify_kernel, width=width),
        out_shape=jax.ShapeDtypeStruct((maxb, ROWS, BLOCK), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(block_node, block_count, num_blocks.reshape(1), queue, node_packed)


def _run_pack(queue_in, masks, offsets, block_count, num_blocks,
              maxb: int, width: int, cols_out: int):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=_any_spec(2),
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((ROWS, BLOCK), jnp.float32),
            pltpu.VMEM((ROWS, BLOCK), jnp.float32),
            pltpu.VMEM((ROWS, 2 * BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_pack_kernel, width=width),
        out_shape=jax.ShapeDtypeStruct((ROWS, cols_out), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(offsets, block_count, num_blocks.reshape(1), queue_in, masks)


def _run_leaf(queue, node_packed, prim_packed, block_node, block_count,
              num_blocks, maxb: int, width: int, max_leaf: int):
    k8 = ((max_leaf + 7) // 8) * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=_any_spec(3),
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((ROWS, BLOCK), jnp.float32),
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.VMEM((k8, 128), jnp.float32),
            pltpu.VMEM((ROWS, BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_leaf_kernel, width=width, max_leaf=max_leaf),
        out_shape=jax.ShapeDtypeStruct((maxb, ROWS, BLOCK), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(block_node, block_count, num_blocks.reshape(1), queue, node_packed,
      prim_packed)


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
    """Closest-hit traversal via the block-wavefront Pallas pipeline.

    Semantics match ops.traverse.trace_closest except that box-test
    pruning uses the static per-ray ``t_limit`` (shadow maxT) instead of
    the evolving per-ray minT — strictly conservative, never incorrect.
    """
    bvh = scene.bvh
    N = o.shape[0]
    W = bvh.width
    levels = bvh.num_levels
    max_level_nodes = max(len(lv) for lv in bvh.levels)
    #: per-level block capacity: tight payload bound + one partial block
    #: per node; overflows are counted in `dropped`
    maxb_cap = _cdiv(queue_multiplier * N, BLOCK) + max_level_nodes + 2

    ray_f = jnp.arange(N, dtype=jnp.int32).astype(jnp.float32)
    tlim = (
        jnp.full((N,), T_NO_LIMIT, jnp.float32)
        if t_limit is None
        else jnp.minimum(t_limit.astype(jnp.float32), T_NO_LIMIT)
    )
    vmask = valid.astype(jnp.float32)
    payload = jnp.concatenate(
        [
            o.T.astype(jnp.float32),
            (d * vmask[:, None]).T.astype(jnp.float32),
            ray_f[None, :],
            tlim[None, :],
        ],
        axis=0,
    )  # [8, N]

    best_bits = jnp.full((N,), _f2bits(INF), jnp.int32)
    best_prim = jnp.full((N,), -1, jnp.int32)
    dropped = jnp.int32(0)

    # level 0: every ray at the root
    nb0 = _cdiv(N, BLOCK)
    maxb = nb0
    queue = jnp.zeros((ROWS, (maxb + 1) * BLOCK), jnp.float32)
    queue = queue.at[:, :N].set(payload)
    slot0 = jnp.arange(maxb, dtype=jnp.int32)
    block_node = jnp.zeros((maxb,), jnp.int32)
    block_count = jnp.clip(N - slot0 * BLOCK, 0, BLOCK).astype(jnp.int32)
    num_blocks = jnp.int32(nb0)

    for level in range(levels):
        # --- leaf blocks of this level's queue ---
        if bvh.level_leaf[level] > 0:
            leaf_out = _run_leaf(
                queue, bvh.node_packed, scene.prim_packed,
                block_node, block_count, num_blocks,
                maxb, W, bvh.max_leaf,
            )
            blk_live = (
                jnp.arange(maxb, dtype=jnp.int32) < num_blocks
            )[:, None]
            t_flat = jnp.where(blk_live, leaf_out[:, 0, :], INF).reshape(-1)
            p_flat = jnp.where(blk_live, leaf_out[:, 1, :], 0.0).reshape(-1)
            r_flat = jnp.where(blk_live, leaf_out[:, 2, :], -1.0).reshape(-1)
            finite = (t_flat < T_NO_LIMIT) & (r_flat >= 0)
            ray_i = jnp.where(finite, r_flat, 0.0).astype(jnp.int32)
            ray_i = jnp.where(finite, ray_i, N)
            bits = _f2bits(jnp.where(finite, t_flat, INF))
            best_bits = best_bits.at[ray_i].min(bits, mode="drop")
            win = finite & (bits == best_bits[jnp.clip(ray_i, 0, N - 1)])
            tgt = jnp.where(win, ray_i, N)
            best_prim = best_prim.at[tgt].set(
                p_flat.astype(jnp.int32), mode="drop"
            )

        if level == levels - 1 or bvh.level_inner[level] == 0:
            break

        # --- classify + schedule + pack into the next level's queue ---
        masks = _run_classify(
            queue, bvh.node_packed, block_node, block_count, num_blocks,
            maxb, W,
        )
        blk_live = jnp.arange(maxb, dtype=jnp.int32) < num_blocks
        counts = jnp.where(
            blk_live[:, None],
            masks[:, W : 2 * W, 0].astype(jnp.int32),
            0,
        )
        node_of_block = jnp.clip(block_node, 0, bvh.outlets.shape[0] - 1)
        cnode = bvh.outlets[node_of_block]  # [maxb, W]
        cnode_c = jnp.clip(cnode, 0, bvh.outlets.shape[0] - 1)
        pair_valid = (blk_live[:, None] & (cnode >= 0)).reshape(-1)
        pair_node = cnode_c.reshape(-1)
        pair_count = counts.reshape(-1)

        maxb_next = min(maxb * W, maxb_cap)
        offsets, nblock_node, nblock_count, nnum_blocks, drop = (
            _schedule_groups(pair_node, pair_count, pair_valid, maxb_next)
        )
        dropped = dropped + drop
        queue = _run_pack(
            queue, masks, offsets, block_count, num_blocks,
            maxb, W, (maxb_next + 1) * BLOCK,
        )
        block_node, block_count, num_blocks = (
            nblock_node, nblock_count, nnum_blocks
        )
        maxb = maxb_next

    return WaveTraceResult(
        t=jnp.where(best_prim >= 0, _bits2f(best_bits), INF),
        prim=best_prim,
        dropped=dropped,
    )

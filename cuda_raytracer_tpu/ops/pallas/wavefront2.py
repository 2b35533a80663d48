"""Fused segment-major wavefront BVH traversal (Pallas TPU kernels, v2).

Second-generation realization of the reference's wavefront design
(README.md:8-21; rayIntersectSingle, src/cudaRenderer.cu:846-1297).
Same structural idea as v1 — per-level queues laid out as per-node
*segments* so node/triangle data is loaded once per group — but every
measured v1 bottleneck is redesigned out:

* **Compaction**: v1 permuted survivors with 1024x1024 one-hot matmuls
  (~10 us of MXU weight-loads per chunk-child).  v2 routes lanes
  through a 10-stage monotone shift network built from static lane
  rolls (the TPU analog of a shared-memory scan + scatter,
  src/exclusiveScan.cu_inl:73-110): compaction shifts are
  non-decreasing, so staged power-of-two left rotations route every
  survivor collision-free.  ~0.1 us per chunk-child on the VPU.

* **Queue writes**: v1 read-modify-wrote element-granular windows (9x
  write amplification).  v2 gives every (segment, child) an exclusive
  CHUNK-aligned output region (exact reference analog: wOffset
  regions, src/cudaRenderer.cu:1384-1430), staged through per-child
  VMEM tails flushed as full [8, CHUNK] blocks.  No RMW anywhere.

* **Leaf intersection**: fused into the pack pass.  Leaf children are
  intersected against the parent segment's resident chunk (triangles
  staged [K, 128] in VMEM, prims vectorized over sublanes x rays over
  lanes), so leaf entries never round-trip through HBM at all.

* **Evolving best-t pruning** (reference minT gating,
  src/cudaRenderer.cu:978-1003): each queue entry carries its
  lineage's best hit so far (payload row 7).  Leaf hits tighten it in
  deterministic child order; child boxes whose entry t exceeds it are
  pruned.  Exactness: a pruned box satisfies tnear > t_ub >= some
  already-logged hit t, so it cannot contain the global winner.
  Shadow rays additionally early-terminate once any hit lands short of
  the light (the occlusion answer is already decided).

* **Hit logging**: only *improving* hits (t below the carried bound)
  are appended — per chunk at most one per lane, pre-merged across
  leaf children — then one deterministic scatter-min resolves rays at
  the end (replacing kernelMergeIntersections' 16-token scan,
  src/cudaRenderer.cu:515-540).

Queue payload layout: [8, cols] float32 — rows 0-2 ray origin, 3-5 ray
direction, 6 ray id (an int32 bit pattern biased by 2^30 and bitcast
to f32 — lands in [2.0, 4.0), so it can never be flushed as a denormal
and survives every select/roll/DMA untouched; ids up to 2^30 are
representable, lifting the old exact-f32-integer 2^24 ceiling that
capped 800x600 at 32 spp/frame, VERDICT r3 weak 4), 7 carried upper
bound t_ub (min of shadow maxT and lineage best hit; -1 marks a
terminated shadow entry).  Hit log: [4, cols] rows t / prim / ray /
unused.
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
from ..intersect import packed_prim_test as _packed_test

INF = jnp.float32(jnp.inf)
#: finite "no t limit" sentinel for the payload (must not be inf)
T_NO_LIMIT = 1e30
#: lanes processed per chunk; also the queue-region allocation granule
CHUNK = 1024
#: payload rows
ROWS = 8
#: hit-log rows (t, prim, ray, pad)
LROWS = 4


def _f2bits(t):
    return jax.lax.bitcast_convert_type(t, jnp.int32)


def _bits2f(b):
    return jax.lax.bitcast_convert_type(b, jnp.float32)


#: ray ids ride payload row 6 as raw int32 bit patterns biased into
#: the float [2.0, 4.0) bucket (see module docstring); 2^30 ids >> any
#: realizable wavefront (a 4096x4096 frame at 64 spp is 2^30).
RID_BIAS = 1 << 30


def rid_encode(ids):
    return jax.lax.bitcast_convert_type(
        ids.astype(jnp.int32) | RID_BIAS, jnp.float32
    )


def rid_decode(f):
    return jax.lax.bitcast_convert_type(f, jnp.int32) & (RID_BIAS - 1)


def _cdiv(a, b):
    return -(-a // b)


def _bucket(n: int) -> int:
    """Next power of two >= n (kernel-shape bucketing: one Mosaic
    compile per bucket, not per level)."""
    p = 1
    while p < n:
        p *= 2
    return p


# ---------------------------------------------------------------------------
# in-kernel lane compaction (monotone shift network)
# ---------------------------------------------------------------------------


def _cumsum_lanes(m, width):
    """Inclusive cumsum of [1, C] int32 along lanes via log-shift adds
    (jnp.cumsum has no Mosaic lowering)."""
    x = m
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < width:
        sh = pltpu.roll(x, s, axis=1)
        x = x + jnp.where(lane >= s, sh, 0)
        s *= 2
    return x


def _compact_lanes(data, mask):
    """Stable-compact the masked lanes of data [R, C] to the front.

    Compaction shifts (lane - rank) are non-decreasing over live lanes,
    so routing one shift bit per stage (LSB first) is collision-free.
    Returns (routed data — lanes >= n are garbage, caller masks by n —
    and the live count n).
    """
    C = data.shape[1]
    m = mask.astype(jnp.int32)
    rank = _cumsum_lanes(m, C) - m
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    rem = jnp.where(mask, lane - rank, C)  # C = dead marker (no bits < C)
    s = 1
    while s < C:
        data_in = pltpu.roll(data, C - s, axis=1)  # left roll by s
        rem_in = pltpu.roll(rem, C - s, axis=1)
        take = (rem_in & s) != 0
        keep = (rem & s) == 0
        data = jnp.where(take, data_in, data)
        rem = jnp.where(take, rem_in - s, jnp.where(keep, rem, C))
        s *= 2
    return data, jnp.sum(m)


def _append_tail(tail_ref, data, mask, tcnt):
    """Compact the masked lanes of data [R, C] and append them to the
    VMEM tail [R, 2C] at element offset tcnt; zeroes everything beyond.
    Returns the survivor count."""
    C = data.shape[1]
    comp, n = _compact_lanes(data, mask)
    padded = jnp.concatenate([comp, jnp.zeros_like(comp)], axis=1)
    rolled = pltpu.roll(padded, tcnt, axis=1)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * C), 1)
    sel = (lane2 >= tcnt) & (lane2 < tcnt + n)
    tail_ref[...] = jnp.where(
        sel, rolled, jnp.where(lane2 < tcnt, tail_ref[...], 0.0)
    )
    return n


# ---------------------------------------------------------------------------
# shared box-test (identical code in count and pack => identical masks)
# ---------------------------------------------------------------------------


def _box_terms(box, o_x, o_y, o_z, inv_x, inv_y, inv_z, bf16=False):
    """Slab test terms for one child box against a chunk of rays.
    Semantics of intersectBBox (src/cudaRenderer.cu:154-207): entry t
    gated later by the carried bound; origin-inside always enters.

    ``bf16=True`` does the multiplies in bfloat16 (2x VPU throughput on
    the dominant per-visit arithmetic) with conservative widening, the
    same recipe as packet_dfs's slab_bf16: differences in f32 first (no
    cancellation blowup), then a relative margin + absolute pad shrinks
    tnear / grows tfar, so the mask only gains false POSITIVES — extra
    queue pushes, never a lost hit; leaf prim tests stay exact f32."""
    mnx, mny, mnz, mxx, mxy, mxz = box
    if bf16:
        bf = jnp.bfloat16
        ib_x, ib_y, ib_z = (
            inv_x.astype(bf), inv_y.astype(bf), inv_z.astype(bf)
        )
        t0x = (mnx - o_x).astype(bf) * ib_x
        t1x = (mxx - o_x).astype(bf) * ib_x
        t0y = (mny - o_y).astype(bf) * ib_y
        t1y = (mxy - o_y).astype(bf) * ib_y
        t0z = (mnz - o_z).astype(bf) * ib_z
        t1z = (mxz - o_z).astype(bf) * ib_z
        tn_b = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tf_b = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        # margin arithmetic + every compare promote to f32: Mosaic on
        # v5e has no bf16 vector compare (arith.cmpf on bf16 fails to
        # lower); only the 6 multiplies stay bf16
        eps = jnp.float32(0.02)  # >= a few 2^-8 relative roundings
        pad = jnp.float32(1e-3)  # absolute floor for |t| ~ 0
        tn_f = tn_b.astype(jnp.float32)
        tf_f = tf_b.astype(jnp.float32)
        tnear = tn_f - jnp.abs(tn_f) * eps - pad
        tfar = tf_f + jnp.abs(tf_f) * eps + pad
        inside = (
            (o_x >= mnx)
            & (o_x <= mxx)
            & (o_y >= mny)
            & (o_y <= mxy)
            & (o_z >= mnz)
            & (o_z <= mxz)
        )
        slab_ok = (tnear <= tfar) & (tfar >= 0.0)
        return slab_ok, tnear, inside
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
    slab_ok = (tnear <= tfar) & (tfar >= 0.0)
    return slab_ok, tnear, inside


# ---------------------------------------------------------------------------
# kernel 1: count — per-(segment, inner-child) survivor counts
# ---------------------------------------------------------------------------


def _count_kernel(
    # scalar prefetch
    seg_node,
    seg_base,  # [Sp] CHUNK units
    seg_count,
    cmask,  # [Sp*W] 1 = count this child (valid inner)
    nsegs,  # [1]
    # inputs
    queue,
    node_packed,
    # output
    counts_ref,  # [Sp, 128] f32 VMEM
    # scratch
    ebuf,
    nrow,
    sem,
    *,
    width: int,
    box_bf16: bool,
):
    C = CHUNK
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    counts_ref[...] = jnp.zeros_like(counts_ref)

    def seg_body(s, carry):
        cnt = seg_count[s]

        @pl.when(cnt > 0)
        def _():
            node = seg_node[s]
            base_col = seg_base[s] * C
            nchunks = (cnt + C - 1) // C
            ndma = pltpu.make_async_copy(
                node_packed.at[pl.ds(node, 1), :], nrow, sem.at[2]
            )
            ndma.start()

            def start_chunk(c, slot):
                pltpu.make_async_copy(
                    queue.at[:, pl.ds(base_col + c * C, C)],
                    ebuf.at[slot],
                    sem.at[slot],
                ).start()

            start_chunk(0, 0)
            ndma.wait()
            boxes = []
            for w in range(width):
                boxes.append((
                    nrow[0, 3 * w + 0], nrow[0, 3 * w + 1],
                    nrow[0, 3 * w + 2],
                    nrow[0, 3 * width + 3 * w + 0],
                    nrow[0, 3 * width + 3 * w + 1],
                    nrow[0, 3 * width + 3 * w + 2],
                ))
            outlets = [nrow[0, 6 * width + w] for w in range(width)]

            def chunk_body(c, accs):
                slot = jax.lax.rem(c, 2)

                @pl.when(c + 1 < nchunks)
                def _():
                    start_chunk(c + 1, jax.lax.rem(c + 1, 2))

                pltpu.make_async_copy(
                    queue.at[:, pl.ds(base_col + c * C, C)],
                    ebuf.at[slot],
                    sem.at[slot],
                ).wait()
                e = ebuf.at[slot]
                o_x, o_y, o_z = e[0:1, :], e[1:2, :], e[2:3, :]
                d_x, d_y, d_z = e[3:4, :], e[4:5, :], e[5:6, :]
                tub = e[7:8, :]
                validl = (lane + c * C) < cnt
                inv_x, inv_y, inv_z = 1.0 / d_x, 1.0 / d_y, 1.0 / d_z
                new_accs = []
                for w in range(width):
                    slab_ok, tnear, inside = _box_terms(
                        boxes[w], o_x, o_y, o_z, inv_x, inv_y, inv_z,
                        bf16=box_bf16,
                    )
                    m = (
                        ((slab_ok & (tnear <= tub)) | inside)
                        & (tub >= 0.0)
                        & validl
                        & (outlets[w] >= 0.0)
                    )
                    counted = cmask[s * width + w] > 0
                    new_accs.append(
                        accs[w]
                        + jnp.where(counted, jnp.sum(m.astype(jnp.float32)),
                                    0.0)
                    )
                return tuple(new_accs)

            accs = jax.lax.fori_loop(
                0, nchunks, chunk_body,
                tuple(jnp.float32(0.0) for _ in range(width)),
            )
            row = jnp.zeros((1, 128), jnp.float32)
            for w in range(width):
                row = jnp.where(lane128 == w, accs[w], row)
            counts_ref[pl.ds(s, 1), :] = row

        return carry

    jax.lax.fori_loop(0, nsegs[0], seg_body, 0, unroll=False)


# ---------------------------------------------------------------------------
# kernel 2: pack — leaf intersection + survivor routing, fused
# ---------------------------------------------------------------------------


def _pack_kernel(
    # scalar prefetch
    seg_node,
    seg_base,
    seg_count,
    cdest,  # [Sp*W] CHUNK-unit region base in queue_out, -1 = skip
    ckind,  # [Sp*W] 0 none / 1 inner / 2 leaf
    clstart,
    clcnt,
    cforce,
    cgc,  # [Sp*W] fused next-level counting: 0 = off, else
    #       (1 << 8) | grandchild-counted bitmask (bit w' set when the
    #       next level's count mask has child w' of this child's node)
    cursor_in,  # [1] element cursor into the hit log
    nsegs,
    ctab,  # [capR] chunk table: logical read chunk -> physical chunk of
    #       queue_in (identity at level 0; dyn_alloc levels get the
    #       previous pack's tag-sorted allocation order)
    cpair,  # [Sp*W] next-level segment index of inner child w (-1 =
    #        not inner) — the tag written per allocated chunk
    # inputs
    queue_in,
    node_packed,
    prim_packed,
    log_in,  # aliased to log_out
    # outputs
    queue_out,
    log_out,
    cur_out,  # [1, 2] i32 SMEM: cursor, dropped
    gc_ref,  # [Sp, 128] f32: lane w*W+w' = appended entries of child w
    #         entering grandchild w' — the next level's count matrix,
    #         computed while the entries are still in VMEM (replaces a
    #         full count-kernel HBM sweep per level)
    app_ref,  # [Sp, 128] f32 (dyn_alloc): lane w = entries actually
    #          written for inner child w — the next level's segment
    #          count, produced as a by-product of routing (kills the
    #          standalone count kernel's HBM sweep)
    tags_ref,  # [1, capT] f32 (dyn_alloc): next-segment id per
    #           physical chunk of queue_out allocated by the bump
    #           cursor; 1e9 = unallocated.  A stable argsort of this
    #           row is the next level's read chunk table.
    # scratch
    ebuf,
    nrow,
    crow,  # [W, 1, 128] child node rows for grandchild box tests
    pbuf,  # [W, K8, 128]
    tails,  # [W, 8, 2C]
    ltail,  # [4, 2C]
    fbuf,  # [W, 8, C]
    lfbuf,  # [4, C]
    tubbuf,  # [1, C]
    prunbuf,  # [1, C]
    qsem,
    nsem,
    csem,
    psem,
    fsem,
    lfsem,
    lpsem,
    *,
    width: int,
    k8: int,
    do_kill: bool,
    kill_eps: float,
    logcap: int,
    box_bf16: bool,
    fused_gc: bool,
    dyn_alloc: bool,
):
    C = CHUNK
    W = width
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    krow = jax.lax.broadcasted_iota(jnp.int32, (k8, 1), 0)
    gc_ref[...] = jnp.zeros_like(gc_ref)
    app_ref[...] = jnp.zeros_like(app_ref)
    tags_ref[...] = jnp.full(tags_ref.shape, 1e9, jnp.float32)
    capW = queue_out.shape[1] // C  # bump-cursor allocation capacity
    laneT = jax.lax.broadcasted_iota(jnp.int32, tags_ref.shape, 1)

    # -- log tail resume: preload the partial chunk at the cursor --
    # All queue/log offsets are carried in CHUNK units and multiplied by
    # C at the use site so Mosaic can prove lane-tile divisibility of
    # every dynamic HBM slice.
    cur0 = cursor_in[0]
    log_chunk0 = cur0 // C
    ltcnt0 = cur0 - log_chunk0 * C
    lp = pltpu.make_async_copy(
        log_in.at[:, pl.ds(log_chunk0 * C, C)], ltail.at[:, 0:C], lpsem
    )
    lp.start()
    lp.wait()

    def seg_body(s, carry):
        (ltcnt, log_chunk, ldrop, lfchunk) = carry[0:4]
        fchunks = carry[4:4 + W]
        cnt = seg_count[s]

        def process(carry):
            (ltcnt, log_chunk, ldrop, lfchunk) = carry[0:4]
            fchunks = list(carry[4:4 + W])
            gcur = carry[4 + W]
            node = seg_node[s]
            base_col = seg_base[s] * C
            nchunks = (cnt + C - 1) // C

            def in_col(c):
                # dyn_alloc levels read through the chunk table (the
                # previous level wrote this segment's chunks at bump-
                # allocated physical positions); legacy regions are
                # contiguous at seg_base
                if dyn_alloc:
                    return ctab[seg_base[s] + c] * C
                return base_col + c * C

            ndma = pltpu.make_async_copy(
                node_packed.at[pl.ds(node, 1), :], nrow, nsem
            )
            ndma.start()

            def start_chunk(c, slot):
                pltpu.make_async_copy(
                    queue_in.at[:, pl.ds(in_col(c), C)],
                    ebuf.at[slot],
                    qsem.at[slot],
                ).start()

            start_chunk(0, 0)
            # stage leaf-child primitive rows (overlaps the chunk loop)
            for w in range(W):
                @pl.when(ckind[s * W + w] == 2)
                def _(w=w):
                    pltpu.make_async_copy(
                        prim_packed.at[pl.ds(clstart[s * W + w], k8), :],
                        pbuf.at[w],
                        psem.at[w],
                    ).start()
            ndma.wait()
            boxes = []
            for w in range(W):
                boxes.append((
                    nrow[0, 3 * w + 0], nrow[0, 3 * w + 1],
                    nrow[0, 3 * w + 2],
                    nrow[0, 3 * W + 3 * w + 0],
                    nrow[0, 3 * W + 3 * w + 1],
                    nrow[0, 3 * W + 3 * w + 2],
                ))
            outlets = [nrow[0, 6 * W + w] for w in range(W)]
            # fused next-level counting: fetch each inner child's node
            # row once per segment (the grandchild boxes), latency
            # overlapped across the W starts
            if fused_gc:
                for w in range(W):
                    @pl.when(cgc[s * W + w] > 0)
                    def _(w=w):
                        child = jnp.maximum(
                            outlets[w].astype(jnp.int32), 0
                        )
                        pltpu.make_async_copy(
                            node_packed.at[pl.ds(child, 1), :],
                            crow.at[w], csem.at[w],
                        ).start()
                for w in range(W):
                    @pl.when(cgc[s * W + w] > 0)
                    def _(w=w):
                        child = jnp.maximum(
                            outlets[w].astype(jnp.int32), 0
                        )
                        pltpu.make_async_copy(
                            node_packed.at[pl.ds(child, 1), :],
                            crow.at[w], csem.at[w],
                        ).wait()

            def chunk_body(c, ch):
                (ltcnt, log_chunk, ldrop, lfchunk) = ch[0:4]
                fchunks = list(ch[4:4 + W])
                gcacc = ch[4 + W]
                tcs = list(ch[5 + W:5 + 2 * W])
                fls = list(ch[5 + 2 * W:5 + 3 * W])
                gcur = ch[5 + 3 * W]
                dead = ch[6 + 3 * W]
                napp = list(ch[7 + 3 * W:7 + 4 * W])
                slot = jax.lax.rem(c, 2)

                @pl.when(c + 1 < nchunks)
                def _():
                    start_chunk(c + 1, jax.lax.rem(c + 1, 2))

                pltpu.make_async_copy(
                    queue_in.at[:, pl.ds(in_col(c), C)],
                    ebuf.at[slot],
                    qsem.at[slot],
                ).wait()
                e = ebuf.at[slot]
                o_x, o_y, o_z = e[0:1, :], e[1:2, :], e[2:3, :]
                d_x, d_y, d_z = e[3:4, :], e[4:5, :], e[5:6, :]
                rayid = e[6:7, :]
                tub0 = e[7:8, :]
                validl = (lane + c * C) < cnt
                inv_x, inv_y, inv_z = 1.0 / d_x, 1.0 / d_y, 1.0 / d_z

                tubbuf[...] = tub0
                prunbuf[...] = jnp.full((1, C), -1.0, jnp.float32)

                # ---- leaf children first: tighten the carried bound in
                # deterministic child order ----
                cache = []
                for w in range(W):
                    slab_ok, tnear, inside = _box_terms(
                        boxes[w], o_x, o_y, o_z, inv_x, inv_y, inv_z,
                        bf16=box_bf16,
                    )
                    cache.append((slab_ok, tnear, inside))
                    kind_w = ckind[s * W + w]

                    @pl.when(kind_w == 2)
                    def _(w=w, slab_ok=slab_ok, tnear=tnear, inside=inside):
                        @pl.when(c == 0)
                        def _():
                            pltpu.make_async_copy(
                                prim_packed.at[
                                    pl.ds(clstart[s * W + w], k8), :
                                ],
                                pbuf.at[w],
                                psem.at[w],
                            ).wait()

                        tub_cur = tubbuf[0:1, :]
                        forced = cforce[s * W + w] > 0
                        m = (
                            (
                                ((slab_ok & (tnear <= tub_cur))
                                 | inside)
                                & (outlets[w] >= 0.0)
                            )
                            | forced
                        ) & (tub_cur >= 0.0) & validl

                        @pl.when(jnp.sum(m.astype(jnp.int32)) > 0)
                        def _():
                            pb = pbuf.at[w]
                            # the shared precomputed-table test
                            # (ops/intersect.packed_prim_test over
                            # prim_packed cols 10:22) — identical op
                            # order to the XLA oracle and packet-DFS
                            # (VERDICT r4 task 1)
                            okp, t_k = _packed_test(
                                o_x, o_y, o_z, d_x, d_y, d_z,
                                pb[:, 10:11], pb[:, 11:12],
                                pb[:, 12:13], pb[:, 13:14],
                                pb[:, 14:15], pb[:, 15:16],
                                pb[:, 16:17], pb[:, 17:18],
                                pb[:, 18:19], pb[:, 19:20],
                                pb[:, 20:21], pb[:, 21:22],
                                pb[:, 9:10],
                            )
                            okm = (
                                okp
                                & (krow < clcnt[s * W + w])
                                & m
                            )
                            t_mat = jnp.where(okm, t_k, jnp.float32(jnp.inf))
                            tbest = jnp.min(t_mat, axis=0, keepdims=True)
                            kmin = jnp.argmin(
                                t_mat, axis=0, keepdims=True
                            ).astype(jnp.float32)
                            prim = (
                                jnp.float32(clstart[s * W + w]) + kmin
                            )
                            better = tbest < tubbuf[0:1, :]
                            prunbuf[...] = jnp.where(
                                better, prim, prunbuf[...]
                            )
                            tubbuf[...] = jnp.where(
                                better, tbest, tubbuf[...]
                            )

                # ---- hit-log append (improving hits only) ----
                p_run = prunbuf[0:1, :]
                t_run = tubbuf[0:1, :]
                logm = (p_run >= 0.0) & validl
                nlog = jnp.sum(logm.astype(jnp.int32))
                can_log = (log_chunk * C + ltcnt + nlog) <= logcap
                ldrop = ldrop + jnp.where(can_log, 0, nlog)

                @pl.when((nlog > 0) & can_log)
                def _():
                    data4 = jnp.concatenate(
                        [t_run, p_run, rayid,
                         jnp.zeros((1, C), jnp.float32)],
                        axis=0,
                    )
                    _append_tail(ltail, data4, logm, ltcnt)

                ltcnt = jnp.where(can_log, ltcnt + nlog, ltcnt)
                flush_log = ltcnt >= C

                @pl.when(flush_log)
                def _():
                    @pl.when(lfchunk >= 0)
                    def _():
                        pltpu.make_async_copy(
                            lfbuf, log_out.at[:, pl.ds(lfchunk * C, C)],
                            lfsem,
                        ).wait()

                    lfbuf[...] = ltail[:, 0:C]
                    pltpu.make_async_copy(
                        lfbuf, log_out.at[:, pl.ds(log_chunk * C, C)], lfsem
                    ).start()
                    ltail[...] = pltpu.roll(ltail[...], C, axis=1)

                lfchunk = jnp.where(flush_log, log_chunk, lfchunk)
                log_chunk = log_chunk + jnp.where(flush_log, 1, 0)
                ltcnt = ltcnt - jnp.where(flush_log, C, 0)

                # shadow early-termination: the occlusion answer is
                # decided once a hit lands clearly short of the light
                if do_kill:
                    killed = (p_run >= 0.0) & (
                        t_run < tub0 - jnp.float32(kill_eps)
                    )
                    tub_out = jnp.where(killed, -1.0, t_run)
                else:
                    tub_out = t_run

                # ---- inner children: compact + route ----
                for w in range(W):
                    slab_ok, tnear, inside = cache[w]
                    kind_w = ckind[s * W + w]
                    dest_w = cdest[s * W + w]
                    m_in = (
                        ((slab_ok & (tnear <= tub0)) | inside)
                        & (tub0 >= 0.0)
                        & validl
                        & (outlets[w] >= 0.0)
                        & (kind_w == 1)
                    )
                    n_w = jnp.sum(m_in.astype(jnp.int32))
                    if dyn_alloc:
                        alive_w = ((dead >> w) & 1) == 0
                        napp[w] = napp[w] + n_w
                        active = alive_w & (n_w > 0)
                    else:
                        active = (dest_w >= 0) & (n_w > 0)

                    # ---- fused next-level counting: while the entries
                    # bound for child w are in registers, test them
                    # against the child's own child boxes — exactly the
                    # mask the count kernel would compute at the next
                    # level (same _box_terms arithmetic on the same
                    # stored o/d/tub values), minus its full HBM sweep
                    if fused_gc:
                        gflag = cgc[s * W + w]
                        gc_on = (gflag > 0) & (dest_w >= 0)
                        for w2 in range(W):
                            gbox = (
                                crow[w, 0, 3 * w2 + 0],
                                crow[w, 0, 3 * w2 + 1],
                                crow[w, 0, 3 * w2 + 2],
                                crow[w, 0, 3 * W + 3 * w2 + 0],
                                crow[w, 0, 3 * W + 3 * w2 + 1],
                                crow[w, 0, 3 * W + 3 * w2 + 2],
                            )
                            slab_g, tn_g, ins_g = _box_terms(
                                gbox, o_x, o_y, o_z,
                                inv_x, inv_y, inv_z,
                                bf16=box_bf16,
                            )
                            goutlet = crow[w, 0, 6 * W + w2]
                            m_gc = (
                                ((slab_g & (tn_g <= tub_out)) | ins_g)
                                & (tub_out >= 0.0)
                                & m_in
                                & (goutlet >= 0.0)
                            )
                            counted = ((gflag >> w2) & 1) > 0
                            add = jnp.where(
                                gc_on & counted,
                                jnp.sum(m_gc.astype(jnp.float32)),
                                0.0,
                            )
                            gcacc = jnp.where(
                                lane128 == w * W + w2, gcacc + add,
                                gcacc
                            )

                    @pl.when(active)
                    def _(w=w, m_in=m_in, tub_out=tub_out):
                        rowid = jax.lax.broadcasted_iota(
                            jnp.int32, (ROWS, 1), 0
                        )
                        payload = jnp.where(
                            rowid == 7,
                            jnp.broadcast_to(tub_out, (ROWS, C)),
                            e[0:ROWS, :],
                        )
                        _append_tail(tails.at[w], payload, m_in, tcs[w])

                    if dyn_alloc:
                        tc = jnp.where(active, tcs[w] + n_w, tcs[w])
                        flush_w = tc >= C
                        ok_w = gcur < capW
                        do_flush = flush_w & ok_w
                        died = flush_w & (~ok_w)

                        @pl.when(do_flush)
                        def _(w=w, gcur=gcur):
                            @pl.when(fchunks[w] >= 0)
                            def _():
                                pltpu.make_async_copy(
                                    fbuf.at[w],
                                    queue_out.at[
                                        :, pl.ds(fchunks[w] * C, C)
                                    ],
                                    fsem.at[w],
                                ).wait()

                            fbuf[w, ...] = tails[w, :, 0:C]
                            pltpu.make_async_copy(
                                fbuf.at[w],
                                queue_out.at[:, pl.ds(gcur * C, C)],
                                fsem.at[w],
                            ).start()
                            tags_ref[...] = jnp.where(
                                laneT == gcur,
                                cpair[s * W + w].astype(jnp.float32),
                                tags_ref[...],
                            )
                            tails[w, ...] = pltpu.roll(
                                tails[w, ...], C, axis=1
                            )

                        fchunks[w] = jnp.where(do_flush, gcur, fchunks[w])
                        fls[w] = fls[w] + jnp.where(do_flush, 1, 0)
                        gcur = gcur + jnp.where(do_flush, 1, 0)
                        dead = dead | jnp.where(died, 1 << w, 0)
                        # on a failed allocation, drop the tail and stop
                        # appending for this child (sticky; a chain with
                        # a hole would misalign the next level's counts)
                        tcs[w] = jnp.where(
                            do_flush, tc - C, jnp.where(died, 0, tc)
                        )
                    else:
                        tc = jnp.where(dest_w >= 0, tcs[w] + n_w, tcs[w])
                        flush_w = tc >= C

                        @pl.when(flush_w)
                        def _(w=w, dest_w=dest_w):
                            @pl.when(fchunks[w] >= 0)
                            def _():
                                pltpu.make_async_copy(
                                    fbuf.at[w],
                                    queue_out.at[
                                        :, pl.ds(fchunks[w] * C, C)
                                    ],
                                    fsem.at[w],
                                ).wait()

                            fbuf[w, ...] = tails[w, :, 0:C]
                            pltpu.make_async_copy(
                                fbuf.at[w],
                                queue_out.at[
                                    :, pl.ds((dest_w + fls[w]) * C, C)
                                ],
                                fsem.at[w],
                            ).start()
                            tails[w, ...] = pltpu.roll(
                                tails[w, ...], C, axis=1
                            )

                        fchunks[w] = jnp.where(
                            flush_w, dest_w + fls[w], fchunks[w]
                        )
                        fls[w] = fls[w] + jnp.where(flush_w, 1, 0)
                        tcs[w] = tc - jnp.where(flush_w, C, 0)

                return (ltcnt, log_chunk, ldrop, lfchunk, *fchunks,
                        gcacc, *tcs, *fls, gcur, dead, *napp)

            ch0 = (
                ltcnt, log_chunk, ldrop, lfchunk, *fchunks,
                jnp.zeros((1, 128), jnp.float32),  # gc accumulator
                *([jnp.int32(0)] * W),  # tail counts
                *([jnp.int32(0)] * W),  # flushed chunks
                gcur,  # dyn_alloc bump cursor
                jnp.int32(0),  # dyn_alloc dead-child bitmask
                *([jnp.int32(0)] * W),  # dyn_alloc attempted appends
            )
            ch = jax.lax.fori_loop(0, nchunks, chunk_body, ch0)
            (ltcnt, log_chunk, ldrop, lfchunk) = ch[0:4]
            fchunks = list(ch[4:4 + W])
            gc_ref[pl.ds(s, 1), :] = ch[4 + W]
            tcs = list(ch[5 + W:5 + 2 * W])
            fls = list(ch[5 + 2 * W:5 + 3 * W])
            gcur = ch[5 + 3 * W]
            dead = ch[6 + 3 * W]
            napp = list(ch[7 + 3 * W:7 + 4 * W])

            # final partial flush per child (full-CHUNK write; regions
            # are CHUNK-granular so this never crosses into a neighbor)
            if dyn_alloc:
                app_row = jnp.zeros((1, 128), jnp.float32)
                seg_drop = jnp.int32(0)
                for w in range(W):
                    alive_w = ((dead >> w) & 1) == 0
                    final_w = (tcs[w] > 0) & alive_w & (gcur < capW)

                    @pl.when(final_w)
                    def _(w=w, gcur=gcur):
                        @pl.when(fchunks[w] >= 0)
                        def _():
                            pltpu.make_async_copy(
                                fbuf.at[w],
                                queue_out.at[:, pl.ds(fchunks[w] * C, C)],
                                fsem.at[w],
                            ).wait()

                        fbuf[w, ...] = tails[w, :, 0:C]
                        pltpu.make_async_copy(
                            fbuf.at[w],
                            queue_out.at[:, pl.ds(gcur * C, C)],
                            fsem.at[w],
                        ).start()
                        tags_ref[...] = jnp.where(
                            laneT == gcur,
                            cpair[s * W + w].astype(jnp.float32),
                            tags_ref[...],
                        )

                    fchunks[w] = jnp.where(final_w, gcur, fchunks[w])
                    gcur = gcur + jnp.where(final_w, 1, 0)
                    written = fls[w] * C + jnp.where(final_w, tcs[w], 0)
                    app_row = jnp.where(
                        lane128 == w, written.astype(jnp.float32), app_row
                    )
                    seg_drop = seg_drop + (napp[w] - written)
                app_ref[pl.ds(s, 1), :] = app_row
                ldrop = ldrop + seg_drop
            else:
                for w in range(W):
                    dest_w = cdest[s * W + w]
                    final_w = tcs[w] > 0

                    @pl.when(final_w)
                    def _(w=w, dest_w=dest_w):
                        @pl.when(fchunks[w] >= 0)
                        def _():
                            pltpu.make_async_copy(
                                fbuf.at[w],
                                queue_out.at[:, pl.ds(fchunks[w] * C, C)],
                                fsem.at[w],
                            ).wait()

                        fbuf[w, ...] = tails[w, :, 0:C]
                        pltpu.make_async_copy(
                            fbuf.at[w],
                            queue_out.at[
                                :, pl.ds((dest_w + fls[w]) * C, C)
                            ],
                            fsem.at[w],
                        ).start()

                    fchunks[w] = jnp.where(
                        final_w, dest_w + fls[w], fchunks[w]
                    )

            return (ltcnt, log_chunk, ldrop, lfchunk, *fchunks, gcur)

        return jax.lax.cond(cnt > 0, process, lambda c: c, carry)

    carry0 = (
        ltcnt0, log_chunk0, jnp.int32(0), jnp.int32(-1),
        *([jnp.int32(-1)] * W),
        jnp.int32(0),  # dyn_alloc global chunk cursor
    )
    carry = jax.lax.fori_loop(0, nsegs[0], seg_body, carry0, unroll=False)
    (ltcnt, log_chunk, ldrop, lfchunk) = carry[0:4]
    fchunks = carry[4:4 + W]

    # flush the log remainder and drain every outstanding DMA
    @pl.when(ltcnt > 0)
    def _():
        @pl.when(lfchunk >= 0)
        def _():
            pltpu.make_async_copy(
                lfbuf, log_out.at[:, pl.ds(lfchunk * C, C)], lfsem
            ).wait()

        lfbuf[...] = ltail[:, 0:C]
        pltpu.make_async_copy(
            lfbuf, log_out.at[:, pl.ds(log_chunk * C, C)], lfsem
        ).start()
        pltpu.make_async_copy(
            lfbuf, log_out.at[:, pl.ds(log_chunk * C, C)], lfsem
        ).wait()

    @pl.when((ltcnt == 0) & (lfchunk >= 0))
    def _():
        pltpu.make_async_copy(
            lfbuf, log_out.at[:, pl.ds(lfchunk * C, C)], lfsem
        ).wait()

    for w in range(W):
        @pl.when(fchunks[w] >= 0)
        def _(w=w):
            pltpu.make_async_copy(
                fbuf.at[w],
                queue_out.at[:, pl.ds(fchunks[w] * C, C)],
                fsem.at[w],
            ).wait()

    cur_out[0, 0] = log_chunk * C + ltcnt
    cur_out[0, 1] = ldrop


# ---------------------------------------------------------------------------
# kernel runners
# ---------------------------------------------------------------------------

_HBM = functools.partial(pl.BlockSpec, memory_space=pltpu.MemorySpace.HBM)
_ANY = functools.partial(pl.BlockSpec, memory_space=pltpu.ANY)
_VMEM = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
_SMEM = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)

_INTERPRET = False  # flipped by tests for CPU runs


def _run_count(queue, node_packed, seg_node, seg_base, seg_count, cmask,
               nsegs, width: int, box_bf16: bool = False):
    Sp = seg_node.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(1,),
        in_specs=[_HBM(), _ANY()],
        out_specs=_VMEM(),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_count_kernel, width=width,
                          box_bf16=box_bf16),
        out_shape=jax.ShapeDtypeStruct((Sp, 128), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_INTERPRET,
    )(seg_node, seg_base, seg_count, cmask, nsegs, queue, node_packed)


def _run_pack(queue_in, node_packed, prim_packed, log_in,
              seg_node, seg_base, seg_count, cdest, ckind, clstart, clcnt,
              cforce, cgc, cursor, nsegs, ctab, cpair,
              width: int, k8: int, cols_out: int, do_kill: bool,
              kill_eps: float, logcap: int, box_bf16: bool = False,
              fused_gc: bool = False, dyn_alloc: bool = False):
    Sp = seg_node.shape[0]
    capT = max(_cdiv(cols_out // CHUNK, 128) * 128, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=13,
        grid=(1,),
        in_specs=[_HBM(), _ANY(), _ANY(), _HBM()],
        out_specs=(_HBM(), _HBM(), _SMEM(), _VMEM(), _VMEM(), _VMEM()),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.VMEM((width, 1, 128), jnp.float32),
            pltpu.VMEM((width, k8, 128), jnp.float32),
            pltpu.VMEM((width, ROWS, 2 * CHUNK), jnp.float32),
            pltpu.VMEM((LROWS, 2 * CHUNK), jnp.float32),
            pltpu.VMEM((width, ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((LROWS, CHUNK), jnp.float32),
            pltpu.VMEM((1, CHUNK), jnp.float32),
            pltpu.VMEM((1, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((width,)),
            pltpu.SemaphoreType.DMA((width,)),
            pltpu.SemaphoreType.DMA((width,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _pack_kernel, width=width, k8=k8, do_kill=do_kill,
            kill_eps=kill_eps, logcap=logcap, box_bf16=box_bf16,
            fused_gc=fused_gc, dyn_alloc=dyn_alloc,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ROWS, cols_out), jnp.float32),
            jax.ShapeDtypeStruct(log_in.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
            jax.ShapeDtypeStruct((Sp, 128), jnp.float32),
            jax.ShapeDtypeStruct((Sp, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, capT), jnp.float32),
        ),
        grid_spec=grid_spec,
        # operand 16 = log_in (13 scalars + queue, node, prim), aliased
        # to output 1 so the hit log accumulates across levels
        input_output_aliases={16: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_INTERPRET,
    )(seg_node, seg_base, seg_count, cdest, ckind, clstart, clcnt, cforce,
      cgc, cursor, nsegs, ctab, cpair,
      queue_in, node_packed, prim_packed, log_in)


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
    queue_multiplier: int = 2,
    kill_eps: float = 1e-3,
    debug_levels: int = 0,
    debug_no_leaf: bool = False,
    debug_no_merge: bool = False,
    compact: bool = False,
    merge_cascade: bool = True,
    box_bf16: bool = False,
    debug_merge_cols: int = 0,
    debug_double_count: bool = False,
    debug_merge_branch: bool = False,
    want_prim: bool = True,
    fused_counts: bool = False,
    dyn_alloc: bool = False,
    seed_t: jnp.ndarray = None,
    seed_prim: jnp.ndarray = None,
) -> WaveTraceResult:
    """Closest-hit traversal for N rays via the fused segment-major
    Pallas pipeline.  Exact-match semantics vs ops.traverse.trace_closest
    for closest-hit passes; shadow passes (t_limit given) additionally
    early-terminate entries once any hit lands more than kill_eps short
    of the light — the reported t then still decides the reference pass
    condition ``t > maxT - eps`` (src/cudaRenderer.cu:1279) identically.

    ``compact=True`` runs the live-lane partition kernel first
    (ops/pallas/partition.py) and bounds the level-0 sweep by the live
    count: with Russian roulette killing 75-90% of lanes at depth 2/3,
    every downstream kernel sweep and the merge cascade scale with
    liveness instead of N.  No inverse permutation is needed — the
    merge scatters by the ray id carried in payload row 6.

    ``dyn_alloc=True`` replaces the per-level count kernel (a full HBM
    sweep that only computes write offsets) with bump-cursor chunk
    allocation inside the pack kernel: each flushed [8, CHUNK] block
    takes the next physical chunk of queue_out and records its
    next-level segment id in a tag row; the host derives the next
    level's read order as a stable argsort of the tags (bit-identical
    to contiguous regions — chunks of one segment stay in entry order).
    Measured a wash on v5e (BENCHNOTES: 706 vs 711 ms on the
    bench-shaped bounce pass) — the count sweep it saves costs about
    what the lost read contiguity adds — kept off by default.
    """
    bvh = scene.bvh
    sched = bvh.wf_sched
    assert sched, "scene was flattened without a wavefront schedule"
    W = bvh.width
    k8 = max(_cdiv(bvh.max_leaf, 8) * 8, 8)
    C = CHUNK

    N_in = o.shape[0]
    npad = (-N_in) % C
    N = N_in + npad
    assert N < RID_BIAS, (
        f"{N} rays exceed the biased-bitcast ray-id range (2^30)"
    )

    vmask = valid[:, None]
    o_sane = jnp.where(vmask, o.astype(jnp.float32), 2e30)
    d_sane = jnp.where(vmask, d.astype(jnp.float32), 0.0)
    ray_f = rid_encode(jnp.arange(N_in, dtype=jnp.int32))
    if t_limit is None:
        tub = jnp.full((N_in,), T_NO_LIMIT, jnp.float32)
        do_kill = False
    else:
        tub = jnp.minimum(t_limit.astype(jnp.float32), T_NO_LIMIT)
        do_kill = True
    if seed_t is not None:
        # conservative seeding (ops/seeds.py): a pre-computed hit
        # against the K largest prims tightens the initial carried
        # bound, so boxes beyond it are pruned from the root down and
        # only strictly-closer hits reach the log.  The seed t matches
        # the kernel's own leaf t for that prim to ~1 ulp (separate
        # XLA fusion), so results agree with the unseeded trace to
        # float rounding (see ops/seeds.py).
        st = seed_t.astype(jnp.float32)
        if do_kill:
            # seed already decisively short of the light: the shadow
            # answer is decided — kill the lane before traversal
            decided = st < tub - jnp.float32(kill_eps)
            tub = jnp.where(decided, -1.0, jnp.minimum(tub, st))
        else:
            tub = jnp.minimum(tub, st)
    tub = jnp.where(valid, tub, -1.0)
    payload = jnp.concatenate(
        [o_sane.T, d_sane.T, ray_f[None, :], tub[None, :]], axis=0
    )
    if npad:
        payload = jnp.concatenate(
            [payload, jnp.zeros((ROWS, npad), jnp.float32)
             .at[7, :].set(-1.0)],
            axis=1,
        )

    # static capacities
    n_chunks0 = N // C
    max_next_segs = max(
        (len(lv[0]) for lv in sched[1:]), default=1
    )
    cap_chunks = _cdiv(queue_multiplier * N, C) + max_next_segs + 2
    cols = cap_chunks * C
    logcap = 2 * N
    logcols = logcap + C

    if compact:
        from .partition import compact_live_payload

        payload, n_live = compact_live_payload(payload)
        count0 = n_live.reshape(1)
    else:
        count0 = jnp.full((1,), N, jnp.int32)

    queue = payload  # level-0 queue: exactly the ray chunks
    log = jnp.zeros((LROWS, logcols), jnp.float32)
    cursor = jnp.zeros((1,), jnp.int32)
    dropped = jnp.int32(0)

    seg_base = jnp.zeros((1,), jnp.int32)
    seg_count = count0
    gc_prev = None
    # dyn_alloc chunk table: level 0 reads the payload contiguously
    ctab = jnp.arange(max(queue.shape[1] // C, 1), dtype=jnp.int32)
    if dyn_alloc:
        fused_counts = False  # dyn_alloc already subsumes the count fuse

    for lvl, (seg_nodes, kind, pair, lstart, lcnt, forced) in enumerate(
        sched
    ):
        if debug_levels and lvl >= debug_levels:
            break
        if debug_no_leaf:  # timing diagnostics only: drop leaf children
            kind = tuple(0 if k == 2 else k for k in kind)
        S = len(seg_nodes)
        Sp = _bucket(S)
        SWp = Sp * W

        def pad_i32(vals, fill, size):
            a = np.full((size,), fill, np.int32)
            a[: len(vals)] = vals
            return jnp.asarray(a)

        seg_node_a = pad_i32(seg_nodes, 0, Sp)
        ckind_a = pad_i32(kind, 0, SWp)
        clstart_a = pad_i32(lstart, 0, SWp)
        clcnt_a = pad_i32(lcnt, 0, SWp)
        cforce_a = pad_i32(forced, 0, SWp)
        nsegs_a = jnp.asarray([S], jnp.int32)
        seg_base_p = jnp.zeros((Sp,), jnp.int32).at[:S].set(seg_base)
        seg_count_p = jnp.zeros((Sp,), jnp.int32).at[:S].set(seg_count)

        has_inner = any(k == 1 for k in kind)
        if dyn_alloc:
            # no pre-counting: the pack kernel bump-allocates output
            # chunks and reports per-child written counts + chunk tags;
            # destination regions are derived AFTER the pack
            cdest_a = jnp.zeros((SWp,), jnp.int32)
            cpair_a = pad_i32(
                [p if k == 1 else -1 for k, p in zip(kind, pair)],
                -1, SWp,
            )
            cols_out = cols if has_inner else C
        elif has_inner:
            cmask_a = pad_i32(
                [1 if k == 1 else 0 for k in kind], 0, SWp
            )
            if gc_prev is not None:
                # counts for this level were produced by the PREVIOUS
                # pack's fused grandchild counting — no HBM count sweep.
                # gc_prev[s, w*W + w'] = entries appended to child
                # (s, w) entering its child w'; segment c's parent slot
                # is host-known from the previous level's pair map
                prev_pair, prev_Sp = gc_prev[1], gc_prev[2]
                inv = np.zeros((S,), np.int64)
                for idx, c in enumerate(prev_pair):
                    if 0 <= c < S:
                        inv[c] = idx
                arr = gc_prev[0][:, :W * W].reshape(prev_Sp * W, W)
                counts_flat = (
                    arr[jnp.asarray(inv)].reshape(-1).astype(jnp.int32)
                )
            else:
                counts = _run_count(
                    queue, bvh.node_packed, seg_node_a, seg_base_p,
                    seg_count_p, cmask_a, nsegs_a, W, box_bf16,
                )
                if debug_double_count:
                    # timing diagnostics: a second (side-effectful, so
                    # not DCE'd) count sweep — its delta vs a normal
                    # run is the count kernel's share of the level loop
                    counts2 = _run_count(
                        queue, bvh.node_packed, seg_node_a, seg_base_p,
                        seg_count_p, cmask_a, nsegs_a, W, box_bf16,
                    )
                    counts = jnp.maximum(counts, counts2)
                counts_flat = (
                    counts[:S, :W].reshape(-1).astype(jnp.int32)
                )
            pair_np = np.asarray(pair, np.int32)
            S_next = len(sched[lvl + 1][0])
            next_idx = jnp.asarray(
                np.where(pair_np >= 0, pair_np, S_next).astype(np.int32)
            )
            count_next = (
                jnp.zeros((S_next + 1,), jnp.int32)
                .at[next_idx]
                .set(counts_flat)[:S_next]
            )
            chunks_next = (count_next + C - 1) // C
            cum = jnp.cumsum(chunks_next)
            base_next = cum - chunks_next
            fits = cum <= cap_chunks
            dropped = dropped + jnp.sum(jnp.where(fits, 0, count_next))
            count_next = jnp.where(fits, count_next, 0)
            dest_units = jnp.where(fits & (count_next > 0), base_next, -1)
            cdest_a = jnp.concatenate(
                [dest_units, jnp.full((1,), -1, jnp.int32)]
            )[next_idx]
            cdest_a = (
                jnp.full((SWp,), -1, jnp.int32).at[: S * W].set(cdest_a)
            )
            cols_out = cols
        else:
            cdest_a = jnp.full((SWp,), -1, jnp.int32)
            cols_out = C

        # fused counting for the NEXT level: count grandchildren in
        # this pack when level lvl+1 has inner children of its own
        # (otherwise its pack needs no destinations)
        fuse_next = (
            fused_counts
            and not debug_double_count
            and has_inner
            and lvl + 1 < len(sched)
            and any(k == 1 for k in sched[lvl + 1][1])
            and not (debug_levels and lvl + 1 >= debug_levels)
        )
        if fuse_next:
            kind_next = sched[lvl + 1][1]
            cgc_vals = []
            for i, k in enumerate(kind):
                c = pair[i] if k == 1 else -1
                if c is None or c < 0 or k != 1:
                    cgc_vals.append(0)
                    continue
                bits = 0
                for w2 in range(W):
                    if kind_next[c * W + w2] == 1:
                        bits |= 1 << w2
                cgc_vals.append((1 << 8) | bits)
            cgc_a = pad_i32(cgc_vals, 0, SWp)
        else:
            cgc_a = pad_i32([], 0, SWp)

        if not dyn_alloc:
            cpair_a = jnp.full((SWp,), -1, jnp.int32)
        queue_new, log, currow, gc_out, app_out, tags_out = _run_pack(
            queue, bvh.node_packed, scene.prim_packed, log,
            seg_node_a, seg_base_p, seg_count_p, cdest_a, ckind_a,
            clstart_a, clcnt_a, cforce_a, cgc_a, cursor, nsegs_a,
            ctab, cpair_a,
            W, k8, cols_out, do_kill, kill_eps, logcap, box_bf16,
            fused_gc=fuse_next, dyn_alloc=dyn_alloc,
        )
        gc_prev = (gc_out, np.asarray(pair, np.int32), Sp) \
            if fuse_next else None
        cursor = currow[0, 0].reshape(1)
        dropped = dropped + currow[0, 1]

        if not has_inner:
            break
        queue = queue_new
        if dyn_alloc:
            # next level's segment sizes = this pack's written counts;
            # its read chunk table = the allocation order grouped by
            # next-segment tag (stable sort keeps per-segment chunks in
            # entry order, so results are bit-identical to contiguous
            # regions)
            pair_np = np.asarray(pair, np.int32)
            S_next = len(sched[lvl + 1][0])
            inv = np.zeros((S_next,), np.int64)
            for i, c in enumerate(pair_np):
                if 0 <= c < S_next:
                    inv[c] = i
            flat_written = app_out[:, :W].reshape(Sp * W)
            count_next = flat_written[jnp.asarray(inv)].astype(jnp.int32)
            chunks_next = (count_next + C - 1) // C
            cum = jnp.cumsum(chunks_next)
            seg_base = (cum - chunks_next).astype(jnp.int32)
            seg_count = count_next
            ctab = jnp.argsort(tags_out[0], stable=True).astype(jnp.int32)
        else:
            seg_base = base_next.astype(jnp.int32)
            seg_count = count_next.astype(jnp.int32)

    # ---- deterministic merge of the hit log ----
    if debug_no_merge:  # timing diagnostics only — wrong results;
        # `dropped` carries the used-entry cursor for instrumentation
        return WaveTraceResult(
            t=log[0, :N_in] + cursor[0].astype(jnp.float32),
            prim=log[1, :N_in].astype(jnp.int32),
            dropped=cursor[0],
        )
    used = jnp.minimum(cursor[0], logcap)

    if seed_t is not None:
        # dense merge init: the seed hit stands in for the entry the
        # kernel would have logged for that prim (same formula, ~1 ulp
        # fusion drift), so rays whose seed is final need no log entry
        # at all — the scatter-min starts from the seed instead of +inf
        seed_vis = jnp.where(
            (seed_t < T_NO_LIMIT) & valid,
            seed_t.astype(jnp.float32), INF,
        )
        init_bits = jnp.append(_f2bits(seed_vis), _f2bits(INF))
    else:
        init_bits = None

    def merge_prefix(cols):
        """Scatter-min merge over the first `cols` log columns (static);
        correct whenever used <= cols since the log fills
        front-to-back.  With want_prim=False only the min-t scatter
        runs (1 linear pass instead of 3) — enough for shadow passes,
        whose only consumer is the ``t > maxT - eps`` comparison."""
        lg = log[:, :cols]
        colid = jnp.arange(cols, dtype=jnp.int32)
        live = colid < used
        t_flat = lg[0]
        p_flat = lg[1]
        r_flat = lg[2]
        ray_i = jnp.where(live, rid_decode(r_flat), N_in)
        bits = _f2bits(jnp.where(live, t_flat, INF))
        best_bits = init_bits if init_bits is not None else jnp.full(
            (N_in + 1,), _f2bits(INF), jnp.int32
        )
        best_bits = best_bits.at[ray_i].min(bits, mode="drop")
        if not want_prim:
            return best_bits[:N_in], None
        win = live & (bits == best_bits[jnp.clip(ray_i, 0, N_in)])
        tgt = jnp.where(win, ray_i, N_in)
        # deterministic tie-break among bit-equal-t winners: max prim
        # id (same convention as packet_dfs's leaf merge) — a plain
        # .set would leave duplicate-index winners unspecified
        # (shared-edge ties)
        best_prim = jnp.full((N_in + 1,), -1, jnp.int32)
        best_prim = best_prim.at[tgt].max(
            jnp.where(win, p_flat.astype(jnp.int32), -1), mode="drop"
        )
        return best_bits[:N_in], best_prim[:N_in]

    # The scatter/gather cost of the merge is shape-static, but the log
    # is mostly empty on thin passes (shadow kills, RR-compacted
    # queues): switch over power-of-2 prefixes so the common case only
    # pays for the prefix that is actually occupied.  One lax.switch
    # (not a cond chain — every conditional costs ~2 dispatch round
    # trips through this runtime, ~50 ms).
    if debug_merge_cols:  # timing diagnostics: force a static prefix
        best_bits, best_prim = merge_prefix(
            min(debug_merge_cols, logcols)
        )
    elif merge_cascade:
        caps = []
        cap = max(logcols // 64, C)
        while cap < logcols:
            caps.append(cap)
            cap *= 2
        caps.append(logcols)
        idx = jnp.int32(0)
        for capv in caps[:-1]:
            idx = idx + (used > capv).astype(jnp.int32)
        best_bits, best_prim = jax.lax.switch(
            idx, [lambda c=c: merge_prefix(c) for c in caps]
        )
        if debug_merge_branch:
            return WaveTraceResult(
                t=jnp.where(best_prim >= 0, _bits2f(best_bits), INF)
                if best_prim is not None else _bits2f(best_bits),
                prim=best_prim if best_prim is not None
                else jnp.zeros((N_in,), jnp.int32),
                dropped=idx * jnp.int32(100_000_000) + used,
            )
    else:
        best_bits, best_prim = merge_prefix(logcols)

    if want_prim:
        if seed_prim is not None:
            # any log entry beats the seed strictly, so the seed prim
            # only decides when no entry landed for the ray (seed_prim
            # is already -1 where the seed missed)
            best_prim = jnp.where(best_prim >= 0, best_prim, seed_prim)
        return WaveTraceResult(
            t=jnp.where(best_prim >= 0, _bits2f(best_bits), INF),
            prim=best_prim,
            dropped=dropped,
        )
    # lite result: exact min t (INF on miss, since log t entries are
    # finite and positive-float bit order is monotone); prim ids were
    # never merged — mark hits -2 so misuse is loud
    hit = best_bits < _f2bits(INF)
    return WaveTraceResult(
        t=_bits2f(best_bits),
        prim=jnp.where(hit, -2, -1),
        dropped=dropped,
    )

"""Breadth-first wide-BVH wavefront traversal (jnp).

The TPU-native re-expression of the reference's traversal machinery —
kernelRayIntersectSingle / kernelRayIntersectLevel / kernelScanCounts /
kernelMergeIntersections (src/cudaRenderer.cu:846-1489) — with every
CUDA-ism replaced by its deterministic dense equivalent:

* per-node ray queues + atomicAdd slot grabbing  ->  (ray, node) entry
  arrays compacted by exclusive-scan (ops/compact.py);
* per-level ``maxBlocks`` device->host feedback
  (src/cudaRenderer.cu:2236-2248)  ->  one static queue capacity
  (queue_multiplier * num_rays — the reference's own sizing rule,
  src/cudaRenderer.cu:1919-1920) reused by every level so the whole
  level loop is a single shape-uniform ``lax.scan`` body (tiny XLA
  program, one compile);
* racy minT check-then-set + 16-token candidate buffers merged by
  kernelMergeIntersections (src/cudaRenderer.cu:1187-1293, 515-540)  ->
  a single scatter-min over monotone float bits with a deterministic
  winner write (no candidate buffers at all);
* leaf staging in shared memory  ->  a dense [entries, max_leaf]
  ray-x-primitive test block that XLA vectorizes onto 8x128 VPU tiles,
  scanned in fixed-size chunks to bound the working set.

Traversal semantics match the reference exactly: a child box is entered
when the slab test returns ``t >= 0 && t <= minT[ray]``
(src/cudaRenderer.cu:978-1003); leaves accept hits with ``t >= 0`` that
beat the ray's current best (src/cudaRenderer.cu:1144-1196); shadow
rays reuse the same closest-hit traversal, with the pass condition
``t_closest > maxT - eps`` applied by the caller (the reference's
per-candidate check at src/cudaRenderer.cu:1279).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..render.flatscene import FlatScene
from .intersect import intersect_bbox

INF_F32 = jnp.float32(jnp.inf)


class TraceResult(NamedTuple):
    #: closest hit distance per ray (inf = miss)
    t: jnp.ndarray
    #: primitive index (BVH-sorted order) per ray, -1 = miss
    prim: jnp.ndarray
    #: total entries dropped on queue overflow (diagnostic; 0 in any
    #: correctly-sized run)
    dropped: jnp.ndarray


def _f2bits(t: jnp.ndarray) -> jnp.ndarray:
    """Monotone int32 view of non-negative float32 (inf -> 0x7f800000)."""
    return jax.lax.bitcast_convert_type(t, jnp.int32)


def _bits2f(b: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


#: chunk sizes bounding the dense per-step working set; the leaf step
#: materializes [LEAF_CHUNK, max_leaf, 3] temporaries (~25 MB at 64k x
#: 32), the inner step [INNER_CHUNK, W, 3] (~6 MB at 128k x 4) — the
#: TPU analog of the reference's grid-of-blocks scheduling, with XLA's
#: scan playing the role of the block scheduler
LEAF_CHUNK = 1 << 16
INNER_CHUNK = 1 << 17


def _compact_to(mask, arrays, capacity: int):
    """Scan+scatter compaction into fixed [capacity] buffers (see
    ops/compact.py for the general form).  Returns (outs, count,
    dropped)."""
    m = mask.astype(jnp.int32)
    pos = jnp.cumsum(m) - m
    total = pos[-1] + m[-1]
    keep = mask & (pos < capacity)
    idx = jnp.where(keep, pos, capacity)
    outs = []
    for a in arrays:
        buf = jnp.zeros((capacity + 1,) + a.shape[1:], dtype=a.dtype)
        outs.append(buf.at[idx].set(a, mode="drop")[:capacity])
    count = jnp.minimum(total, capacity)
    return outs, count, total - count


def trace_closest(
    scene: FlatScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    valid: jnp.ndarray,
    queue_multiplier: int = 4,
) -> TraceResult:
    """Closest-hit traversal for N rays against the flat wide BVH.

    o, d: [N, 3] float32; valid: [N] bool.  Invalid rays return miss.
    """
    bvh = scene.bvh
    N = o.shape[0]
    P = scene.num_prims
    W = bvh.width
    K = bvh.max_leaf
    C = queue_multiplier * N  # uniform per-level entry capacity

    best_bits0 = jnp.full((N,), _f2bits(INF_F32), dtype=jnp.int32)
    best_prim0 = jnp.full((N,), -1, dtype=jnp.int32)

    # ---- leaf batch: [Q, K] primitive tests + deterministic merge ----
    def process_leaf_batch(e_ray, e_node, e_valid, best_bits, best_prim):
        k = jnp.arange(K, dtype=jnp.int32)

        def step(carry, inp):
            best_bits, best_prim = carry
            c_ray, c_node, c_valid = inp
            cc = c_ray.shape[0]
            # one wide-row gather per table (fast gather emitter); the
            # optimization barrier keeps XLA from re-fusing the gather
            # into the arithmetic (a fused loop-gather serializes on TPU)
            nrows = jax.lax.optimization_barrier(bvh.node_packed[c_node])
            start = nrows[:, 7 * W].astype(jnp.int32)
            rng = nrows[:, 7 * W + 1].astype(jnp.int32)
            pid = start[:, None] + k[None, :]  # [C, K]
            pmask = k[None, :] < rng[:, None]
            pid_c = jnp.clip(pid, 0, P - 1)
            prows = jax.lax.optimization_barrier(
                scene.prim_packed[pid_c.reshape(-1)]
            ).reshape(cc, K, -1)
            rrows = jax.lax.optimization_barrier(
                jnp.concatenate([o[c_ray], d[c_ray]], axis=1)
            )
            o_e = rrows[:, None, 0:3]
            d_e = rrows[:, None, 3:6]
            from .intersect import intersect_rows

            # the shared precomputed-table test (packed_prim_test) —
            # identical op order to the Pallas kernels' leaf stages
            t = intersect_rows(o_e, d_e, prows)  # [C, K]
            t = jnp.where(pmask & c_valid[:, None] & (t >= 0), t, INF_F32)
            kmin = jnp.argmin(t, axis=1)  # first (lowest-pid) min
            tmin = jnp.take_along_axis(t, kmin[:, None], axis=1)[:, 0]
            pmin = jnp.take_along_axis(pid_c, kmin[:, None], axis=1)[:, 0]

            finite = tmin < INF_F32
            bits = _f2bits(tmin)
            tgt = jnp.where(finite, c_ray, N)  # N = dump slot
            best_bits = best_bits.at[tgt].min(bits, mode="drop")
            # winner write: entries matching the (updated) per-ray best
            # record their primitive.  Any entry later beaten re-triggers
            # a write from the beating batch, keeping the pair consistent.
            win = finite & (bits == best_bits[c_ray])
            tgt2 = jnp.where(win, c_ray, N)
            best_prim = best_prim.at[tgt2].set(pmin, mode="drop")
            return (best_bits, best_prim), None

        q = e_ray.shape[0]
        nc = max(_cdiv(q, LEAF_CHUNK), 1)
        chunk = _cdiv(q, nc)
        pad = nc * chunk - q
        ins = []
        for a, fill in ((e_ray, 0), (e_node, 0), (e_valid, False)):
            if pad:
                a = jnp.concatenate(
                    [a, jnp.full((pad,), fill, a.dtype)], axis=0
                )
            ins.append(a.reshape(nc, chunk))
        if nc == 1:
            (best_bits, best_prim), _ = step(
                (best_bits, best_prim), tuple(a[0] for a in ins)
            )
        else:
            (best_bits, best_prim), _ = jax.lax.scan(
                step, (best_bits, best_prim), tuple(ins)
            )
        return best_bits, best_prim

    if bvh.root_is_leaf:
        e_ray = jnp.arange(N, dtype=jnp.int32)
        e_node = jnp.zeros((N,), dtype=jnp.int32)
        bb, bp = process_leaf_batch(e_ray, e_node, valid, best_bits0, best_prim0)
        return TraceResult(
            t=jnp.where(bp >= 0, _bits2f(bb), INF_F32),
            prim=bp,
            dropped=jnp.int32(0),
        )

    # ---- one shape-uniform level step, scanned over the tree depth ----
    def level_step(carry, _):
        e_ray, e_node, e_valid, best_bits, best_prim, dropped = carry

        # inner box tests, chunked
        def box_step(c, inp):
            best_bits = c
            c_ray, c_node, c_valid = inp
            cc = c_ray.shape[0]
            nrows = jax.lax.optimization_barrier(bvh.node_packed[c_node])
            cmin = nrows[:, 0 : 3 * W].reshape(cc, W, 3)
            cmax = nrows[:, 3 * W : 6 * W].reshape(cc, W, 3)
            outlets_f = nrows[:, 6 * W : 7 * W]
            child_leaf_f = nrows[:, 7 * W + 2 : 8 * W + 2]
            rrows = jax.lax.optimization_barrier(
                jnp.concatenate(
                    [o[c_ray], d[c_ray], _bits2f(best_bits[c_ray])[:, None]],
                    axis=1,
                )
            )
            o_e = rrows[:, None, 0:3]
            d_e = rrows[:, None, 3:6]
            best_f = rrows[:, 6]
            tbox = intersect_bbox(o_e, d_e, cmin, cmax)  # [Cc, W]
            hit = (
                c_valid[:, None]
                & (outlets_f >= 0)
                & (tbox >= 0)
                & (tbox <= best_f[:, None])
            )
            return best_bits, (hit, outlets_f.astype(jnp.int32), child_leaf_f > 0.5)

        nc = max(_cdiv(C, INNER_CHUNK), 1)
        chunk = _cdiv(C, nc)
        pad = nc * chunk - C
        ins = []
        for a, fill in ((e_ray, 0), (e_node, 0), (e_valid, False)):
            if pad:
                a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
            ins.append(a.reshape(nc, chunk))
        if nc == 1:
            _, (hit, outlets, child_leaf) = box_step(
                best_bits, tuple(a[0] for a in ins)
            )
        else:
            _, (hit, outlets, child_leaf) = jax.lax.scan(
                box_step, best_bits, tuple(ins)
            )
            hit = hit.reshape(-1, W)
            outlets = outlets.reshape(-1, W)
            child_leaf = child_leaf.reshape(-1, W)
        hit = hit[:C]
        outlets = outlets[:C]
        child_leaf = child_leaf[:C].reshape(-1)

        push_ray = jnp.broadcast_to(e_ray[:, None], (C, W)).reshape(-1)
        push_node = jnp.clip(outlets.reshape(-1), 0, bvh.leaf_range.shape[0] - 1)
        hit_flat = hit.reshape(-1)

        # leaf children: intersect now
        (lr, ln), lcount, ldrop = _compact_to(
            hit_flat & child_leaf, (push_ray, push_node), C
        )
        lvalid = jnp.arange(C) < lcount
        best_bits, best_prim = process_leaf_batch(
            lr, ln, lvalid, best_bits, best_prim
        )

        # inner children: next level entries
        (e_ray, e_node), icount, idrop = _compact_to(
            hit_flat & (~child_leaf), (push_ray, push_node), C
        )
        e_valid = jnp.arange(C) < icount
        dropped = dropped + ldrop + idrop
        return (e_ray, e_node, e_valid, best_bits, best_prim, dropped), None

    # level 0: every ray at the root, padded to capacity C
    pad = C - N
    e_ray = jnp.concatenate(
        [jnp.arange(N, dtype=jnp.int32), jnp.zeros((pad,), jnp.int32)]
    )
    e_node = jnp.zeros((C,), dtype=jnp.int32)
    e_valid = jnp.concatenate([valid, jnp.zeros((pad,), dtype=bool)])

    carry = (e_ray, e_node, e_valid, best_bits0, best_prim0, jnp.int32(0))
    num_steps = bvh.num_levels - 1
    if num_steps > 0:
        carry, _ = jax.lax.scan(level_step, carry, None, length=num_steps)
    _, _, _, best_bits, best_prim, dropped = carry

    return TraceResult(
        t=jnp.where(best_prim >= 0, _bits2f(best_bits), INF_F32),
        prim=best_prim,
        dropped=dropped,
    )


def trace_bruteforce(scene: FlatScene, o, d, valid, chunk: int = 512):
    """O(N*P) dense closest hit — the BVH-free oracle used to validate
    the traversal (the correctness cross-check the reference lacked,
    SURVEY.md section 4).  Chunks primitives to bound memory."""
    N = o.shape[0]
    P = scene.num_prims
    best_t = jnp.full((N,), INF_F32)
    best_prim = jnp.full((N,), -1, dtype=jnp.int32)
    from .intersect import intersect_rows

    for s in range(0, P, chunk):
        e = min(s + chunk, P)
        t = intersect_rows(
            o[:, None, :],
            d[:, None, :],
            scene.prim_packed[None, s:e, :22],
        )  # [N, e-s]
        t = jnp.where((t >= 0) & valid[:, None], t, INF_F32)
        k = jnp.argmin(t, axis=1)
        tmin = jnp.take_along_axis(t, k[:, None], axis=1)[:, 0]
        better = tmin < best_t
        best_t = jnp.where(better, tmin, best_t)
        best_prim = jnp.where(better, (k + s).astype(jnp.int32), best_prim)
    return TraceResult(t=best_t, prim=best_prim, dropped=jnp.int32(0))

"""Packet-DFS BVH traversal: one Pallas kernel per trace (TPU v3).

Third-generation traversal design.  The BFS queue machinery of
wavefront/wavefront2 (per-level classify -> compact -> scatter, the
direct analog of the reference's per-level kernel pipeline,
src/cudaRenderer.cu:1304-1489) is replaced by *packet* traversal:

* Rays are grouped into fixed packets of C=1024 consecutive ids (one
  [8,128] vector register per f32 attribute).  Each packet depth-first
  traverses the wide BVH exactly once, with its node stack in SMEM.
* A node's child is descended if ANY live lane enters its box (union
  semantics).  Correctness: each lane's true traversal path is a subset
  of the packet union, so the minimum over the union's leaf hits is the
  lane's true closest hit; extra leaf tests only ever produce real
  intersections, which cannot beat the true minimum.
* Per-lane best-t (the reference's evolving minT gate,
  src/cudaRenderer.cu:978-1003) prunes children per lane; inner
  children are pushed far-to-near so near subtrees tighten the bound
  first, and leaf children are intersected inline at the parent.
* Ray payloads never move: a packet's rays stay resident in VMEM for
  the whole traversal (no per-level HBM round trips, no compaction),
  and the node and primitive tables are VMEM-resident too.  The grid
  pipelines packets, so the only HBM traffic is one payload read and
  one result write per ray.

Shadow passes (t_limit given) start the bound at the light distance —
occluders beyond the light are never even recorded — and kill lanes
outright (bound := -1) once a hit lands more than kill_eps short of the
light, so decided lanes stop widening the union.

Intersection math matches ops/intersect.py (the reference's
intersectBBox / intersectRayTriangle, src/cudaRenderer.cu:154-270)
so results agree with the XLA path to float rounding.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...render.flatscene import FlatScene

#: rays per packet: 8x128 = one vector register per f32 attribute
C = 1024
#: finite "no limit" initial bound (must not be inf: inf*0 = nan)
T_NO_LIMIT = 1e30
STACK_CAP = 256
MAX_VISITS = 1 << 20

#: sorting networks (descending) for the child push order
_NETS = {
    2: [(0, 1)],
    4: [(0, 1), (2, 3), (0, 2), (1, 3), (1, 2)],
    8: [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
        (1, 2), (5, 6), (0, 4), (1, 5), (2, 6), (3, 7), (2, 4), (3, 5),
        (1, 2), (3, 4), (5, 6)],
}


class WaveTraceResult(NamedTuple):
    t: jnp.ndarray
    prim: jnp.ndarray
    dropped: jnp.ndarray


def _dfs_kernel(
    payload_ref,  # [8, C] block: o.xyz, d.xyz, pad, tub0
    nodes_ref,  # [N, 128] node_dfs rows (VMEM resident)
    prims_ref,  # [G, 128] prim-group rows (VMEM resident)
    out_ref,  # [4, C] block: t, prim, visits, pad
    tiles,  # [48, 128] scratch: tiled o / inv_d
    state,  # [3, C] scratch: tub row, prim row, best-t row
    stack,  # SMEM [STACK_CAP] i32
    *,
    width: int,
    do_kill: bool,
    kill_eps: float,
):
    W = width

    def tile(row):
        return row.reshape(8, 128)

    o_row = [payload_ref[a : a + 1, :] for a in range(3)]
    d_row = [payload_ref[a + 3 : a + 4, :] for a in range(3)]
    tub0 = payload_ref[7:8, :]

    for a in range(3):
        tiles[8 * a : 8 * a + 8, :] = tile(o_row[a])
        tiles[24 + 8 * a : 24 + 8 * a + 8, :] = tile(1.0 / d_row[a])

    state[0:1, :] = tub0
    state[1:2, :] = jnp.full((1, C), -1.0, jnp.float32)
    state[2:3, :] = jnp.full((1, C), T_NO_LIMIT, jnp.float32)

    stack[0] = 0
    live0 = jnp.sum((tub0 >= 0.0).astype(jnp.int32))

    def cond(c):
        sp, live, visits = c
        return (sp > 0) & (live > 0) & (visits < MAX_VISITS)

    def body(c):
        sp, live, visits = c
        node = stack[sp - 1]
        sp = sp - 1
        nrow = nodes_ref[pl.ds(node, 1), :]

        ox = tiles[0:8, :]
        oy = tiles[8:16, :]
        oz = tiles[16:24, :]
        ix = tiles[24:32, :]
        iy = tiles[32:40, :]
        iz = tiles[40:48, :]
        tub_t = tile(state[0:1, :])
        alive_t = tub_t >= 0.0

        keys = []
        kinds = []
        entered = []
        for w in range(W):
            mnx = nrow[0:1, 3 * w + 0 : 3 * w + 1]
            mny = nrow[0:1, 3 * w + 1 : 3 * w + 2]
            mnz = nrow[0:1, 3 * w + 2 : 3 * w + 3]
            mxx = nrow[0:1, 3 * W + 3 * w + 0 : 3 * W + 3 * w + 1]
            mxy = nrow[0:1, 3 * W + 3 * w + 1 : 3 * W + 3 * w + 2]
            mxz = nrow[0:1, 3 * W + 3 * w + 2 : 3 * W + 3 * w + 3]
            # slab test (intersectBBox, src/cudaRenderer.cu:154-207)
            t0x = (mnx - ox) * ix
            t1x = (mxx - ox) * ix
            t0y = (mny - oy) * iy
            t1y = (mxy - oy) * iy
            t0z = (mnz - oz) * iz
            t1z = (mxz - oz) * iz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z),
            )
            inside = (
                (ox >= mnx) & (ox <= mxx)
                & (oy >= mny) & (oy <= mxy)
                & (oz >= mnz) & (oz <= mxz)
            )
            m = (((tn <= tf) & (tf >= 0.0) & (tn <= tub_t)) | inside) & alive_t
            kind_w = nrow[0, 6 * W + w]
            n_m = jnp.sum(m.astype(jnp.float32))
            ent_w = (n_m > 0.0) & (kind_w > 0.5)
            key_w = jnp.min(
                jnp.where(m, jnp.where(inside, 0.0, tn), T_NO_LIMIT)
            )
            keys.append(key_w)
            kinds.append(kind_w)
            entered.append(ent_w)

        # ---- leaf children first: tighten the bound in child order ----
        for w in range(W):
            is_leaf = entered[w] & (kinds[w] > 1.5)

            @pl.when(is_leaf)
            def _(w=w):
                grp0 = nrow[0, 7 * W + w].astype(jnp.int32)
                lcnt = nrow[0, 8 * W + w].astype(jnp.int32)
                loff = nrow[0, 9 * W + w].astype(jnp.int32)
                ngroups = (loff + lcnt + 7) // 8

                o_x, o_y, o_z = o_row
                d_x, d_y, d_z = d_row
                srow = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

                def group_body(g, _):
                    grow = prims_ref[pl.ds(grp0 + g, 1), :]
                    pb = grow.reshape(8, 16)
                    v0x, v0y, v0z = pb[:, 0:1], pb[:, 1:2], pb[:, 2:3]
                    v1x, v1y, v1z = pb[:, 3:4], pb[:, 4:5], pb[:, 5:6]
                    v2x, v2y, v2z = pb[:, 6:7], pb[:, 7:8], pb[:, 8:9]
                    ptype = pb[:, 9:10]
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

                    inside_tri = (
                        edge_ok(v0x, v0y, v0z, v1x, v1y, v1z)
                        & edge_ok(v1x, v1y, v1z, v2x, v2y, v2z)
                        & edge_ok(v2x, v2y, v2z, v0x, v0y, v0z)
                    )
                    ok_tri = (~parallel) & inside_tri & (t_tri >= 0.0)
                    # sphere (center v0, radius v1.x)
                    radius = v1x
                    ocx, ocy, ocz = o_x - v0x, o_y - v0y, o_z - v0z
                    b_q = 2.0 * (ocx * d_x + ocy * d_y + ocz * d_z)
                    c_q = (
                        ocx * ocx + ocy * ocy + ocz * ocz - radius * radius
                    )
                    disc = b_q * b_q - 4.0 * c_q
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    ts1 = (-b_q - sq) * 0.5
                    ts2 = (-b_q + sq) * 0.5
                    t_sph = jnp.where(ts1 > 0, ts1, ts2)
                    ok_sph = (disc >= 0) & (t_sph > 0)

                    is_sph = ptype > 0.5
                    t_k = jnp.where(is_sph, t_sph, t_tri)
                    pidx8 = g * 8 + srow
                    pvalid = (pidx8 >= loff) & (pidx8 < loff + lcnt)
                    okm = (
                        ((is_sph & ok_sph) | ((~is_sph) & ok_tri)) & pvalid
                    )
                    t_mat = jnp.where(okm, t_k, T_NO_LIMIT)
                    tbest = jnp.min(t_mat, axis=0, keepdims=True)
                    kmin = jnp.argmin(t_mat, axis=0, keepdims=True)
                    prim = ((grp0 + g) * 8 + kmin).astype(jnp.float32)
                    tub_row = state[0:1, :]
                    better = tbest < tub_row
                    state[1:2, :] = jnp.where(better, prim, state[1:2, :])
                    state[2:3, :] = jnp.where(better, tbest, state[2:3, :])
                    state[0:1, :] = jnp.where(better, tbest, tub_row)
                    return 0

                jax.lax.fori_loop(0, ngroups, group_body, 0)

                if do_kill:
                    killed = (state[1:2, :] >= 0.0) & (
                        state[2:3, :] < tub0 - kill_eps
                    )
                    state[0:1, :] = jnp.where(killed, -1.0, state[0:1, :])

        if do_kill:
            live = jnp.sum((state[0:1, :] >= 0.0).astype(jnp.int32))

        # ---- push inner children far-to-near (descending entry t) ----
        slots = [
            (
                jnp.where(entered[w] & (kinds[w] < 1.5), keys[w], -2.0),
                nrow[0, 7 * W + w],
            )
            for w in range(W)
        ]
        net = _NETS.get(W) or [
            (i, j) for i in range(W) for j in range(i + 1, W)
        ]
        for i, j in net:
            a, b = slots[i], slots[j]
            sw = a[0] < b[0]
            slots[i] = (jnp.where(sw, b[0], a[0]), jnp.where(sw, b[1], a[1]))
            slots[j] = (jnp.where(sw, a[0], b[0]), jnp.where(sw, a[1], b[1]))

        for key_w, tgt_w in slots:
            act = key_w > -2.0
            idx = jnp.where(act, sp, STACK_CAP - 1)
            stack[idx] = jnp.where(
                act, tgt_w.astype(jnp.int32), stack[STACK_CAP - 1]
            )
            sp = sp + act.astype(jnp.int32)

        return (sp, live, visits + 1)

    sp, live, visits = jax.lax.while_loop(cond, body, (1, live0, 0))

    prim_row = state[1:2, :]
    out_ref[0:1, :] = jnp.where(prim_row >= 0.0, state[2:3, :], T_NO_LIMIT)
    out_ref[1:2, :] = prim_row
    out_ref[2:3, :] = jnp.zeros((1, C), jnp.float32) + visits.astype(
        jnp.float32
    )
    out_ref[3:4, :] = jnp.zeros((1, C), jnp.float32)


_INTERPRET = False


def trace_closest_packets(
    scene: FlatScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    valid: jnp.ndarray,
    t_limit: jnp.ndarray = None,
    kill_eps: float = 1e-3,
) -> WaveTraceResult:
    """Closest-hit / shadow traversal for N rays via packet DFS.

    Returns t (inf on miss), prim (-1 on miss), dropped (always 0 —
    this design has no queues to overflow).  Shadow passes (t_limit)
    never record hits beyond the limit: misses and beyond-light hits
    both come back as prim=-1 / t=inf, which the pass condition
    ``t > maxT - eps`` (src/cudaRenderer.cu:1279) treats identically
    to the reference.
    """
    bvh = scene.bvh
    W = bvh.width
    N_in = o.shape[0]
    npad = (-N_in) % C
    N = N_in + npad
    assert N < (1 << 24)

    vmask = valid[:, None]
    o_sane = jnp.where(vmask, o.astype(jnp.float32), 2e30)
    d_sane = jnp.where(vmask, d.astype(jnp.float32), 1.0)
    if t_limit is None:
        tub = jnp.full((N_in,), T_NO_LIMIT, jnp.float32)
        do_kill = False
    else:
        tub = jnp.minimum(t_limit.astype(jnp.float32), T_NO_LIMIT)
        do_kill = True
    tub = jnp.where(valid, tub, -1.0)

    payload = jnp.concatenate(
        [o_sane.T, d_sane.T, jnp.zeros((1, N_in), jnp.float32),
         tub[None, :]],
        axis=0,
    )
    if npad:
        pad = jnp.zeros((8, npad), jnp.float32).at[7, :].set(-1.0)
        pad = pad.at[3:6, :].set(1.0)
        payload = jnp.concatenate([payload, pad], axis=1)

    grid = N // C
    out = pl.pallas_call(
        functools.partial(
            _dfs_kernel, width=W, do_kill=do_kill, kill_eps=kill_eps
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bvh.node_dfs.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bvh.prim_groups.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, C), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((48, 128), jnp.float32),
            pltpu.VMEM((3, C), jnp.float32),
            pltpu.SMEM((STACK_CAP,), jnp.int32),
        ],
        interpret=_INTERPRET,
    )(payload, bvh.node_dfs, bvh.prim_groups)

    t = out[0, :N_in]
    prim = out[1, :N_in].astype(jnp.int32)
    return WaveTraceResult(
        t=jnp.where(prim >= 0, t, jnp.float32(jnp.inf)),
        prim=prim,
        dropped=jnp.int32(0),
    )

"""Conservative closest-hit seeding against the K largest primitives.

A brute-force intersection test against ANY subset of the scene yields
a valid upper bound on each ray's closest hit.  Testing every ray
against the K largest-area primitives (walls / floor / ceiling / light
panels in box-like scenes) is dense, divergence-free VPU work — one
fused sweep over the ray arrays with the K rows unrolled — and in such
scenes most rays' seed IS their final hit.  The wavefront backend
(ops/pallas/wavefront2.py) threads the seed in as the initial carried
upper bound t_ub (payload row 7):

* child boxes whose entry t exceeds the seed are pruned at EVERY
  level, shrinking the count/pack queues from the root down;
* the kernel logs only strictly-improving hits, so rays whose seed is
  final log NOTHING — the hit-log merge (half of a wavefront pass at
  full liveness) collapses to the rays that actually see geometry
  closer than the big-prim hull;
* shadow rays whose seed already lands short of the light are answered
  before traversal (t_ub = -1 kills the lane at entry).

Exactness: the formulas below are copied from the pack kernel's leaf
test (wavefront2._pack_kernel), but this sweep fuses separately, so
the seed t can drift from the kernel's t for the same prim by ~1 ulp
(measured 0.6% of rays at <= 3e-7 relative — the same FMA-contraction
drift the kernel-vs-oracle parity tests tolerate).  The pruning
invariant (t_ub >= a real hit t, up to rounding) keeps results within
float rounding of the unseeded trace; seeded runs are never biased,
just rounded differently.  There is no reference analog: the CUDA
renderer's SIMT warps absorb divergence instead
(src/cudaRenderer.cu:978-1003 gates on the evolving minT only).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..render.flatscene import FlatScene


class SeedHits(NamedTuple):
    t: jnp.ndarray      # [N] f32: hit distance, T_NO_LIMIT sentinel on miss
    prim: jnp.ndarray   # [N] i32: BVH-order prim id, -1 on miss


#: matches wavefront2.T_NO_LIMIT — keep in sync
_T_NONE = jnp.float32(1e30)


def seed_hits(scene: FlatScene, o, d, valid, k: int = 32) -> SeedHits:
    """Closest hit among the first ``k`` seed rows of ``scene`` for each
    ray.  o, d: [N, 3] f32; valid: [N] bool.  Rows are area-descending
    (flatscene.flatten_scene), so k < K keeps the biggest occluders.
    """
    rows = scene.seed_rows
    if rows is None:
        n = o.shape[0]
        return SeedHits(
            jnp.full((n,), _T_NONE, jnp.float32),
            jnp.full((n,), -1, jnp.int32),
        )
    k = min(int(k), rows.shape[0])
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    best_t = jnp.full(ox.shape, _T_NONE, jnp.float32)
    best_p = jnp.full(ox.shape, -1.0, jnp.float32)
    for i in range(k):  # static unroll: XLA fuses into one VPU sweep
        r = rows[i]
        v0x, v0y, v0z = r[0], r[1], r[2]
        v1x, v1y, v1z = r[3], r[4], r[5]
        v2x, v2y, v2z = r[6], r[7], r[8]
        is_sph = r[9] > 0.5
        pid = r[10]
        # triangle plane + half-plane tests (same op order as the pack
        # kernel's leaf stage and intersectRayTriangle, cu:217-270)
        e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
        e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
        nx = e1y * e2z - e1z * e2y
        ny = e1z * e2x - e1x * e2z
        nz = e1x * e2y - e1y * e2x
        denom = nx * dx + ny * dy + nz * dz
        parallel = jnp.abs(denom) < 1e-6
        dplane = nx * v0x + ny * v0y + nz * v0z
        t_tri = (dplane - (nx * ox + ny * oy + nz * oz)) / jnp.where(
            parallel, 1.0, denom
        )
        px = ox + t_tri * dx
        py = oy + t_tri * dy
        pz = oz + t_tri * dz

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
        # sphere (center v0, radius v1.x) — quadratic, near root first
        radius = v1x
        ocx, ocy, ocz = ox - v0x, oy - v0y, oz - v0z
        a_q = dx * dx + dy * dy + dz * dz
        b_q = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
        c_q = ocx * ocx + ocy * ocy + ocz * ocz - radius * radius
        disc = b_q * b_q - 4.0 * a_q * c_q
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        ts1 = (-b_q - sq) / (2.0 * a_q)
        ts2 = (-b_q + sq) / (2.0 * a_q)
        t_sph = jnp.where(ts1 > 0, ts1, ts2)
        ok_sph = (disc >= 0) & (t_sph > 0)

        t_i = jnp.where(is_sph, t_sph, t_tri)
        ok = jnp.where(is_sph, ok_sph, ok_tri)
        better = ok & (t_i < best_t)
        best_p = jnp.where(better, pid, best_p)
        best_t = jnp.where(better, t_i, best_t)
    best_t = jnp.where(valid, best_t, _T_NONE)
    best_p = jnp.where(valid, best_p, -1.0)
    return SeedHits(best_t, best_p.astype(jnp.int32))

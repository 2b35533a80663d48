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
from .intersect import packed_prim_test


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
        pid = r[22]
        # the shared precomputed-table test (same op order as every
        # traversal backend's leaf stage; seed rows mirror prim_packed
        # cols 0:22 — flatscene.flatten_scene)
        ok, t_i = packed_prim_test(
            ox, oy, oz, dx, dy, dz,
            r[10], r[11], r[12], r[13],
            r[14], r[15], r[16], r[17],
            r[18], r[19], r[20], r[21],
            r[9],
        )
        better = ok & (t_i < best_t)
        best_p = jnp.where(better, pid, best_p)
        best_t = jnp.where(better, t_i, best_t)
    best_t = jnp.where(valid, best_t, _T_NONE)
    best_p = jnp.where(valid, best_p, -1.0)
    return SeedHits(best_t, best_p.astype(jnp.int32))

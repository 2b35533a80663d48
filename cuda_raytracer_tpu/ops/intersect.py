"""Batched ray/primitive intersection tests (jnp, float32).

Vectorized equivalents of the reference device tests: the AABB slab
test (intersectBBox, src/cudaRenderer.cu:154-207 — returns the entry t,
0 when the origin is inside, -1 on miss) and the plane + inside-outside
triangle test (intersectRayTriangle, src/cudaRenderer.cu:217-270 —
returns t >= 0 on hit, negative codes on miss), plus the analytic
sphere test the reference lacked (src/static_scene/sphere.cpp stubs).

All functions broadcast over leading batch dimensions and are built
from dense elementwise math so XLA maps them straight onto the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

MISS = jnp.float32(-1.0)


def intersect_bbox(o, d, bmin, bmax):
    """Slab test.  o, d: [..., 3]; bmin, bmax: [..., 3] broadcastable.

    Returns entry t: 0 if origin inside the box, -1 on miss, else the
    positive slab entry distance (matching intersectBBox's contract —
    note the reference returns tmin even when the box is fully behind
    the ray; callers gate on t >= 0, making behind-boxes a miss there
    and here).
    """
    inv = 1.0 / d  # IEEE inf handles axis-parallel rays like CUDA does
    t0 = (bmin - o) * inv
    t1 = (bmax - o) * inv
    tnear = jnp.minimum(t0, t1)
    tfar = jnp.maximum(t0, t1)
    tmin = jnp.max(tnear, axis=-1)
    tmax = jnp.min(tfar, axis=-1)
    inside = jnp.all((o >= bmin) & (o <= bmax), axis=-1)
    hit = tmin <= tmax
    t = jnp.where(hit, tmin, MISS)
    t = jnp.where(inside, 0.0, t)
    # fully-behind boxes: tmin < 0 with tmax < 0 -> miss; straddling
    # (tmin<0<tmax) can't happen unless inside, already handled
    t = jnp.where(hit & (tmax < 0.0), MISS, t)
    return t


def intersect_triangle(o, d, v0, v1, v2, eps: float = 1e-6):
    """Plane + half-plane triangle test (intersectRayTriangle semantics:
    parallel/outside/behind -> negative, else plane distance t).

    o, d: [..., 3] rays; v0, v1, v2: [..., 3] triangle vertices
    (broadcastable against the rays).  Returns t with t < 0 for misses.
    """
    n = jnp.cross(v1 - v0, v2 - v0)
    denom = jnp.sum(n * d, axis=-1)
    parallel = jnp.abs(denom) < eps
    t = (jnp.sum(n * v0, axis=-1) - jnp.sum(n * o, axis=-1)) / jnp.where(
        parallel, 1.0, denom
    )
    p = o + t[..., None] * d
    inside = (
        (jnp.sum(n * jnp.cross(v1 - v0, p - v0), axis=-1) >= 0)
        & (jnp.sum(n * jnp.cross(v2 - v1, p - v1), axis=-1) >= 0)
        & (jnp.sum(n * jnp.cross(v0 - v2, p - v2), axis=-1) >= 0)
    )
    ok = (~parallel) & inside & (t >= 0)
    return jnp.where(ok, t, MISS)


def intersect_sphere(o, d, center, radius):
    """Quadratic sphere test; returns nearest positive t or -1."""
    oc = o - center
    a = jnp.sum(d * d, axis=-1)
    b = 2.0 * jnp.sum(oc * d, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - 4.0 * a * c
    ok = disc >= 0
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)
    t = jnp.where(t1 > 0, t1, t2)
    return jnp.where(ok & (t > 0), t, MISS)


def intersect_prim(o, d, prim_type, v0, v1, v2):
    """Tagged primitive test: triangles (type 0) and spheres (type 1,
    center in v0, radius in v1[...,0]).  Dense compute of both tests +
    select keeps the VPU path branch-free."""
    t_tri = intersect_triangle(o, d, v0, v1, v2)
    t_sph = intersect_sphere(o, d, v0, v1[..., 0])
    return jnp.where(prim_type == 0, t_tri, t_sph)

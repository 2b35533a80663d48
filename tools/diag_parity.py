"""Diagnose the packet-DFS vs XLA-oracle hit/miss mismatches on the
real chip (VERDICT r3 task 1).

For every disagreeing ray, recompute the intersection against every
scene primitive in float64 on the host with BOTH formulations
(Moller-Trumbore, as the DFS kernel computes it, and plane+half-plane,
as the oracle / wavefront2 compute it) and report how far inside /
outside the triangle the f64 hit point lies.  A mismatch whose f64
barycentric margin is ~0 is an edge-grazing ray where f32 rounding
legitimately flips the verdict; anything else is a real kernel bug.

Usage: python tools/diag_parity.py
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

SCENE = "/root/reference/media/pathtracer/advanced/CBbunny.dae"


def build():
    from cuda_raytracer_tpu.config import RenderConfig
    from cuda_raytracer_tpu.render.engine import WavefrontRenderer

    cfg = RenderConfig(width=320, height=240, samples_per_frame=2,
                       tree_width=8, max_leaf_size=16, traversal="xla")
    r = WavefrontRenderer(cfg, camera_mode="collada")
    r.load_scene(SCENE)
    return r


def rays(r, n, seed=0):
    from cuda_raytracer_tpu.ops import shade as S

    cfg = r.config
    key = jax.random.PRNGKey(seed)
    o, d = S.generate_camera_rays(
        key, cfg.width, cfg.height, cfg.samples_per_frame,
        jnp.asarray(r.camera.pos, jnp.float32),
        jnp.asarray(r.camera.c2w, jnp.float32),
        math.tan(math.radians(r.camera.hFov) / 2),
        math.tan(math.radians(r.camera.vFov) / 2),
    )
    return o[:n], d[:n]


def brute_f64(scene, o, d):
    """Best hit over all prims in f64, both formulations, plus the
    minimum edge margin of the best MT hit (u, v, 1-u-v in units of
    barycentric coordinates)."""
    v0 = np.asarray(scene.v0, np.float64)
    v1 = np.asarray(scene.v1, np.float64)
    v2 = np.asarray(scene.v2, np.float64)
    ptype = np.asarray(scene.prim_type)
    tri = ptype == 0
    v0, v1, v2 = v0[tri], v1[tri], v2[tri]
    o = o.astype(np.float64)
    d = d.astype(np.float64)
    e1, e2 = v1 - v0, v2 - v0
    p = np.cross(d[None, :], e2)
    det = np.einsum("ij,ij->i", e1, p)
    safe = np.where(np.abs(det) < 1e-300, 1.0, det)
    tv = o[None, :] - v0
    u = np.einsum("ij,ij->i", tv, p) / safe
    q = np.cross(tv, e1)
    v = np.einsum("j,ij->i", d, q) / safe
    t = np.einsum("ij,ij->i", e2, q) / safe
    ok = (np.abs(det) > 0) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= 0)
    t_ok = np.where(ok, t, np.inf)
    best = int(np.argmin(t_ok))
    margin_all = np.minimum(np.minimum(u, v), 1.0 - u - v)
    # nearest "almost hit": smallest |margin| among prims whose t>=0
    near = (t >= 0) & (np.abs(det) > 1e-30)
    near_margin = np.where(near, margin_all, -np.inf)
    j = int(np.argmax(near_margin))
    ndotd = None
    if np.isfinite(t_ok[best]) or True:
        n = np.cross(e1[j], e2[j])
        ndotd = float(np.dot(n, d))
    return (
        t_ok[best] if np.isfinite(t_ok[best]) else None,
        float(near_margin[j]),
        j,
        ndotd,
        float(t[j]),
    )


def main():
    from cuda_raytracer_tpu.ops.pallas.packet_dfs import trace_closest_packets
    from cuda_raytracer_tpu.ops.traverse import trace_closest

    r = build()
    o, d = rays(r, 64 * 1024)
    valid = jnp.ones((o.shape[0],), bool)
    res = jax.jit(trace_closest_packets)(r.scene, o, d, valid)
    ref = trace_closest(r.scene, o, d, valid)
    pa, pb = np.asarray(res.prim), np.asarray(ref.prim)
    ta, tb = np.asarray(res.t), np.asarray(ref.t)
    mism = np.nonzero((pa < 0) != (pb < 0))[0]
    print(f"hit/miss mismatches: {len(mism)} / {len(pa)}")
    on = np.asarray(o)
    dn = np.asarray(d)
    for i in mism[:40]:
        tbest, margin, j, ndotd, tj = brute_f64(r.scene, on[i], dn[i])
        who = "dfs-hit" if pa[i] >= 0 else "oracle-hit"
        print(
            f"ray {i}: {who} dfs(prim={pa[i]},t={ta[i]:.6g}) "
            f"ora(prim={pb[i]},t={tb[i]:.6g}) | f64 best t="
            f"{'miss' if tbest is None else f'{tbest:.6g}'} "
            f"edge-margin={margin:.3e} (prim {j}, n.d={ndotd:.3e}, "
            f"t={tj:.4g})"
        )
    both = (pa >= 0) & (pb >= 0)
    dt = np.abs(ta[both] - tb[both])
    print(f"both-hit: {both.sum()}, max |dt| = {dt.max():.3e}, "
          f"prim agree = {np.mean(pa[both] == pb[both]):.5f}")


if __name__ == "__main__":
    main()

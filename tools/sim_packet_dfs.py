"""Simulate packet-union DFS traversal on CBbunny to predict TPU kernel
cost before building it.

Design under test: rays grouped in fixed packets of C consecutive ids;
each packet DFS-traverses the wide BVH once (stack of node ids), testing
all C lanes against each visited node's child boxes, descending into any
child that ANY live lane enters (union semantics — correct because each
lane's true path is a subset of the union).  Per-lane best-t (tub)
prunes lanes; a child is visited only if some lane's box-entry t beats
its tub.  Leaf children intersect inline.

Counts inner/leaf visits per packet for primary, NEE-shadow, and
bounce-scatter ray sets, and converts to a VPU-cycle estimate.
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax


def load_scene(path):
    from cuda_raytracer_tpu.render.engine import WavefrontRenderer
    from cuda_raytracer_tpu.config import RenderConfig

    cfg = RenderConfig(width=800, height=600, samples_per_frame=1,
                       max_depth=2, traversal="xla")
    r = WavefrontRenderer(cfg, camera_mode="cutracer")
    r.load_scene(path)
    return r


def ray_sets(r):
    """primary, shadow (depth-0 NEE), bounce (depth-1 scatter) rays."""
    import jax.numpy as jnp
    from cuda_raytracer_tpu.ops import shade as S
    from cuda_raytracer_tpu.ops.traverse import trace_closest

    key = jax.random.PRNGKey(15618)
    cfg = r.config
    o, d = S.generate_camera_rays_cutracer(
        key, cfg.width, cfg.height, cfg.samples_per_frame,
        *r.cutracer_camera.as_arrays())
    valid = jnp.ones(o.shape[0], bool)
    res = trace_closest(r.scene, o, d, valid)
    hit = S.compute_hits(r.scene, o, d, res.t, res.prim, 1e-3)
    u = jax.random.uniform(jax.random.fold_in(key, 7), (o.shape[0], 2))
    o_s, d_s, max_t, li, ok = S.nee_shadow_rays(r.scene, hit,
                                                jnp.ones_like(o), 0, u, 1.0)
    imp = jnp.ones_like(o)
    o_b, d_b, imp2, valid_b, _ = S.scatter(
        r.scene, hit, imp, jax.random.fold_in(key, 9))
    sets = {
        "primary": (np.asarray(o), np.asarray(d), np.asarray(valid),
                    np.full(o.shape[0], np.inf)),
        "shadow": (np.asarray(o_s), np.asarray(d_s), np.asarray(ok),
                   np.asarray(max_t)),
        "bounce": (np.asarray(o_b), np.asarray(d_b), np.asarray(valid_b),
                   np.full(o.shape[0], np.inf)),
    }
    return sets


def sim_traversal(scene_np, o, d, valid, t_lim, C, shadow=False,
                  near_first=True):
    """Packet DFS; returns (inner_visits, leaf_visits, leaf_prims,
    t_best, prim_best)."""
    (outlets, cmin, cmax, leaf_start, leaf_range, v0, v1, v2, ptype) = scene_np
    W = outlets.shape[1]
    N = len(o)
    nC = (N + C - 1) // C
    pad = nC * C - N
    if pad:
        o = np.concatenate([o, np.zeros((pad, 3))])
        d = np.concatenate([d, np.ones((pad, 3))])
        valid = np.concatenate([valid, np.zeros(pad, bool)])
        t_lim = np.concatenate([t_lim, np.zeros(pad)])

    inner_v = np.zeros(nC, np.int64)
    leaf_v = np.zeros(nC, np.int64)
    leaf_p = np.zeros(nC, np.int64)
    t_out = np.full(nC * C, np.inf)
    p_out = np.full(nC * C, -1, np.int64)

    for c in range(nC):
        sl = slice(c * C, (c + 1) * C)
        oc, dc = o[sl], d[sl]
        with np.errstate(divide="ignore"):
            inv = 1.0 / dc
        tub = np.where(valid[sl], np.minimum(t_lim[sl], 1e30), -1.0)
        prim = np.full(C, -1, np.int64)
        alive = tub >= 0
        stack = [0]
        while stack:
            node = stack.pop()
            if not alive.any():
                break
            inner_v[c] += 1
            # test W children
            entries = []
            for w in range(W):
                ch = outlets[node, w]
                if ch < 0:
                    continue
                mn, mx = cmin[node, w], cmax[node, w]
                t0 = (mn[None, :] - oc) * inv
                t1 = (mx[None, :] - oc) * inv
                tn = np.minimum(t0, t1).max(1)
                tf = np.maximum(t0, t1).min(1)
                inside = ((oc >= mn) & (oc <= mx)).all(1)
                ok = ((tn <= tf) & (tf >= 0) & (tn <= tub)) | inside
                ok &= alive
                if ok.any():
                    entries.append((np.where(inside, 0.0, tn)[ok].min(),
                                    ch, ok))
            if near_first:
                entries.sort(key=lambda e: -e[0])  # far first = popped last
            for _, ch, ok in entries:
                if leaf_range[ch] > 0:
                    leaf_v[c] += 1
                    s, n = leaf_start[ch], leaf_range[ch]
                    leaf_p[c] += n
                    # vectorized prim tests [C, n]
                    a, b2, c2 = v0[s:s+n], v1[s:s+n], v2[s:s+n]
                    nrm = np.cross(b2 - a, c2 - a)
                    denom = dc @ nrm.T
                    with np.errstate(divide="ignore", invalid="ignore"):
                        t_t = ((nrm * a).sum(1)[None] - oc @ nrm.T) / denom
                        p = oc[:, None] + t_t[..., None] * dc[:, None]
                        i0 = np.einsum("cnk,nk->cn",
                                       np.cross(b2 - a, p - a), nrm) >= 0
                        i1 = np.einsum("cnk,nk->cn",
                                       np.cross(c2 - b2, p - b2), nrm) >= 0
                        i2 = np.einsum("cnk,nk->cn",
                                       np.cross(a - c2, p - c2), nrm) >= 0
                        okt = (np.abs(denom) > 1e-12) & i0 & i1 & i2 & (t_t >= 0)
                    t_t = np.where(okt, t_t, np.inf)
                    k = t_t.argmin(1)
                    tk = t_t[np.arange(C), k]
                    better = (tk < tub) & alive
                    tub = np.where(better, tk, tub)
                    prim = np.where(better, k + s, prim)
                    if shadow:
                        killed = better & (tk < t_lim[sl] - 1e-3)
                        alive &= ~killed
                else:
                    stack.append(ch)
        t_out[sl] = tub
        p_out[sl] = prim
    return inner_v, leaf_v, leaf_p, t_out, p_out


def main():
    dae = "/root/reference/media/pathtracer/advanced/CBbunny.dae"
    r = load_scene(dae)
    s = r.scene
    scene_np = (
        np.asarray(s.bvh.outlets), np.asarray(s.bvh.child_min),
        np.asarray(s.bvh.child_max), np.asarray(s.bvh.leaf_start),
        np.asarray(s.bvh.leaf_range), np.asarray(s.v0), np.asarray(s.v1),
        np.asarray(s.v2), np.asarray(s.prim_type),
    )
    nodes = len(scene_np[0])
    nlevels = len(s.bvh.levels)
    print(f"scene: {s.num_prims} prims, {nodes} wide nodes, "
          f"{nlevels} levels, W={s.bvh.width}, max_leaf={s.bvh.max_leaf}")

    sets = ray_sets(r)
    # subsample for sim speed: take a band of packets across the frame
    for C in (256, 1024):
        print(f"\n=== packet C={C} ===")
        for name, (o, d, valid, tl) in sets.items():
            N = len(o)
            nC = N // C
            take = np.linspace(0, nC - 1, min(nC, 64)).astype(int)
            idx = (take[:, None] * C + np.arange(C)[None]).reshape(-1)
            t0 = time.time()
            iv, lv, lp, tb, pb = sim_traversal(
                scene_np, o[idx], d[idx], valid[idx], tl[idx], C,
                shadow=(name == "shadow"))
            dt = time.time() - t0
            # VPU cost model: inner visit = W*38 ops on [C] lanes;
            # leaf visit = per-8-prim group 70 ops on [C] lanes; plus
            # 100 cycles/visit fixed (stack, bookkeeping, DMA waits)
            vr = C / 1024  # vregs per [1,C] row
            cyc = (iv.sum() * (4 * 38 * vr + 100)
                   + lv.sum() * 100 + lp.sum() / 8 * 70 * vr)
            us = cyc / 940  # 0.94 GHz
            per_ray = us / (len(take) * C)
            full_ms = per_ray * N / 1e3
            print(f"  {name:8s}: inner/packet={iv.mean():7.1f} "
                  f"leaf/packet={lv.mean():6.1f} prims/packet={lp.mean():7.0f} "
                  f"-> est {full_ms:6.2f} ms/traversal "
                  f"({N/ (full_ms/1e3) / 1e6:6.1f} Mrays/s) [sim {dt:.1f}s]")


if __name__ == "__main__":
    main()

"""Compare engine vs oracle NEE on MATCHED hit points.

Takes primary hits from the engine machinery, then estimates direct
lighting at those exact points two ways with many samples each:
  * engine path: S.nee_shadow_rays + trace + pass condition
  * oracle path: sample_L + occlusion + contrib formula (numpy)
Prints mean contributions split by surface (sphere vs wall) and
pass/occlusion rates.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cuda_raytracer_tpu.models.cornell import cornell_box_scene
from cuda_raytracer_tpu.render.flatscene import flatten_scene, PRIM_SPHERE
from cuda_raytracer_tpu.ops import shade as S
from cuda_raytracer_tpu.ops.traverse import trace_closest
from cuda_raytracer_tpu.render.pathtracer import PathTracer
from cuda_raytracer_tpu.scene.camera import Camera

W, H = 32, 24
K = 32  # sample rounds


def camera():
    cam = Camera()
    cam.ar = W / H
    cam.pos = np.array([0.0, 0.75, 2.5])
    target = np.array([0.0, 0.75, 0.0])
    back = cam.pos - target
    back /= np.linalg.norm(back)
    right = np.cross(np.array([0.0, 1.0, 0.0]), back)
    right /= np.linalg.norm(right)
    up = np.cross(back, right)
    cam.c2w = np.stack([right, up, back], axis=1)
    return cam


def main():
    sscene = cornell_box_scene(with_spheres=True)
    scene, _ = flatten_scene(sscene)
    cam = camera()
    key = jax.random.PRNGKey(1)

    # fixed primary rays through pixel centers
    i = np.arange(W * H)
    x = ((i % W) + 0.5) / W
    y = 1.0 - ((i // W) + 0.5) / H
    o_np, d_np = cam.generate_rays(x, y)
    o = jnp.asarray(o_np, jnp.float32)
    d = jnp.asarray(d_np, jnp.float32)
    valid = jnp.ones(W * H, bool)
    res = trace_closest(scene, o, d, valid)
    hit = S.compute_hits(scene, o, d, res.t, res.prim, 1e-3)
    imp = jnp.ones((W * H, 3), jnp.float32)

    # --- engine NEE estimate over K rounds ---
    eng = np.zeros((W * H, 3))
    eng_pass = np.zeros(W * H)
    for k in range(K):
        u = jax.random.uniform(jax.random.fold_in(key, k), (W * H, 2),
                               dtype=jnp.float32)
        o_s, d_s, max_t, li, ok = S.nee_shadow_rays(scene, hit, imp, 0, u, 1.0)
        res_s = trace_closest(scene, o_s, d_s, ok)
        passes = np.asarray(res_s.t > max_t - 1e-3) & np.asarray(ok)
        eng += np.asarray(li) * passes[:, None]
        eng_pass += passes
    eng /= K
    eng_pass /= K

    # --- oracle NEE on the same points ---
    pt_exact = o_np + np.asarray(res.t)[:, None] * d_np
    nrm = np.asarray(hit.n)
    pidx = np.asarray(res.prim)
    hitm = pidx >= 0

    ptr = PathTracer(ns_aa=1, max_ray_depth=1)
    ptr.set_scene(sscene)
    f = ptr._flat
    bidx = f["prim_bsdf"][np.clip(pidx, 0, None)]
    albedo = f["bsdf_albedo"][bidx]
    fn = f["bsdf_fn"][bidx]
    sl = sscene.lights[0]
    rng = np.random.default_rng(7)
    orc = np.zeros((W * H, 3))
    orc_pass = np.zeros(W * H)
    n = W * H
    for k in range(K):
        rad = np.zeros((n, 3))
        wi = np.zeros((n, 3))
        dist = np.full(n, np.inf)
        pdf = np.ones(n)
        for i2 in np.where(hitm)[0]:
            r_, w_, dl, pf = sl.sample_L(pt_exact[i2], rng)
            rad[i2], wi[i2], dist[i2], pdf[i2] = r_, w_, dl, pf
        cos_s = np.abs((nrm * wi).sum(1))
        contrib = (albedo / np.pi * (cos_s / np.maximum(pdf, 1e-12))[:, None]
                   * rad)
        active = hitm & (fn == 0) & (rad.sum(1) > 0) & (cos_s > 1e-4)
        occ = np.ones(n, bool)
        if active.any():
            occ[active] = ptr._occluded(
                pt_exact[active] + nrm[active] * 1e-3, wi[active],
                dist[active])
        add = active & ~occ
        orc += np.where(add[:, None], contrib, 0.0)
        orc_pass += add
    orc /= K
    orc_pass /= K

    is_sph = np.asarray(scene.prim_type)[np.clip(pidx, 0, None)] == PRIM_SPHERE
    groups = {
        "all": hitm,
        "spheres": hitm & is_sph,
        "walls": hitm & ~is_sph,
    }
    for name, m in groups.items():
        if not m.any():
            continue
        print(f"{name:8s}: engine={eng[m].mean():.5f} oracle={orc[m].mean():.5f} "
              f"ratio={eng[m].mean()/max(orc[m].mean(),1e-12):.4f}  "
              f"pass eng={eng_pass[m].mean():.3f} orc={orc_pass[m].mean():.3f}")

    # largest per-pixel ratios
    tot_e = eng.sum(1)
    tot_o = orc.sum(1)
    both = hitm & (tot_o > 1e-6)
    ratio = np.where(both, tot_e / np.maximum(tot_o, 1e-12), 1.0)
    bad = np.argsort(-np.abs(np.log(np.maximum(ratio, 1e-9))))[:10]
    for b in bad:
        print(f"  pix {b} ({b%W},{b//W}): eng={tot_e[b]:.4f} orc={tot_o[b]:.4f} "
              f"ratio={ratio[b]:.3f} sph={bool(is_sph[b])} "
              f"pass={eng_pass[b]:.2f}/{orc_pass[b]:.2f} n={nrm[b]}")


if __name__ == "__main__":
    main()

"""Sim: how much does packet coherence improve with spp/frame and
tile-swizzled sample order?

Packets are 1024 consecutive rays.  At spp=2 raster order a packet
spans 512 pixels of one row; at spp=16 with 8x8 pixel tiles it spans a
single 8x8 tile.  Counts union visits for primary / shadow / bounce.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sim_packet_dfs import sim_traversal


def main():
    from cuda_raytracer_tpu.render.engine import WavefrontRenderer
    from cuda_raytracer_tpu.config import RenderConfig
    from cuda_raytracer_tpu.ops import shade as S
    from cuda_raytracer_tpu.ops.traverse import trace_closest

    dae = "/root/reference/media/pathtracer/advanced/CBbunny.dae"
    W_img, H_img = 800, 600

    for tw, ml in ((8, 16),):
        cfg = RenderConfig(width=W_img, height=H_img, samples_per_frame=1,
                           max_depth=2, traversal="xla", tree_width=tw,
                           max_leaf_size=ml)
        r = WavefrontRenderer(cfg, camera_mode="cutracer")
        r.load_scene(dae)
        s = r.scene
        scene_np = (
            np.asarray(s.bvh.outlets), np.asarray(s.bvh.child_min),
            np.asarray(s.bvh.child_max), np.asarray(s.bvh.leaf_start),
            np.asarray(s.bvh.leaf_range), np.asarray(s.v0),
            np.asarray(s.v1), np.asarray(s.v2), np.asarray(s.prim_type),
        )
        print(f"=== W={tw} ml={ml} ===")
        for spp, tile in ((2, 1), (16, 8)):
            # tile-swizzled pixel order: tiles of tile x tile pixels,
            # samples of one pixel consecutive
            ty, tx = H_img // tile, W_img // tile
            py, px = np.meshgrid(np.arange(H_img), np.arange(W_img),
                                 indexing="ij")
            order = (py // tile) * tx * tile * tile \
                + (px // tile) * tile * tile \
                + (py % tile) * tile + (px % tile)
            inv = np.argsort(order.reshape(-1))
            pix = inv  # pixel index for each tile-ordered position
            n = W_img * H_img * spp
            rng = np.random.default_rng(1)
            u = rng.random((n, 2))
            pidx = np.repeat(pix, spp)
            x = ((pidx % W_img) + u[:, 0]) / W_img
            y = ((pidx // W_img) + u[:, 1]) / H_img
            key = jax.random.PRNGKey(0)
            # cutracer camera basis
            origin, look, up, left = r.cutracer_camera.as_arrays()
            k = np.stack([x - 0.5, y - 0.5, np.ones_like(x)], axis=-1)
            k /= np.linalg.norm(k, axis=1, keepdims=True)
            basis = np.stack([np.asarray(left), np.asarray(up),
                              np.asarray(look)])
            d = (k @ basis).astype(np.float32)
            o = np.broadcast_to(np.asarray(origin, np.float32), d.shape)

            # sample a band of packets
            C = 1024
            nC = n // C
            take = np.linspace(0, nC - 1, 32).astype(int)
            idx = (take[:, None] * C + np.arange(C)[None]).reshape(-1)
            o_s, d_s = o[idx].astype(np.float64), d[idx].astype(np.float64)
            valid = np.ones(len(idx), bool)
            tl = np.full(len(idx), np.inf)
            iv, lv, lp, tb, pb = sim_traversal(
                scene_np, o_s, d_s, valid, tl, C)
            # shadow rays from these hits
            sj = jnp.asarray(o_s, jnp.float32)
            res_t = jnp.asarray(tb, jnp.float32)
            res_p = jnp.asarray(pb, jnp.int32)
            hit = S.compute_hits(s, sj, jnp.asarray(d_s, jnp.float32),
                                 res_t, res_p, 1e-3)
            uu = jax.random.uniform(jax.random.fold_in(key, 3),
                                    (len(idx), 2))
            os_, ds_, mt, li, ok = S.nee_shadow_rays(
                s, hit, jnp.ones((len(idx), 3)), 0, uu, 1.0)
            iv2, lv2, lp2, _, _ = sim_traversal(
                scene_np, np.asarray(os_, np.float64),
                np.asarray(ds_, np.float64), np.asarray(ok),
                np.asarray(mt, np.float64), C, shadow=True)
            # bounce
            ob, db, imp2, vb, _ = S.scatter(
                s, hit, jnp.ones((len(idx), 3)),
                jax.random.fold_in(key, 9))
            iv3, lv3, lp3, _, _ = sim_traversal(
                scene_np, np.asarray(ob, np.float64),
                np.asarray(db, np.float64), np.asarray(vb), tl, C)
            print(f" spp={spp:2d} tile={tile}: "
                  f"prim {iv.mean():6.1f}/{lv.mean():5.1f}/{lp.mean():6.0f}  "
                  f"shad {iv2.mean():6.1f}/{lv2.mean():5.1f}/{lp2.mean():6.0f}  "
                  f"bnce {iv3.mean():6.1f}/{lv3.mean():5.1f}/{lp3.mean():6.0f}"
                  "  (inner/leaf/prims per 1024-packet)")


if __name__ == "__main__":
    main()

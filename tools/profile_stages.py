"""Stage-level wall-time profile at the bench operating point.

Replicates render/bounce.run_depth with a forced device sync after
every stage call (trace / shade_hit / nee_prep / nee_trace / nee_accum
/ scatter), so the ~2.6 s frame can be attributed below the per-depth
level.  Each sync costs one ~25 ms dispatch (probe_sync.py), so read
deltas, not absolutes.

Usage: python tools/profile_stages.py [--spp 32] [--reps 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SCENE = "/root/reference/media/pathtracer/advanced/CBbunny.dae"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from cuda_raytracer_tpu.config import RenderConfig
    from cuda_raytracer_tpu.render.engine import WavefrontRenderer
    from cuda_raytracer_tpu.render import bounce as B

    cfg = RenderConfig(
        width=800, height=600, samples_per_frame=args.spp,
        total_samples=64, max_depth=4,
        nee_schedule=((1, 1.0),) * 4,
        tree_width=4, max_leaf_size=32,
        sample_order="tiles32s", rng_granule=1024,
        rr_start_depth=2, traversal="dfs", traversal_secondary="dfs",
        traversal_rr="pallas",
    )
    r = WavefrontRenderer(cfg, camera_mode="collada")
    r.load_scene(SCENE)
    scene = r.scene

    stages = B.make_stage_fns(cfg)
    J = {
        "trace": jax.jit(stages["trace"]),
        "trace_secondary": jax.jit(stages["trace_secondary"]),
        "trace_secondary_compact": jax.jit(
            stages["trace_secondary_compact"]),
        "shade_hit": jax.jit(stages["shade_hit"]),
        "nee_prep": jax.jit(stages["nee_prep"], static_argnums=(4, 5)),
        "nee_accum": jax.jit(stages["nee_accum"]),
        "scatter": jax.jit(stages["scatter"]),
    }

    from cuda_raytracer_tpu.ops import shade as S
    import math
    cam = r._camera_arrays()
    raygen = jax.jit(lambda key: S.generate_camera_rays(
        key, cfg.width, cfg.height, cfg.samples_per_frame,
        cam[0], cam[1],
        math.tan(math.radians(r.camera.hFov) / 2),
        math.tan(math.radians(r.camera.vFov) / 2),
        pix_order="tiles32s",
    ))

    def sync(x):
        return float(jnp.sum(x[::4096]))

    for rep in range(args.reps):
        key = jax.random.PRNGKey(100 + rep)
        rows = []

        def timed(label, fn, *a, sync_on=None, **kw):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            s = out if sync_on is None else sync_on(out)
            sync(s if isinstance(s, jnp.ndarray) else s[0])
            rows.append((label, time.perf_counter() - t0))
            return out

        o, d = timed("gen", raygen, key)
        n = o.shape[0]
        valid = jnp.ones((n,), bool)
        importance = jnp.ones((n, 3), jnp.float32)
        light = jnp.zeros((n, 3), jnp.float32)
        count_emission = jnp.ones((n,), bool)
        for depth in range(cfg.max_depth):
            if depth == 0:
                tr = J["trace"]
            elif depth >= cfg.rr_start_depth:
                tr = J["trace_secondary_compact"]
            else:
                tr = J["trace_secondary"]
            res = timed(f"d{depth}.trace", tr, scene, o, d, valid,
                        sync_on=lambda r_: r_.t)
            hit, light = timed(
                f"d{depth}.shade", J["shade_hit"], scene, o, d,
                res.t, res.prim, valid, importance, light,
                count_emission, sync_on=lambda hl: hl[1])
            k_d = jax.random.fold_in(key, 1000 + depth)
            k_u = jax.random.fold_in(jax.random.fold_in(k_d, 0), 0)
            prep = timed(f"d{depth}.nee_prep", J["nee_prep"], scene,
                         hit, importance, k_u, 0, 1.0,
                         sync_on=lambda p: p[0])
            o_s, d_s, max_t, li_imp, ok = prep
            res_s = timed(f"d{depth}.nee_trace", tr, scene, o_s, d_s,
                          ok, max_t, sync_on=lambda r_: r_.t)
            light = timed(f"d{depth}.nee_accum", J["nee_accum"], light,
                          res_s.t, res_s.prim, max_t, li_imp, ok)
            if depth + 1 < cfg.max_depth:
                k_b = jax.random.fold_in(key, 2000 + depth)
                o, d, importance, valid, count_emission = timed(
                    f"d{depth}.scatter", J["scatter"], scene, hit,
                    importance, k_b, sync_on=lambda s_: s_[0])
                if depth + 1 >= cfg.rr_start_depth:
                    p = jnp.clip(jnp.max(importance, axis=-1), 0.05, 1.0)
                    u_rr = jax.random.uniform(
                        jax.random.fold_in(key, 3000 + depth), p.shape)
                    valid = valid & (u_rr < p)
                    importance = importance / p[:, None]
        tot = sum(dt for _, dt in rows)
        print("  ".join(f"{k}={dt*1e3:6.0f}" for k, dt in rows), flush=True)
        print(f"  rep {rep} total={tot*1e3:7.1f} ms ({len(rows)} syncs)",
              flush=True)


if __name__ == "__main__":
    main()

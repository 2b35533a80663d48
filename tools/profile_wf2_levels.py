"""Eager per-kernel timing of the wavefront2 pipeline on CBbunny.

Replicates trace_closest_wavefront level by level, blocking after each
pallas_call, so the count/pack cost split per level is visible.
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.render.engine import WavefrontRenderer
from cuda_raytracer_tpu.ops import shade as S
from cuda_raytracer_tpu.ops.pallas import wavefront2 as wf2

SCENE = "/root/reference/media/pathtracer/advanced/CBbunny.dae"


def main():
    cfg = RenderConfig(width=800, height=600, samples_per_frame=2)
    r = WavefrontRenderer(cfg, camera_mode="collada")
    r.load_scene(SCENE)
    scene = r.scene
    key = jax.random.PRNGKey(0)
    o, d = S.generate_camera_rays(
        key, cfg.width, cfg.height, cfg.samples_per_frame,
        jnp.asarray(r.camera.pos, jnp.float32),
        jnp.asarray(r.camera.c2w, jnp.float32),
        math.tan(math.radians(r.camera.hFov) / 2),
        math.tan(math.radians(r.camera.vFov) / 2),
    )
    N_in = o.shape[0]
    valid = jnp.ones((N_in,), bool)

    bvh = scene.bvh
    sched = bvh.wf_sched
    W = bvh.width
    k8 = max(-(-bvh.max_leaf // 8) * 8, 8)
    C = wf2.CHUNK
    npad = (-N_in) % C
    N = N_in + npad

    o_s = jnp.concatenate([o, jnp.zeros((npad, 3), jnp.float32)])
    d_s = jnp.concatenate([d, jnp.zeros((npad, 3), jnp.float32)])
    ray_f = jnp.arange(N_in, dtype=jnp.int32).astype(jnp.float32)
    tub = jnp.full((N_in,), wf2.T_NO_LIMIT, jnp.float32)
    payload = jnp.concatenate(
        [o_s.T, d_s.T,
         jnp.concatenate([ray_f, jnp.zeros((npad,), jnp.float32)])[None, :],
         jnp.concatenate([tub, jnp.full((npad,), -1.0, jnp.float32)])[None, :]],
        axis=0,
    )

    max_next = max((len(lv[0]) for lv in sched[1:]), default=1)
    cap_chunks = -(-2 * N // C) + max_next + 2
    cols = cap_chunks * C
    logcap = 2 * N
    logcols = logcap + C

    queue = payload
    log = jnp.zeros((wf2.LROWS, logcols), jnp.float32)
    cursor = jnp.zeros((1,), jnp.int32)
    seg_base = jnp.zeros((1,), jnp.int32)
    seg_count = jnp.full((1,), N, jnp.int32)

    run_count = jax.jit(wf2._run_count, static_argnums=(7,))
    run_pack = jax.jit(
        wf2._run_pack, static_argnums=(14, 15, 16, 17, 18, 19)
    )

    def tick(x):
        jax.block_until_ready(x)
        return time.perf_counter()

    total = {"count": 0.0, "pack": 0.0, "glue": 0.0}
    for rep in range(2):
        queue = payload
        log = jnp.zeros((wf2.LROWS, logcols), jnp.float32)
        cursor = jnp.zeros((1,), jnp.int32)
        seg_base = jnp.zeros((1,), jnp.int32)
        seg_count = jnp.full((1,), N, jnp.int32)
        if rep == 1:
            total = {"count": 0.0, "pack": 0.0, "glue": 0.0}
        for lvl, (seg_nodes, kind, pair, lstart, lcnt, forced) in enumerate(
            sched
        ):
            S_ = len(seg_nodes)
            Sp = wf2._bucket(S_)
            SWp = Sp * W

            def pad_i32(vals, fill, size):
                a = np.full((size,), fill, np.int32)
                a[: len(vals)] = vals
                return jnp.asarray(a)

            seg_node_a = pad_i32(seg_nodes, 0, Sp)
            ckind_a = pad_i32(kind, 0, SWp)
            clstart_a = pad_i32(lstart, 0, SWp)
            clcnt_a = pad_i32(lcnt, 0, SWp)
            cforce_a = pad_i32(forced, 0, SWp)
            nsegs_a = jnp.asarray([S_], jnp.int32)
            seg_base_p = jnp.zeros((Sp,), jnp.int32).at[:S_].set(seg_base)
            seg_count_p = jnp.zeros((Sp,), jnp.int32).at[:S_].set(seg_count)

            has_inner = any(k == 1 for k in kind)
            live = int(jnp.sum(seg_count))
            t0 = tick(seg_count)
            if has_inner:
                cmask_a = pad_i32([1 if k == 1 else 0 for k in kind], 0, SWp)
                counts = run_count(
                    queue, bvh.node_packed, seg_node_a, seg_base_p,
                    seg_count_p, cmask_a, nsegs_a, W,
                )
                t1 = tick(counts)
                counts_flat = counts[:S_, :W].reshape(-1).astype(jnp.int32)
                pair_np = np.asarray(pair, np.int32)
                S_next = len(sched[lvl + 1][0])
                next_idx = jnp.asarray(
                    np.where(pair_np >= 0, pair_np, S_next).astype(np.int32)
                )
                count_next = (
                    jnp.zeros((S_next + 1,), jnp.int32)
                    .at[next_idx].set(counts_flat)[:S_next]
                )
                chunks_next = (count_next + C - 1) // C
                cum = jnp.cumsum(chunks_next)
                base_next = cum - chunks_next
                fits = cum <= cap_chunks
                count_next = jnp.where(fits, count_next, 0)
                dest_units = jnp.where(
                    fits & (count_next > 0), base_next, -1
                )
                cdest_a = jnp.concatenate(
                    [dest_units, jnp.full((1,), -1, jnp.int32)]
                )[next_idx]
                cdest_a = (
                    jnp.full((SWp,), -1, jnp.int32).at[: S_ * W].set(cdest_a)
                )
                cols_out = cols
                t2 = tick(cdest_a)
            else:
                cdest_a = jnp.full((SWp,), -1, jnp.int32)
                cols_out = C
                t1 = t2 = tick(cdest_a)

            queue_new, log, currow = run_pack(
                queue, bvh.node_packed, scene.prim_packed, log,
                seg_node_a, seg_base_p, seg_count_p, cdest_a, ckind_a,
                clstart_a, clcnt_a, cforce_a, cursor, nsegs_a,
                W, k8, cols_out, False, 1e-3, logcap,
            )
            t3 = tick(currow)
            cursor = currow[0, 0].reshape(1)
            if rep == 1:
                print(f"  lvl {lvl}: S={S_:4d} live={live:8d} "
                      f"count {1e3*(t1-t0):7.2f} ms  glue "
                      f"{1e3*(t2-t1):6.2f} ms  pack {1e3*(t3-t2):7.2f} ms")
            total["count"] += t1 - t0
            total["glue"] += t2 - t1
            total["pack"] += t3 - t2
            if not has_inner:
                break
            queue = queue_new
            seg_base = base_next.astype(jnp.int32)
            seg_count = count_next.astype(jnp.int32)

    print("cursor:", int(cursor[0]), "of logcap", logcap)
    print({k: f"{v*1e3:.1f} ms" for k, v in total.items()})


if __name__ == "__main__":
    main()

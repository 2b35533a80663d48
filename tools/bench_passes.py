"""Per-pass x per-backend traversal timing at the BENCH operating point.

VERDICT r2 item 1: the backend crossover was only ever measured on the
coherent camera pass; the frame is dominated by incoherent bounce and
depth>=1 shadow passes.  This tool captures the ACTUAL ray populations
of every traversal in one bench-shaped frame (CBbunny 800x600, spp=16,
tiles8, depth 4, NEE 1x1.0 per depth, RR@2) by running the frame once
with a recording trace wrapper, then times each backend on each
captured pass.

Also times two payload reorderings of each incoherent pass to bound the
value of compaction/binning before building the kernel for it:
  * dead-last: stable partition, live lanes first (task-2 upper bound)
  * binned: dead-last, live lanes by direction octant + origin Morton
    (task-3 upper bound)

Usage: python tools/bench_passes.py [--backends dfs,pallas] [--reps 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.render.engine import WavefrontRenderer
from cuda_raytracer_tpu.render import bounce as B

SCENE = "/root/reference/media/pathtracer/advanced/CBbunny.dae"
WI, HI, SPP = 800, 600, 16


def capture_passes(cfg, to_host=False):
    """Run one bench frame eagerly, recording every trace call's inputs."""
    r = WavefrontRenderer(cfg, camera_mode="collada")
    r.load_scene(SCENE)
    scene = r.scene
    r.setup()

    passes = []
    stages = B.make_stage_fns(cfg)
    real_trace = stages["trace"]
    depth_state = {"d": 0, "k": 0}

    def rec_trace(scene, o, d, valid, t_limit=None):
        kind = "bounce" if t_limit is None else "shadow"
        if depth_state["k"] == 0:
            kind = "primary"
        label = f"{kind}-d{depth_state['d']}"
        if to_host:
            # at spp=32 (15.36M rays) eight device-resident captures
            # exhaust HBM next to the frame's own buffers
            passes.append((
                label, np.asarray(o), np.asarray(d), np.asarray(valid),
                None if t_limit is None else np.asarray(t_limit),
            ))
        else:
            passes.append((label, o, d, valid, t_limit))
        depth_state["k"] += 1
        return real_trace(scene, o, d, valid, t_limit)

    stages = dict(stages, trace=rec_trace, trace_secondary=rec_trace,
                  trace_secondary_compact=rec_trace)

    key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), 0)
    cam = r._camera_arrays()
    if cfg.sample_order == "tiles8":
        pass  # raygen handles order internally via engine setup state
    import math
    from cuda_raytracer_tpu.ops import shade as S

    o, d = S.generate_camera_rays(
        jax.random.fold_in(key, 0), cfg.width, cfg.height,
        cfg.samples_per_frame, cam[0], cam[1],
        math.tan(math.radians(r.camera.hFov) / 2),
        math.tan(math.radians(r.camera.vFov) / 2),
        pix_order="tiles8" if cfg.sample_order == "tiles8" else None,
    )
    n = o.shape[0]
    carry = (
        o, d, jnp.ones((n,), bool), jnp.ones((n, 3), jnp.float32),
        jnp.zeros((n, 3), jnp.float32), jnp.ones((n,), bool),
        jnp.int32(0),
    )
    for depth in range(cfg.max_depth):
        depth_state["d"] = depth
        carry = B.run_depth(stages, cfg, scene, carry, key, depth)
    return scene, passes


def make_backend_fns(cfg, which):
    fns = {}
    for kind in which:
        if kind in ("pallasc", "pallascas", "pallasbf", "pallasnf",
                    "pallaslite"):
            # pallasc    = wavefront2 + live-lane compaction (+cascade)
            # pallascas  = wavefront2 + cascade merge, NO compaction —
            #              isolates the switch cost on full passes
            # pallasbf   = wavefront2 + bf16 box tests
            # pallasnf   = wavefront2 with the count-kernel sweeps
            #              (fused grandchild counting disabled)
            # pallaslite = wavefront2 + lite merge (shadow semantics)
            from cuda_raytracer_tpu.ops.pallas.wavefront2 import (
                trace_closest_wavefront,
            )

            def tr(scene, o, d, valid, t_limit=None, kind=kind):
                return trace_closest_wavefront(
                    scene, o, d, valid, t_limit,
                    compact=kind == "pallasc",
                    box_bf16=kind == "pallasbf",
                    fused_counts=kind != "pallasnf",
                    want_prim=kind != "pallaslite",
                )
        elif kind == "dfsbf":  # packet-DFS + bf16 slab tests
            c2 = cfg.replace(traversal="dfs", traversal_secondary="",
                             slab_bf16=True)
            tr = B.make_trace_fn(c2)
        else:
            c2 = cfg.replace(traversal=kind, traversal_secondary="")
            tr = B.make_trace_fn(c2)
        fns[kind] = (
            jax.jit(lambda s, o, d, v, tr=tr: tr(s, o, d, v)),
            jax.jit(lambda s, o, d, v, tl, tr=tr: tr(s, o, d, v, tl)),
        )
    return fns


def bench_one(f, scene, args, n, label, reps):
    try:
        res = f(scene, *args)
        jax.block_until_ready(res.t)
    except Exception as e:
        print(f"{label:34s}: FAILED {type(e).__name__}: {e}",
              flush=True)
        return None
    times = []
    for i in range(1, reps + 1):
        args_i = (args[0] + i * 1e-6,) + tuple(args[1:])
        t0 = time.perf_counter()
        r2 = f(scene, *args_i)
        float(jnp.sum(r2.t))  # forced readback = true sync here
        times.append(time.perf_counter() - t0)
    dt = min(times)
    nlive = n
    print(f"{label:34s}: {dt*1e3:8.1f} ms  {n/dt/1e6:7.1f} Mrays/s",
          flush=True)
    return dt


def reorder(o, d, valid, t_limit, mode):
    """Host-side payload permutation (upper-bound probe only)."""
    on, dn, vn = np.asarray(o), np.asarray(d), np.asarray(valid)
    n = on.shape[0]
    if mode == "deadlast":
        key = (~vn).astype(np.int64)
    else:  # binned: dead-last then octant+morton of live lanes
        octant = ((dn[:, 0] > 0) * 4 + (dn[:, 1] > 0) * 2
                  + (dn[:, 2] > 0)).astype(np.int64)
        lo = on.min(0)
        ext = on.max(0) - lo + 1e-6
        q = np.clip((on - lo) / ext * 32, 0, 31).astype(np.int64)
        mort = np.zeros(n, np.int64)
        for b in range(5):
            for a in range(3):
                mort |= ((q[:, a] >> b) & 1) << (3 * b + a)
        key = np.where(vn, octant * (1 << 15) + mort, 1 << 40)
    perm = np.argsort(key, kind="stable")
    out = [jnp.asarray(on[perm]), jnp.asarray(dn[perm]),
           jnp.asarray(vn[perm])]
    if t_limit is not None:
        out.append(jnp.asarray(np.asarray(t_limit)[perm]))
    return tuple(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backends", default="dfs,pallas")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--reorders", default="deadlast,binned")
    ap.add_argument("--log-usage", action="store_true",
                    help="print wavefront2 hit-log occupancy per pass")
    ap.add_argument("--tree-width", type=int, default=8)
    ap.add_argument("--max-leaf", type=int, default=16)
    args = ap.parse_args()
    backends = args.backends.split(",")
    reorders = [m for m in args.reorders.split(",") if m]

    cfg = RenderConfig(
        width=WI, height=HI, samples_per_frame=SPP, total_samples=64,
        max_depth=4, nee_schedule=((1, 1.0),) * 4,
        tree_width=args.tree_width, max_leaf_size=args.max_leaf,
        sample_order="tiles8", rr_start_depth=2, traversal="dfs",
        fuse_frame="no",
    )
    print(f"capturing passes (W={cfg.tree_width} ml={cfg.max_leaf_size} "
          f"spp={SPP} tiles8 RR@{cfg.rr_start_depth}) ...", flush=True)
    scene, passes = capture_passes(cfg)
    fns = make_backend_fns(cfg, backends)

    print(f"\n=== per-pass x per-backend ({len(passes)} passes, "
          f"N={passes[0][1].shape[0]}) ===", flush=True)
    totals = {k: 0.0 for k in backends}
    if args.log_usage:
        from cuda_raytracer_tpu.ops.pallas.wavefront2 import (
            trace_closest_wavefront,
        )

        fu = jax.jit(lambda s, o, d, v, tl: trace_closest_wavefront(
            s, o, d, v, tl, debug_no_merge=True))
        for label, o, d, valid, t_limit in passes:
            n = o.shape[0]
            used = int(fu(scene, o, d, valid, t_limit).dropped)
            print(f"{label:14s}: log used {used} ({used/n:.2f} N)",
                  flush=True)

    for label, o, d, valid, t_limit in passes:
        n = o.shape[0]
        live = int(jnp.sum(valid))
        print(f"-- {label}: N={n} live={live} ({live/n:.2f})",
              flush=True)
        for k in backends:
            fc, fs = fns[k]
            if t_limit is None:
                dt = bench_one(fc, scene, (o, d, valid), n,
                               f"  {k}", args.reps)
            else:
                dt = bench_one(fs, scene, (o, d, valid, t_limit), n,
                               f"  {k}", args.reps)
            if dt:
                totals[k] += dt
        if label.startswith(("bounce-d", "shadow-d")) and \
                not label.endswith("d0"):
            for mode in reorders:
                ro = reorder(o, d, valid, t_limit, mode)
                for k in backends:
                    fc, fs = fns[k]
                    f = fc if t_limit is None else fs
                    bench_one(f, scene, ro, n,
                              f"  {k}+{mode}", args.reps)
    print("\n=== frame traversal totals ===")
    for k, v in totals.items():
        print(f"{k:10s}: {v*1e3:8.1f} ms")


if __name__ == "__main__":
    main()

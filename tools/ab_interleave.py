"""Interleaved A/B timing of wavefront2 variants on captured passes.

Run-to-run variance on the tunneled v5e was observed at the tens-of-
percent level between separate bench_passes invocations, which makes
cross-run deltas untrustworthy.  This tool times a list of variants
ROUND-ROBIN (variant order rotated every rep) on the same captured
pass, so slow phases of the device/tunnel hit every variant equally.

Usage: python tools/ab_interleave.py [--pass bounce-d2] [--reps 5]
       [--variants fused,nf,lite,litenf,compact,compactnf]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.ops.pallas.wavefront2 import trace_closest_wavefront
from bench_passes import capture_passes, WI, HI, SPP

VARIANTS = {
    # name: trace kwargs (fused_counts defaults False everywhere)
    "fused": dict(fused_counts=True),
    "nf": dict(),
    "lite": dict(want_prim=False, fused_counts=True),
    "litenf": dict(want_prim=False),
    "compact": dict(compact=True, fused_counts=True),
    "compactnf": dict(compact=True),
    "clitenf": dict(compact=True, want_prim=False),
    # decomposition probes (WRONG results - timing only)
    "nomerge": dict(debug_no_merge=True),
    "noleaf": dict(debug_no_leaf=True),
    "noleafnm": dict(debug_no_leaf=True, debug_no_merge=True),
    "L1": dict(debug_levels=1, debug_no_merge=True),
    "L2": dict(debug_levels=2, debug_no_merge=True),
    "L3": dict(debug_levels=3, debug_no_merge=True),
    "L4": dict(debug_levels=4, debug_no_merge=True),
    "L5": dict(debug_levels=5, debug_no_merge=True),
}

#: variants that compute ops/seeds.py seed bounds inside the jit (so
#: the seed sweep's cost is included in the timing)
SEED_VARIANTS = {
    "seed": dict(),
    "seedlite": dict(want_prim=False),
    "seedcompact": dict(compact=True),
    "seedclite": dict(compact=True, want_prim=False),
    "seed16": dict(_k=16),
    "seed8": dict(_k=8),
    "seedlite16": dict(want_prim=False, _k=16),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", default="bounce-d1,shadow-d1,bounce-d2")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--variants", default="fused,nf,lite,litenf")
    ap.add_argument("--tree-width", type=int, default=4)
    ap.add_argument("--max-leaf", type=int, default=32)
    ap.add_argument("--spp", type=int, default=32)
    args = ap.parse_args()

    cfg = RenderConfig(
        width=WI, height=HI, samples_per_frame=args.spp, total_samples=64,
        max_depth=4, nee_schedule=((1, 1.0),) * 4,
        tree_width=args.tree_width, max_leaf_size=args.max_leaf,
        sample_order="tiles8", rr_start_depth=2, traversal="dfs",
        fuse_frame="no",
    )
    scene, passes = capture_passes(cfg, to_host=True)
    wanted = args.passes.split(",")
    names = args.variants.split(",")
    # keep only the wanted passes, staged on HOST: 8 captured passes at
    # spp=32 (15.36M rays) exhaust HBM next to the traversal buffers
    passes = [p for p in passes if p[0] in wanted]

    fns = {}
    for nm in names:
        if nm in ("dfs", "dfsseed"):
            from cuda_raytracer_tpu.ops.pallas.packet_dfs import (
                trace_closest_packets,
            )
            if nm == "dfsseed":
                from cuda_raytracer_tpu.ops.seeds import seed_hits

                def fdfs(s, o, d, v, tl):
                    sd = seed_hits(s, o, d, v)
                    return trace_closest_packets(
                        s, o, d, v, tl, seed_t=sd.t, seed_prim=sd.prim
                    )

                fns[nm] = jax.jit(fdfs)
            else:
                fns[nm] = jax.jit(
                    lambda s, o, d, v, tl:
                    trace_closest_packets(s, o, d, v, tl)
                )
            continue
        if nm in SEED_VARIANTS:
            from cuda_raytracer_tpu.ops.seeds import seed_hits

            kw = dict(SEED_VARIANTS[nm])
            k = kw.pop("_k", 32)

            def f(s, o, d, v, tl, kw=kw, k=k):
                sd = seed_hits(s, o, d, v, k=k)
                return trace_closest_wavefront(
                    s, o, d, v, tl, seed_t=sd.t, seed_prim=sd.prim, **kw
                )

            fns[nm] = jax.jit(f)
            continue
        kw = VARIANTS[nm]
        fns[nm] = jax.jit(
            lambda s, o, d, v, tl, kw=kw:
            trace_closest_wavefront(s, o, d, v, tl, **kw)
        )

    for label, o_h, d_h, valid_h, tl_h in passes:
        o = jnp.asarray(o_h)
        d = jnp.asarray(d_h)
        valid = jnp.asarray(valid_h)
        t_limit = None if tl_h is None else jnp.asarray(tl_h)
        n = o.shape[0]
        shadow = t_limit is not None
        times = {nm: [] for nm in names}
        # warmup/compile all variants first
        for nm in names:
            if not shadow and False in (
                VARIANTS.get(nm, {}).get("want_prim"),
                SEED_VARIANTS.get(nm, {}).get("want_prim"),
            ):
                continue  # lite merge is shadow-only semantics
            r = fns[nm](scene, o, d, valid, t_limit)
            jax.block_until_ready(r.t)
        for rep in range(args.reps):
            order = names[rep % len(names):] + names[: rep % len(names)]
            for nm in order:
                if not shadow and False in (
                VARIANTS.get(nm, {}).get("want_prim"),
                SEED_VARIANTS.get(nm, {}).get("want_prim"),
            ):
                    continue
                o_i = o + (rep + 1) * 1e-6
                t0 = time.perf_counter()
                r = fns[nm](scene, o_i, d, valid, t_limit)
                float(jnp.sum(r.t))
                times[nm].append(time.perf_counter() - t0)
        print(f"-- {label} (N={n})", flush=True)
        for nm in names:
            if not times[nm]:
                continue
            ts = sorted(times[nm])
            ms = [f"{t*1e3:.0f}" for t in ts]
            print(f"  {nm:10s}: min {ts[0]*1e3:7.1f} ms   all {ms}",
                  flush=True)


if __name__ == "__main__":
    main()

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
    # name: (compact, want_prim, fused_counts)
    "fused": (False, True, True),
    "nf": (False, True, False),
    "lite": (False, False, True),
    "litenf": (False, False, False),
    "compact": (True, True, True),
    "compactnf": (True, True, False),
    "clitenf": (True, False, False),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", default="bounce-d1,shadow-d1,bounce-d2")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--variants", default="fused,nf,lite,litenf")
    args = ap.parse_args()

    cfg = RenderConfig(
        width=WI, height=HI, samples_per_frame=SPP, total_samples=64,
        max_depth=4, nee_schedule=((1, 1.0),) * 4,
        tree_width=8, max_leaf_size=16,
        sample_order="tiles8", rr_start_depth=2, traversal="dfs",
        fuse_frame="no",
    )
    scene, passes = capture_passes(cfg)
    wanted = args.passes.split(",")
    names = args.variants.split(",")

    fns = {}
    for nm in names:
        comp, wp, fc = VARIANTS[nm]
        fns[nm] = jax.jit(
            lambda s, o, d, v, tl, comp=comp, wp=wp, fc=fc:
            trace_closest_wavefront(
                s, o, d, v, tl, compact=comp, want_prim=wp,
                fused_counts=fc,
            )
        )

    for label, o, d, valid, t_limit in passes:
        if label not in wanted:
            continue
        n = o.shape[0]
        shadow = t_limit is not None
        times = {nm: [] for nm in names}
        # warmup/compile all variants first
        for nm in names:
            if not shadow and VARIANTS[nm][1] is False:
                continue  # lite merge is shadow-only semantics
            r = fns[nm](scene, o, d, valid, t_limit)
            jax.block_until_ready(r.t)
        for rep in range(args.reps):
            order = names[rep % len(names):] + names[: rep % len(names)]
            for nm in order:
                if not shadow and VARIANTS[nm][1] is False:
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

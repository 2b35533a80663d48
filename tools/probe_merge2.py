"""Split wavefront2 pass cost into kernels vs merge, per pass.

Round-3 puzzle: the merge cascade saves ~330 ms on bounce-d2 but
nothing on shadow-d1, though both select the same 3.84M-col prefix
branch (log used 1.88M vs 2.97M).  This times, per captured pass:

  * kernels only      (debug_no_merge)
  * cascade merge     (merge_cascade=True)
  * full-prefix merge (merge_cascade=False)

Usage: python tools/probe_merge2.py [--passes shadow-d1,bounce-d2]
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
from tools.bench_passes import capture_passes, WI, HI, SPP


def timed(f, scene, args, reps=3):
    res = f(scene, *args)
    jax.block_until_ready(res.t)
    ts = []
    for i in range(1, reps + 1):
        args_i = (args[0] + i * 1e-6,) + tuple(args[1:])
        t0 = time.perf_counter()
        r2 = f(scene, *args_i)
        float(jnp.sum(r2.t))  # forced readback: true sync
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", default="shadow-d1,bounce-d2")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    want = args.passes.split(",")

    cfg = RenderConfig(
        width=WI, height=HI, samples_per_frame=SPP, total_samples=64,
        max_depth=4, nee_schedule=((1, 1.0),) * 4,
        tree_width=8, max_leaf_size=16,
        sample_order="tiles8", rr_start_depth=2, traversal="dfs",
        fuse_frame="no",
    )
    scene, passes = capture_passes(cfg)

    variants = {
        "kernels-only": dict(debug_no_merge=True),
        "cascade": dict(merge_cascade=True),
        "full-merge": dict(merge_cascade=False),
        "forced-960k": dict(debug_merge_cols=960064),
        "forced-3.84M": dict(debug_merge_cols=3840256),
        "forced-7.7M": dict(debug_merge_cols=7680512),
        "lite-cascade": dict(want_prim=False),
        "double-count": dict(debug_double_count=True),
        "lite-3.84M": dict(want_prim=False, debug_merge_cols=3840256),
    }
    for label, o, d, valid, t_limit in passes:
        if label not in want:
            continue
        print(f"-- {label}", flush=True)
        for vname, kw in variants.items():
            f = jax.jit(
                lambda s, o, d, v, tl, kw=tuple(kw.items()):
                trace_closest_wavefront(s, o, d, v, tl, **dict(kw))
            )
            dt = timed(f, scene, (o, d, valid, t_limit), args.reps)
            print(f"  {vname:14s}: {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()

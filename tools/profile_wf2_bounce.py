"""Where does wavefront2's ~550-670 ms incoherent-pass floor go?

Splits the bounce-d1-shaped pass (7.68M rays) into: per-level kernel
prefix (debug_levels), leaf intersection (debug_no_leaf), and the final
XLA scatter-min merge (debug_no_merge).  Proper timing discipline:
perturbed inputs + forced readback (the axon runtime dedupes identical
dispatches and block_until_ready does not sync).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.ops.pallas.wavefront2 import trace_closest_wavefront
from tools.bench_passes import capture_passes, WI, HI, SPP


def timed(f, o, args, reps=3):
    res = f(o, *args)
    jax.block_until_ready(res.t)
    ts = []
    for i in range(1, reps + 1):
        t0 = time.perf_counter()
        r = f(o + i * 1e-6, *args)
        float(jnp.sum(r.t))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    cfg = RenderConfig(
        width=WI, height=HI, samples_per_frame=SPP, total_samples=64,
        max_depth=2, nee_schedule=((1, 1.0), (0, 0.0)), tree_width=8,
        max_leaf_size=16, sample_order="tiles8", traversal="dfs",
        fuse_frame="no",
    )
    scene, passes = capture_passes(cfg)
    by = {p[0]: p for p in passes}
    _, o, d, valid, _tl = by["bounce-d1"]
    n = o.shape[0]
    print(f"bounce-d1 shaped pass: N={n}", flush=True)

    variants = [("full", dict())]
    variants += [("nomerge", dict(debug_no_merge=True))]
    variants += [("noleaf+nomerge",
                  dict(debug_no_leaf=True, debug_no_merge=True))]
    variants += [(f"L{k}+nomerge",
                  dict(debug_levels=k, debug_no_merge=True))
                 for k in (1, 2, 3, 4, 5)]
    for name, kw in variants:
        f = jax.jit(
            lambda s, o, d, v, kw=kw: trace_closest_wavefront(
                s, o, d, v, **kw
            )
        )
        dt = timed(lambda oo, *a: f(scene, oo, *a), o, (d, valid))
        print(f"{name:16s}: {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()

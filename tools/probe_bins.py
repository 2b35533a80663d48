"""How coarse can secondary-ray binning be before the traversal win
fades?  And which packet size C wins per pass?

Host-sorts captured bench-shaped passes by a quantized (octant, morton)
key at several bin resolutions, then times packet-DFS on each.  The
winning resolution sets the radix width of the in-kernel binning
kernel (VERDICT r3 task 3); the C sweep sets cfg.packet_size defaults.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.ops.pallas.packet_dfs import trace_closest_packets
from tools.bench_passes import capture_passes, WI, HI, SPP


def key_bits(o, d, valid, oct_bits, mort_bits):
    """Bin key: direction octant (oct_bits in {0,3}) + origin morton
    cell (mort_bits total bits, cycled x,y,z); dead rays last."""
    on, dn, vn = np.asarray(o), np.asarray(d), np.asarray(valid)
    n = on.shape[0]
    octant = ((dn[:, 0] > 0) * 4 + (dn[:, 1] > 0) * 2
              + (dn[:, 2] > 0)).astype(np.int64)
    if oct_bits == 0:
        octant = np.zeros(n, np.int64)
    lo = on.min(0)
    ext = on.max(0) - lo + 1e-6
    per_axis = (mort_bits + 2) // 3
    q = np.clip((on - lo) / ext * (1 << per_axis), 0,
                (1 << per_axis) - 1).astype(np.int64)
    mort = np.zeros(n, np.int64)
    out_bit = 0
    for b in range(per_axis):
        for a in range(3):
            if out_bit < mort_bits:
                mort |= ((q[:, a] >> b) & 1) << out_bit
                out_bit += 1
    key = (octant << mort_bits) | mort
    return np.where(vn, key, 1 << 60)


def bench(f, scene, args, n, label, reps=3):
    res = f(scene, *args)
    jax.block_until_ready(res.t)
    times = []
    for i in range(1, reps + 1):
        args_i = (args[0] + i * 1e-6,) + tuple(args[1:])
        t0 = time.perf_counter()
        r2 = f(scene, *args_i)
        float(jnp.sum(r2.t))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{label:36s}: {dt*1e3:8.1f} ms  {n/dt/1e6:7.1f} Mrays/s",
          flush=True)
    return dt


def main():
    cfg = RenderConfig(
        width=WI, height=HI, samples_per_frame=SPP, total_samples=64,
        max_depth=4, nee_schedule=((1, 1.0),) * 4, tree_width=8,
        max_leaf_size=16, sample_order="tiles8", rr_start_depth=2,
        traversal="dfs", fuse_frame="no",
    )
    print("capturing ...", flush=True)
    scene, passes = capture_passes(cfg)
    by_label = {p[0]: p for p in passes}

    fns = {}
    for ps in (256, 512, 1024):
        fns[ps] = (
            jax.jit(lambda s, o, d, v, ps=ps: trace_closest_packets(
                s, o, d, v, packet_size=ps)),
            jax.jit(lambda s, o, d, v, tl, ps=ps: trace_closest_packets(
                s, o, d, v, tl, packet_size=ps)),
        )

    # ---- packet size on the coherent passes -------------------------
    print("\n=== packet size sweep, coherent passes ===", flush=True)
    for label in ("primary-d0", "shadow-d0"):
        lab, o, d, valid, tl = by_label[label]
        n = o.shape[0]
        for ps in (256, 512, 1024):
            fc, fs = fns[ps]
            args = (o, d, valid) if tl is None else (o, d, valid, tl)
            bench(fc if tl is None else fs, scene, args, n,
                  f"{label} C={ps}")

    # ---- bin resolution on the incoherent passes --------------------
    grids = [
        ("oct0-mort3", 0, 3),      # 8 bins
        ("oct3-mort0", 3, 0),      # 8 bins, octant only
        ("oct3-mort3", 3, 3),      # 64 bins
        ("oct3-mort6", 3, 6),      # 512 bins
        ("oct3-mort9", 3, 9),      # 4096 bins
        ("oct3-mort15", 3, 15),    # full (round-2 reference sort)
    ]
    for label in ("shadow-d1", "bounce-d2", "shadow-d2", "bounce-d3"):
        lab, o, d, valid, tl = by_label[label]
        n = o.shape[0]
        print(f"\n=== {label}: bins x C ===", flush=True)
        for gname, ob, mb in grids:
            key = key_bits(o, d, valid, ob, mb)
            perm = np.argsort(key, kind="stable")
            pj = jnp.asarray(perm)
            ro = (o[pj], d[pj], valid[pj]) if tl is None else (
                o[pj], d[pj], valid[pj], tl[pj])
            for ps in (256, 1024):
                fc, fs = fns[ps]
                bench(fc if tl is None else fs, scene, ro, n,
                      f"{label} {gname} C={ps}")


if __name__ == "__main__":
    main()

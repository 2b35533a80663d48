"""Measure per-visit cost of the packet-DFS kernel exactly, using the
visits counter in out[2]: full kernel vs leaf-skipped variant."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.render.engine import WavefrontRenderer
from cuda_raytracer_tpu.ops import shade as S
import cuda_raytracer_tpu.ops.pallas.packet_dfs as m

from bench_dfs2 import tiled_rays


def run_raw(s, o, d, skip_leaf):
    m._SKIP_LEAF = skip_leaf
    bvh = s.bvh
    W = bvh.width
    N = o.shape[0]
    payload = jnp.concatenate(
        [o.T.astype(jnp.float32), d.T.astype(jnp.float32),
         jnp.zeros((1, N), jnp.float32),
         jnp.full((1, N), m.T_NO_LIMIT, jnp.float32)], axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N // m.C,),
        in_specs=[
            pl.BlockSpec((8, m.C), lambda i, mm: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bvh.node_dfs.shape, lambda i, mm: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bvh.prim_groups.shape, lambda i, mm: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((4, m.C), lambda i, mm: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((5, m.C), jnp.float32),
            pltpu.VMEM((3, m.C), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((1, 1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SMEM((m.STACK_CAP,), jnp.int32)])

    @jax.jit
    def go(meta, payload, nd, pg):
        return pl.pallas_call(
            functools.partial(m._dfs_kernel, width=W, do_kill=False,
                              kill_eps=1e-3),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((4, N), jnp.float32),
        )(meta, payload, nd, pg)

    out = go(bvh.node_meta, payload, bvh.node_dfs, bvh.prim_groups)
    float(jnp.sum(out[2]))
    best = 1e9
    for i in range(1, 3):
        t0 = time.perf_counter()
        out = go(bvh.node_meta, payload + i * 1e-6, bvh.node_dfs,
                 bvh.prim_groups)
        float(jnp.sum(out[2]))
        best = min(best, time.perf_counter() - t0)
    visits = np.asarray(out[2, ::m.C]).sum()
    return best, visits


def main():
    dae = "/root/reference/media/pathtracer/advanced/CBbunny.dae"
    cfg = RenderConfig(width=800, height=600, samples_per_frame=2,
                       max_depth=2, traversal="xla", tree_width=8,
                       max_leaf_size=16)
    r = WavefrontRenderer(cfg, camera_mode="cutracer")
    r.load_scene(dae)
    s = r.scene
    o, d = tiled_rays(r.cutracer_camera, 2, 1)

    dt_f, v_f = run_raw(s, o, d, False)
    print(f"full   : {dt_f*1e3:8.1f} ms  visits {v_f:9.0f}  "
          f"{dt_f/v_f*1e9:6.0f} ns/visit", flush=True)
    dt_s, v_s = run_raw(s, o, d, True)
    print(f"noleaf : {dt_s*1e3:8.1f} ms  visits {v_s:9.0f}  "
          f"{dt_s/v_s*1e9:6.0f} ns/visit", flush=True)


if __name__ == "__main__":
    main()

"""Multi-chip rendering via jax.sharding + shard_map.

The reference is single-process single-GPU (SURVEY.md section 2.4);
multi-chip is *new* capability expressed TPU-natively: the scene
(triangles, BVH, BSDF/light tables) is replicated to every chip over
DCN at init, and the per-frame work is sharded over the ICI mesh in one
of two ways (config.shard_mode):

* ``samples``: each chip traces the full image with its own disjoint
  RNG streams (chip i renders samples [i*spp_chip, (i+1)*spp_chip));
  per-chip partial images are combined with one ICI all-reduce (psum
  mean).  Perfectly balanced, collective volume = one framebuffer.
* ``tiles``: the ray dimension (pixel-major) is sharded, so each chip
  owns a contiguous framebuffer slab end-to-end; no collective at all,
  the host concatenates device-local shards (the analog of the CPU
  reference's tile work queue, src/pathtracer.cpp:195-213, with tiles
  pinned to chips instead of worker threads).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderConfig
from ..ops import filters as F
from ..ops import shade as S
from ..render.bounce import make_stage_fns, run_bounce_loop
from ..render.flatscene import FlatScene


def make_render_mesh(devices=None, axis: str = "rays") -> Mesh:
    """1-D device mesh over the ray/sample axis."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _render_chunk(scene: FlatScene, cfg: RenderConfig, cam_arrays, key,
                  hfov_t, vfov_t, spp: int):
    """Trace spp samples/pixel of the full image; returns [H, W, 3].
    The schedule is the shared bounce loop (render/bounce.py)."""
    pos, c2w = cam_arrays
    o, d = S.generate_camera_rays(
        jax.random.fold_in(key, 0), cfg.width, cfg.height, spp,
        pos, c2w, hfov_t, vfov_t,
    )
    light, _ = run_bounce_loop(make_stage_fns(cfg), cfg, scene, o, d, key)
    return F.reconstruct(light, cfg.width, cfg.height, spp)


def render_frame_sharded(
    mesh: Mesh,
    scene: FlatScene,
    cfg: RenderConfig,
    cam_arrays,
    key,
    hfov_t: float,
    vfov_t: float,
):
    """One sharded frame of cfg.samples_per_frame spp over the mesh.

    samples mode: every chip renders spp/n_chips samples with a
    chip-unique key; psum-mean combines over ICI.
    tiles mode: rows of the framebuffer are sharded; each chip renders
    its slab with the full spp.
    Returns the full [H, W, 3] frame (replicated).
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    if cfg.shard_mode == "samples":
        spp_chip = max(cfg.samples_per_frame // n_dev, 1)

        def per_chip(scene, cam_arrays, key):
            idx = jax.lax.axis_index(axis)
            chip_key = jax.random.fold_in(key, idx)
            img = _render_chunk(
                scene, cfg, cam_arrays, chip_key, hfov_t, vfov_t, spp_chip
            )
            return jax.lax.pmean(img, axis)

        fn = jax.shard_map(
            per_chip,
            mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=P(),
        )
        return fn(scene, cam_arrays, key)

    # tiles: shard rows; rows must divide evenly (caller pads)
    assert cfg.height % n_dev == 0, "height must divide the mesh"
    rows = cfg.height // n_dev

    def per_chip(scene, cam_arrays, key):
        idx = jax.lax.axis_index(axis)
        # each chip renders its slab by shifting the camera's sensor
        # window: rows [idx*rows, (idx+1)*rows)
        tile_cfg = cfg.replace(height=rows)
        pos, c2w = cam_arrays
        # sensor-space v range for this slab
        chip_key = jax.random.fold_in(key, idx)
        o, d = _tile_rays(
            chip_key, cfg.width, cfg.height, rows, idx, cfg.samples_per_frame,
            pos, c2w, hfov_t, vfov_t,
        )
        light, _ = run_bounce_loop(
            make_stage_fns(tile_cfg), tile_cfg, scene, o, d, chip_key
        )
        img = F.reconstruct(light, cfg.width, rows, cfg.samples_per_frame)
        return img

    fn = jax.shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(axis),
    )
    return fn(scene, cam_arrays, key)


def _tile_rays(key, width, full_height, rows, tile_idx, spp, pos, c2w,
               tan_h, tan_v):
    """Camera rays for a horizontal slab of the framebuffer."""
    n = width * rows * spp
    i = jnp.arange(n, dtype=jnp.int32)
    pix = i // spp
    px = (pix % width).astype(jnp.float32)
    py = (pix // width).astype(jnp.float32) + tile_idx * rows
    u = jax.random.uniform(key, (n, 2), dtype=jnp.float32)
    x = (px + u[:, 0]) / width
    y = (py + u[:, 1]) / full_height
    sx = (2.0 * x - 1.0) * tan_h
    sy = (1.0 - 2.0 * y) * tan_v
    d_cam = jnp.stack([sx, sy, -jnp.ones_like(sx)], axis=-1)
    d = d_cam @ jnp.asarray(c2w, jnp.float32).T
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(jnp.asarray(pos, jnp.float32), d.shape)
    return o, d


class ShardedRenderer:
    """Convenience wrapper: replicate a scene over a mesh and render
    sharded frames."""

    def __init__(self, cfg: RenderConfig, mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self.mesh = mesh or make_render_mesh()
        self._jit = None

    def compile(self, scene: FlatScene, hfov: float, vfov: float):
        cfg = self.cfg
        tan_h = math.tan(math.radians(hfov) / 2)
        tan_v = math.tan(math.radians(vfov) / 2)

        def frame(scene, cam_arrays, key):
            return render_frame_sharded(
                self.mesh, scene, cfg, cam_arrays, key, tan_h, tan_v
            )

        self._jit = jax.jit(frame)
        return self._jit

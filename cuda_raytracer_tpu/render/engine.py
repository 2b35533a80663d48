"""The wavefront renderer.

TPU-native equivalent of ``cutracer::CudaRenderer``
(src/cudaRenderer.h:173-272, src/cudaRenderer.cu:1496-2564): owns the
flattened device scene, compiles the per-frame pipeline once per scene
shape, and accumulates frames of ``samples_per_frame`` spp with
reset-on-move semantics and threshold-gated median-filter denoise.

One frame follows the reference's schedule (renderFrame,
src/cudaRenderer.cu:2460-2558): camera rays -> closest-hit traversal ->
per-depth NEE shadow passes -> BSDF scatter -> next traversal -> ... ->
film reconstruction.  With the default config (depth 3, NEE schedule
2x0.5 / 2x0.5 / 1x1.0) a frame performs the reference's exact 8 BVH
traversals (src/cudaRenderer.cu:2499-2534).

Differences from the reference are deliberate TPU-first redesigns:
SoA ray state instead of CuRay structs, deterministic scan compaction
instead of atomics, segment-min closest hit instead of 16-slot token
merges, counter-based jax.random instead of cuRAND state arrays, and a
physically-correct default mode (emission on counted hits, one-sided
area lights, no lost-ray light drops) with ``reference_compat`` where
that matters.
"""

from __future__ import annotations

import functools
import math
import time
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, RenderConfig
from ..ops import filters as F
from ..ops import shade as S
from .bounce import (
    make_stage_fns,
    pack_state,
    run_bounce_loop,
    run_depth_compacted,
)
from ..scene import static_scene as st
from ..scene.camera import Camera, CutracerCamera
from ..scene.collada import load_scene_info
from ..scene.dynamic_scene import load_from_scene_info
from .flatscene import FlatScene, flatten_scene


class WavefrontRenderer:
    """End-to-end renderer with the CudaRenderer-shaped API surface:
    load_scene / setup / render / get_image / set_viewpoint."""

    def __init__(self, config: RenderConfig = DEFAULT_CONFIG,
                 camera_mode: str = "canonical"):
        self.config = config
        #: "canonical" = Scotty3D Application orbit placement
        #: (src/application.cpp:396-409); "collada" = the .dae camera
        #: node transform; "cutracer" = the CUDA renderer's basis with
        #: its fixed frustum (src/cudaRenderer.cu:1590-1606).
        self.camera_mode = camera_mode
        self.scene: Optional[FlatScene] = None
        self.camera: Optional[Camera] = None
        self.cutracer_camera: Optional[CutracerCamera] = None
        self.dynamic_scene = None
        self.bvh = None
        self.frame_index = 0
        self.image_samples = 0
        self._final_image = None
        self._render_jit = None
        self._accum_jit = None
        self.stage_times: Dict[str, float] = {}

    # -- scene loading (loadScene, src/cudaRenderer.cu:1679-1843) --------
    def load_scene(self, path: str) -> None:
        info = load_scene_info(path)
        dscene, cam_info, cam_xf, cut_cam = load_from_scene_info(info)
        self.dynamic_scene = dscene
        self.load_static_scene(dscene.get_static_scene(), cam_info, cam_xf, cut_cam)

    def load_static_scene(self, sscene: st.Scene, cam_info=None,
                          cam_transform=None, cut_cam=None) -> None:
        cfg = self.config
        self.scene, self.bvh = flatten_scene(
            sscene,
            tree_width=cfg.tree_width,
            max_leaf_size=cfg.max_leaf_size,
            sah_bins=cfg.sah_bins,
        )
        self.static_scene = sscene

        camera = Camera()
        if cam_info is not None:
            camera.configure(cam_info, cfg.width, cfg.height)
        else:
            camera.hFov, camera.vFov = 50.0, 35.0
            camera.screenW, camera.screenH = cfg.width, cfg.height
        if self.camera_mode == "collada" and cam_transform is not None:
            # camera at the .dae node transform, with the reference's
            # +0.75y origin lift (src/cudaRenderer.cu:1596 — the shipped
            # scenes author cameras at floor level and assume it)
            pos = (cam_transform @ np.array([0, 0, 0, 1.0]))[:3]
            pos = pos + np.array([0.0, 0.75, 0.0])
            rot = cam_transform[:3, :3]
            z = -rot @ np.array([0.0, 0.0, -1.0])  # backward dir
            x = rot @ np.array([1.0, 0.0, 0.0])
            y = rot @ np.array([0.0, 1.0, 0.0])
            camera.pos = pos
            camera.c2w = np.stack(
                [x / np.linalg.norm(x), y / np.linalg.norm(y), z / np.linalg.norm(z)],
                axis=1,
            )
        else:
            # Application::load placement (src/application.cpp:396-409)
            bb_min, bb_max = sscene.bbox()
            if cam_transform is not None and cam_info is not None:
                c_dir = (cam_transform @ np.append(cam_info.view_dir, 1.0))[:3]
                nrm = np.linalg.norm(c_dir)
                c_dir = c_dir / nrm if nrm > 0 else np.array([0.0, 0.0, 1.0])
            else:
                c_dir = np.array([0.0, 0.0, 1.0])
            camera.place_canonical(bb_min, bb_max, c_dir)
        self.camera = camera
        self.cutracer_camera = cut_cam
        self._reset_accumulation()
        self._render_jit = None

    # -- compile (setup, src/cudaRenderer.cu:1872-2113) -------------------
    #
    # The frame is compiled as a small set of stage executables instead
    # of one giant program: every traversal in the frame (camera, NEE
    # shadow, bounce — 8 with the default schedule) has identical shapes,
    # so ONE compiled trace executable is reused for all of them, cutting
    # XLA compile time by ~8x.  This is the moral equivalent of the
    # reference launching the same kernels per stage rather than
    # generating one megakernel.
    def setup(self) -> None:
        cfg = self.config
        if cfg.sample_order == "tiles8":
            # tile-major sample order: slot p covers pixel pix_order[p]
            self._pix_order = "tiles8"  # raygen uses tile arithmetic
            self._inv_order = jnp.asarray(
                S.tiles8_rank(cfg.width, cfg.height), jnp.int32
            )
        elif cfg.sample_order == "tiles32s":
            # sample-major 32x32 tiles (see ops/shade.tiles32s_rank);
            # slot j covers sample j // (W*H) of the pixel at tile
            # rank j % (W*H)
            self._pix_order = "tiles32s"
            self._inv_order = jnp.asarray(
                S.tiles32s_rank(cfg.width, cfg.height), jnp.int32
            )
        else:
            self._pix_order = None
            self._inv_order = None

        def raygen(cam_arrays, key):
            if self.camera_mode == "cutracer":
                return S.generate_camera_rays_cutracer(
                    jax.random.fold_in(key, 0),
                    cfg.width, cfg.height, cfg.samples_per_frame,
                    *cam_arrays, pix_order=self._pix_order,
                )
            pos, c2w = cam_arrays
            return S.generate_camera_rays(
                jax.random.fold_in(key, 0),
                cfg.width, cfg.height, cfg.samples_per_frame,
                pos, c2w,
                math.tan(math.radians(self.camera.hFov) / 2),
                math.tan(math.radians(self.camera.vFov) / 2),
                pix_order=self._pix_order,
            )

        def film(light, final_img, image_samples, with_median=True):
            img = F.reconstruct(light, cfg.width, cfg.height,
                                cfg.samples_per_frame,
                                inv_order=self._inv_order,
                                sample_major=cfg.sample_order
                                == "tiles32s")
            final = F.accumulate(
                final_img, img,
                image_samples.astype(jnp.float32),
                jnp.float32(cfg.samples_per_frame),
            )
            # the filter only ever feeds get_image below the threshold;
            # skip its cost once accumulation passes it (with_median is
            # static: one recompile at the crossing)
            post = (F.median_filter_3x3(final, cfg.reference_compat)
                    if with_median else final)
            return final, post

        stages = make_stage_fns(cfg)
        fuse = cfg.fuse_frame == "yes" or (
            cfg.fuse_frame == "auto" and jax.default_backend() == "tpu"
        )
        if fuse:
            # one executable per DEPTH (plus raygen and film): each
            # separate dispatch through the TPU runtime costs ~10-30 ms
            # and a per-stage frame makes 30+, while a single whole-
            # frame program is long enough that XLA's rematerializer
            # spills 40x-padded [N,3] copies and blows HBM.  Per-depth
            # programs are the sweet spot: ~6 dispatches, short live
            # ranges.
            from .bounce import run_depth

            def raygen_frame(cam_arrays, key):
                o, d = raygen(cam_arrays, key)
                n = o.shape[0]
                return (
                    o, d,
                    jnp.ones((n,), bool),
                    jnp.ones((n, 3), jnp.float32),
                    jnp.zeros((n, 3), jnp.float32),
                    jnp.ones((n,), bool),
                    jnp.int32(0),
                )

            raygen_jit = jax.jit(raygen_frame)
            depth_jits = [
                jax.jit(
                    functools.partial(
                        run_depth, stages, cfg, depth=depth
                    )
                )
                for depth in range(cfg.max_depth)
            ]
            film_jit = jax.jit(film, static_argnums=(3,))
            # exposed for diagnostics (tools/profile_engine.py times
            # each per-depth executable with forced readbacks)
            self._raygen_frame_jit = raygen_jit
            self._depth_jits = depth_jits
            self._film_jit = film_jit

            # whole-depth compaction (cfg.compact_depths): depths past
            # rr_start_depth run over the compacted live prefix at a
            # host-bucketed static capacity — see render/bounce.py.
            rr = cfg.rr_start_depth
            compacting = (
                cfg.compact_depths and rr and rr < cfg.max_depth
            )
            if compacting:
                from ..ops.pallas.partition import compact_live_payload

                def pack_partition(carry):
                    o, d, valid, importance, light, ce, dropped = carry
                    ids = jnp.arange(o.shape[0], dtype=jnp.int32)
                    payload = pack_state(o, d, valid, importance, ce,
                                          ids)
                    packed, n_live = compact_live_payload(payload)
                    return packed, n_live, light, dropped

                self._pack_partition_jit = jax.jit(pack_partition)
                self._partition_jit = jax.jit(compact_live_payload)
                self._compact_depth_jits = {}
                #: sticky per-depth capacity buckets: grow when the
                #: live count exceeds them, never shrink (so steady-
                #: state accumulation reuses one executable per depth
                #: instead of recompiling when liveness wobbles across
                #: a bucket boundary); reset by load_static_scene.
                self._depth_buckets = {}

                def compact_depth_fn(depth, m):
                    key_ = (depth, m)
                    fn = self._compact_depth_jits.get(key_)
                    if fn is None:
                        fn = jax.jit(functools.partial(
                            run_depth_compacted, stages, cfg,
                            depth=depth, m=m,
                        ))
                        self._compact_depth_jits[key_] = fn
                    return fn

                def bucket(depth, nl, ncur):
                    # grain = ncur/32: at 25% liveness a coarser grain
                    # overshoots the live count by up to 50% and the
                    # whole depth (traversal + shading) pays for the
                    # slack — measured 978 ms at m=1.5x live vs the
                    # ~3% ceiling this grain allows
                    g = max(1024, -(-ncur // 32 // 1024) * 1024)
                    m = min(ncur, max(-(-nl // g) * g, 1024))
                    prev = self._depth_buckets.get(depth)
                    if prev is not None and m <= prev <= ncur:
                        m = prev
                    self._depth_buckets[depth] = m
                    return m

            def run(scene, cam_arrays, key, final_img, image_samples):
                import os as _os

                time_depths = _os.environ.get("CRT_TIME_DEPTHS")

                def lap(name, t0, *sync):
                    if time_depths:
                        jax.block_until_ready(sync)
                        now = time.perf_counter()
                        self.stage_times[name] = now - t0
                        return now
                    return 0.0

                carry = raygen_jit(cam_arrays, key)
                if time_depths:
                    jax.block_until_ready(carry)
                n_full_depths = rr if compacting else cfg.max_depth
                for i in range(n_full_depths):
                    t0 = time.perf_counter() if time_depths else 0.0
                    carry = depth_jits[i](scene, carry, key)
                    lap(f"depth{i}", t0, carry)
                if compacting:
                    t0 = time.perf_counter() if time_depths else 0.0
                    packed, n_live, light, dropped = (
                        self._pack_partition_jit(carry)
                    )
                    nl = int(n_live)
                    t0 = lap("partition", t0, packed)
                    for depth in range(rr, cfg.max_depth):
                        if nl == 0:
                            break
                        m = bucket(depth, nl, packed.shape[1])
                        fn = compact_depth_fn(depth, m)
                        packed_m, light, dr = fn(
                            scene, packed, n_live, light, key
                        )
                        dropped = dropped + dr
                        t0 = lap(f"depth{depth}", t0, light)
                        if depth + 1 < cfg.max_depth:
                            packed, n_live = self._partition_jit(
                                packed_m
                            )
                            nl = int(n_live)
                            t0 = lap(f"partition{depth}", t0, packed)
                else:
                    light, dropped = carry[4], carry[6]
                with_median = (
                    int(image_samples) < cfg.post_process_threshold
                )
                final, post = film_jit(
                    light, final_img, jnp.int32(image_samples),
                    with_median,
                )
                return final, post, dropped

            self._render_jit = run
        else:
            self._jit = {
                "raygen": jax.jit(raygen),
                "trace": jax.jit(stages["trace"]),
                "trace_secondary": jax.jit(stages["trace_secondary"]),
                "trace_secondary_compact": jax.jit(
                    stages["trace_secondary_compact"]
                ),
                "shade_hit": jax.jit(stages["shade_hit"]),
                "nee_prep": jax.jit(stages["nee_prep"],
                                    static_argnums=(4, 5)),
                "nee_accum": jax.jit(stages["nee_accum"]),
                "scatter": jax.jit(stages["scatter"]),
                "film": jax.jit(film, static_argnums=(3,)),
            }
            self._render_jit = self._run_frame
        self._accum_jit = True

    def _run_frame(self, scene, cam_arrays, key, final_img, image_samples):
        """Drive the stage executables for one frame (renderFrame,
        src/cudaRenderer.cu:2460-2558); the schedule itself lives in
        render/bounce.py, shared with the multi-chip paths."""
        J = self._jit
        o, d = J["raygen"](cam_arrays, key)
        light, dropped = run_bounce_loop(
            J, self.config, scene, o, d, key
        )
        with_median = int(image_samples) < self.config.post_process_threshold
        final, post = J["film"](light, final_img, image_samples,
                                with_median)
        return final, post, dropped

    def _reset_accumulation(self) -> None:
        cfg = self.config
        self._final_image = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
        self._post_image = None
        self.image_samples = 0

    def _camera_arrays(self):
        if self.camera_mode == "cutracer":
            if self.cutracer_camera is None:
                raise ValueError("scene has no collada camera for cutracer mode")
            return self.cutracer_camera.as_arrays()
        return (
            jnp.asarray(self.camera.pos, jnp.float32),
            jnp.asarray(self.camera.c2w, jnp.float32),
        )

    # -- per-frame render (renderAccumulate, src/cudaRenderer.cu:2411-2457)
    def render(self) -> None:
        if self._render_jit is None:
            self.setup()
        cfg = self.config
        key = jax.random.fold_in(
            jax.random.PRNGKey(cfg.seed), self.frame_index
        )
        t0 = time.perf_counter()
        final, post, dropped = self._render_jit(
            self.scene,
            self._camera_arrays(),
            key,
            self._final_image,
            jnp.int32(self.image_samples),
        )
        final.block_until_ready()
        self.stage_times["frame"] = time.perf_counter() - t0
        self._final_image = final
        self._post_image = post
        self._dropped = int(dropped)
        self.image_samples += cfg.samples_per_frame
        self.frame_index += 1

    def render_to(self, total_spp: Optional[int] = None) -> np.ndarray:
        """Accumulate frames until total_spp samples/pixel, then return
        the image (the headless render_scene analog)."""
        cfg = self.config
        target = total_spp or cfg.total_samples
        while self.image_samples < target:
            self.render()
        return self.get_image()

    # -- image access (getImage, src/cudaRenderer.cu:1539-1570) -----------
    def get_image(self) -> np.ndarray:
        if self.image_samples < self.config.post_process_threshold and (
            self._post_image is not None
        ):
            return np.asarray(self._post_image)
        return np.asarray(self._final_image)

    def get_raw_image(self) -> np.ndarray:
        return np.asarray(self._final_image)

    # -- interactive camera (setViewpoint, src/cudaRenderer.cu:1845-1870) -
    def set_viewpoint(self, origin, look_at) -> None:
        cam = self.camera
        origin = np.asarray(origin, dtype=np.float64)
        look_at = np.asarray(look_at, dtype=np.float64)
        z = origin - look_at  # backward
        z = z / np.linalg.norm(z)
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        cam.pos = origin
        cam.c2w = np.stack([x, y, z], axis=1)
        if self.cutracer_camera is not None:
            self.cutracer_camera.origin = origin
            self.cutracer_camera.look_at = -z
        self._reset_accumulation()

    # -- checkpoint / resume ----------------------------------------------
    # The reference has no render checkpointing (accumulation state is
    # device-only and lost on exit; SURVEY.md section 5) — this saves
    # the accumulated framebuffer + sample count + RNG position, so a
    # long accumulation can resume exactly.
    def save_checkpoint(self, path: str) -> None:
        if self._final_image is None:
            raise RuntimeError(
                "nothing to checkpoint: no frame rendered yet"
            )
        np.savez(
            path,
            final_image=np.asarray(self._final_image),
            image_samples=self.image_samples,
            frame_index=self.frame_index,
            seed=self.config.seed,
            width=self.config.width,
            height=self.config.height,
        )

    def load_checkpoint(self, path: str) -> None:
        data = np.load(path)
        if (int(data["width"]), int(data["height"])) != (
            self.config.width, self.config.height
        ):
            raise ValueError("checkpoint resolution mismatch")
        if int(data["seed"]) != self.config.seed:
            raise ValueError("checkpoint RNG seed mismatch")
        self._final_image = jnp.asarray(data["final_image"])
        self.image_samples = int(data["image_samples"])
        self.frame_index = int(data["frame_index"])
        self._post_image = None

    @property
    def mrays_per_frame(self) -> float:
        """Total rays traced per frame (camera + shadow + bounce)."""
        cfg = self.config
        n = cfg.rays_per_frame
        traversals = 1
        for depth in range(cfg.max_depth):
            num_nee, _ = (
                cfg.nee_schedule[depth]
                if depth < len(cfg.nee_schedule)
                else (0, 0.0)
            )
            traversals += num_nee * max(self.scene.num_lights, 1)
            if depth + 1 < cfg.max_depth:
                traversals += 1
        return n * traversals / 1e6

"""Isolate the engine-vs-oracle radiance bias by component.

Renders the Cornell box at depth 1 with (a) emission only and (b)
emission + NEE, for both the device engine (XLA traversal, CPU) and the
CPU oracle, with matched cameras.  Prints mean-image brightness per
component.
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.models.cornell import cornell_box_scene
from cuda_raytracer_tpu.render.engine import WavefrontRenderer
from cuda_raytracer_tpu.render.pathtracer import PathTracer
from cuda_raytracer_tpu.scene.camera import Camera

W, H = 32, 24


def camera():
    cam = Camera()
    cam.ar = W / H
    cam.pos = np.array([0.0, 0.75, 2.5])
    target = np.array([0.0, 0.75, 0.0])
    back = cam.pos - target
    back /= np.linalg.norm(back)
    right = np.cross(np.array([0.0, 1.0, 0.0]), back)
    right /= np.linalg.norm(right)
    up = np.cross(back, right)
    cam.c2w = np.stack([right, up, back], axis=1)
    return cam


def engine_render(depth, schedule, frames=24, spp=4):
    cfg = RenderConfig(width=W, height=H, samples_per_frame=spp,
                       max_depth=depth, nee_schedule=schedule,
                       traversal="xla")
    r = WavefrontRenderer(cfg)
    r.load_static_scene(cornell_box_scene(with_spheres=True))
    r.set_viewpoint([0, 0.75, 2.5], [0, 0.75, 0])
    for _ in range(frames):
        r.render()
    return r.get_raw_image().astype(np.float64)


def oracle_render(depth, nee, spp=64):
    pt = PathTracer(ns_aa=spp, max_ray_depth=depth, num_threads=8)
    if not nee:
        # disable NEE by removing lights from the light list (emission
        # geometry stays)
        scene = cornell_box_scene(with_spheres=True)
        scene.lights = []
    else:
        scene = cornell_box_scene(with_spheres=True)
    pt.set_frame_size(W, H)
    pt.set_camera(camera())
    pt.set_scene(scene)
    pt.start_raytracing()
    t0 = time.time()
    while not pt.is_done():
        assert time.time() - t0 < 600
        time.sleep(0.05)
    return pt.sample_buffer.copy()


def main():
    em_e = engine_render(1, ((0, 0.0),))
    full_e = engine_render(1, ((1, 1.0),))
    em_o = oracle_render(1, nee=False)
    full_o = oracle_render(1, nee=True)

    def stat(name, a, b):
        print(f"{name:22s} engine={a.mean():.5f} oracle={b.mean():.5f} "
              f"ratio={a.mean() / max(b.mean(), 1e-12):.4f}")

    stat("depth1 emission-only", em_e, em_o)
    stat("depth1 NEE-only", full_e - em_e, full_o - em_o)
    stat("depth1 total", full_e, full_o)

    d2_e = engine_render(2, ((1, 1.0), (1, 1.0)))
    d2_o = oracle_render(2, nee=True)
    stat("depth2 total", d2_e, d2_o)
    stat("depth2 - depth1", d2_e - full_e, d2_o - full_o)


if __name__ == "__main__":
    main()

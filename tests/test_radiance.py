"""Per-pixel statistical radiance verification: device engine vs CPU
oracle with a matched camera and a z-test bound (VERDICT round 1, item
6 — replaces the loose 35% mean-brightness check as the quantitative
gate; the brightness check remains as a smoke test).

Both renderers estimate the same per-pixel integral with independent
samples, so (mean_eng - mean_cpu) / sqrt(se_eng^2 + se_cpu^2) is
asymptotically standard normal per pixel.  A failing run means a real
estimator bug, not noise: with ~2.3k pixel-channels, P(any |z| > 6)
under H0 is ~1e-5 even allowing heavy-tailed CLT slack.
"""

import time

import numpy as np

from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.models.cornell import cornell_box_scene
from cuda_raytracer_tpu.render.engine import WavefrontRenderer
from cuda_raytracer_tpu.render.pathtracer import PathTracer
from cuda_raytracer_tpu.scene.camera import Camera

W, H = 32, 24
CPU_SPP = 48
ENG_FRAMES, ENG_SPP = 12, 4


def _camera():
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


def test_engine_matches_oracle_per_pixel_ztest():
    scene = cornell_box_scene(with_spheres=True)  # diffuse spheres

    # --- CPU oracle with per-pixel standard errors ---
    pt = PathTracer(ns_aa=CPU_SPP, max_ray_depth=3, num_threads=4)
    pt.set_frame_size(W, H)
    pt.set_camera(_camera())
    pt.set_scene(scene)
    pt.start_raytracing()

    # --- device engine: per-frame images give the engine-side SE ---
    cfg = RenderConfig(width=W, height=H, samples_per_frame=ENG_SPP,
                       max_depth=3)
    r = WavefrontRenderer(cfg)
    r.load_static_scene(scene)
    r.set_viewpoint([0, 0.75, 2.5], [0, 0.75, 0])
    frames = []
    prev = np.zeros((H, W, 3))
    for k in range(1, ENG_FRAMES + 1):
        r.render()
        acc = r.get_raw_image().astype(np.float64)
        frames.append((acc * k - prev * (k - 1)))
        prev = acc
    frames = np.stack(frames)  # [K, H, W, 3] per-frame means
    eng_mean = frames.mean(axis=0)
    eng_se2 = frames.var(axis=0, ddof=1) / ENG_FRAMES

    deadline = time.time() + 400
    while not pt.is_done():
        assert time.time() < deadline, "oracle render timed out"
        time.sleep(0.05)
    cpu_mean = pt.sample_buffer
    cpu_se2 = pt.se2_buffer

    diff = eng_mean - cpu_mean
    se2 = eng_se2 + cpu_se2
    # floor the SE: pixels with zero sample variance (e.g. pure emitter
    # facing the camera) still carry float rounding
    z = diff / np.sqrt(se2 + 1e-12)

    frac_over_4 = float((np.abs(z) > 4.0).mean())
    max_abs_z = float(np.abs(z).max())
    mean_abs_z = float(np.abs(z).mean())
    # Under H0, E|z| ~ 0.8, P(|z|>4) ~ 6e-5.  Generous slack for CLT
    # heavy tails at 48 samples; a systematic estimator bias at even a
    # few percent of pixel radiance blows these bounds immediately.
    assert mean_abs_z < 1.6, f"systematic bias: mean|z|={mean_abs_z:.2f}"
    assert frac_over_4 < 0.01, f"{frac_over_4:.2%} of pixels beyond 4 sigma"
    assert max_abs_z < 10.0, f"max |z| = {max_abs_z:.1f}"
    # and the integral estimates agree globally
    rel = abs(eng_mean.mean() - cpu_mean.mean()) / cpu_mean.mean()
    assert rel < 0.05, f"global mean differs by {rel:.1%}"

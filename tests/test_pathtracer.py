"""CPU PathTracer facade (state machine, tile queue, oracle integrator)
and engine checkpoint/resume."""

import numpy as np
import pytest

from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.models.cornell import cornell_box_scene
from cuda_raytracer_tpu.render.engine import WavefrontRenderer
from cuda_raytracer_tpu.render.pathtracer import (
    PathTracer,
    State,
    WorkItem,
    WorkQueue,
)
from cuda_raytracer_tpu.scene.camera import Camera


def _camera(w, h):
    cam = Camera()
    cam.ar = w / h
    cam.pos = np.array([0.0, 0.75, 2.5])
    target = np.array([0.0, 0.75, 0.0])
    back = cam.pos - target
    back /= np.linalg.norm(back)
    right = np.cross(np.array([0.0, 1.0, 0.0]), back)
    right /= np.linalg.norm(right)
    up = np.cross(back, right)
    cam.c2w = np.stack([right, up, back], axis=1)
    return cam


def _tracer(ns_aa=4, depth=3, threads=2, w=48, h=32):
    pt = PathTracer(ns_aa=ns_aa, max_ray_depth=depth, num_threads=threads)
    pt.set_frame_size(w, h)
    pt.set_camera(_camera(w, h))
    pt.set_scene(cornell_box_scene(with_spheres=True))
    return pt


def test_work_queue():
    q = WorkQueue()
    q.put_work("a", 3)
    assert [q.get_work() for _ in range(4)] == ["a", "a", "a", None]
    q.put_work("b")
    q.clear()
    assert q.get_work() is None


def test_state_machine():
    pt = PathTracer()
    assert pt.state is State.INIT
    pt.set_frame_size(32, 32)
    assert pt.state is State.INIT  # still no scene/camera
    pt.set_camera(_camera(32, 32))
    pt.set_scene(cornell_box_scene())
    assert pt.state is State.READY
    pt.start_raytracing()
    assert pt.state is State.RENDERING
    while not pt.is_done():
        pass
    assert pt.state is State.DONE


def test_tiled_threaded_render_energy():
    pt = _tracer()
    pt.start_raytracing()
    import time

    deadline = time.time() + 120
    while not pt.is_done():
        assert time.time() < deadline, "render timed out"
        time.sleep(0.05)
    done, total = pt.update_screen()
    assert done == total == ((48 + 31) // 32) * ((32 + 31) // 32)
    img = pt.sample_buffer
    assert np.all(np.isfinite(img))
    assert img.max() > 0.05
    assert img.mean() < 5.0
    # the emissive ceiling panel must be the brightest region
    top = img[: img.shape[0] // 4].mean()
    bottom = img[-img.shape[0] // 4 :].mean()
    assert top > bottom


def test_oracle_agrees_with_engine_brightness():
    """The numpy oracle and the TPU wavefront engine estimate the same
    integral: mean radiance must agree to Monte-Carlo tolerance."""
    w, h = 48, 32
    pt = _tracer(ns_aa=16, depth=3, threads=4, w=w, h=h)
    pt.start_raytracing()
    cfg = RenderConfig(width=w, height=h, samples_per_frame=2, max_depth=3)
    r = WavefrontRenderer(cfg)
    r.load_static_scene(cornell_box_scene(with_spheres=True))
    r.set_viewpoint([0, 0.75, 2.5], [0, 0.75, 0])
    for _ in range(8):
        r.render()
    eng = r.get_raw_image()
    import time

    deadline = time.time() + 180
    while not pt.is_done():
        assert time.time() < deadline, "oracle render timed out"
        time.sleep(0.05)
    cpu = pt.sample_buffer
    assert abs(cpu.mean() - eng.mean()) / max(eng.mean(), 1e-9) < 0.35


def test_raytrace_pixel():
    pt = _tracer(ns_aa=8)
    c = pt.raytrace_pixel(24, 16)
    assert c.shape == (3,)
    assert np.all(np.isfinite(c)) and np.all(c >= 0)


def test_visualize_accel_and_descent():
    pt = _tracer()
    pt.state = State.VISUALIZE
    img = pt.visualize_accel()
    assert img.shape == (32, 48, 3)
    assert (img > 0).any()  # some wireframe pixels landed on screen
    root = pt.selection_history[-1]
    pt.key_press("<")
    if root.l is not None:
        assert pt.selection_history[-1] is root.l
        pt.key_press("up")
    assert pt.selection_history[-1] is root


def test_save_image(tmp_path):
    pt = _tracer(ns_aa=2, depth=2)
    pt.start_raytracing()
    while not pt.is_done():
        pass
    out = tmp_path / "out.png"
    pt.save_image(str(out))
    assert out.exists() and out.stat().st_size > 100


def test_engine_checkpoint_resume(tmp_path):
    cfg = dict(width=48, height=32, samples_per_frame=2)
    a = WavefrontRenderer(RenderConfig(**cfg))
    a.load_static_scene(cornell_box_scene(with_spheres=True))
    a.set_viewpoint([0, 0.75, 2.5], [0, 0.75, 0])
    for _ in range(4):
        a.render()
    ref = a.get_raw_image()

    b = WavefrontRenderer(RenderConfig(**cfg))
    b.load_static_scene(cornell_box_scene(with_spheres=True))
    b.set_viewpoint([0, 0.75, 2.5], [0, 0.75, 0])
    for _ in range(2):
        b.render()
    ckpt = tmp_path / "ck.npz"
    b.save_checkpoint(str(ckpt))

    c = WavefrontRenderer(RenderConfig(**cfg))
    c.load_static_scene(cornell_box_scene(with_spheres=True))
    c.set_viewpoint([0, 0.75, 2.5], [0, 0.75, 0])
    c.load_checkpoint(str(ckpt))
    assert c.image_samples == 4  # 2 frames x 2 spp
    for _ in range(2):
        c.render()
    np.testing.assert_allclose(c.get_raw_image(), ref, rtol=1e-5, atol=1e-6)


def test_checkpoint_validation(tmp_path):
    cfg = dict(width=48, height=32, samples_per_frame=2)
    a = WavefrontRenderer(RenderConfig(**cfg))
    a.load_static_scene(cornell_box_scene())
    a.set_viewpoint([0, 0.75, 2.5], [0, 0.75, 0])
    a.render()
    ckpt = tmp_path / "ck.npz"
    a.save_checkpoint(str(ckpt))

    wrong_res = WavefrontRenderer(RenderConfig(width=64, height=32))
    with pytest.raises(ValueError, match="resolution"):
        wrong_res.load_checkpoint(str(ckpt))
    wrong_seed = WavefrontRenderer(RenderConfig(seed=1, **cfg))
    with pytest.raises(ValueError, match="seed"):
        wrong_seed.load_checkpoint(str(ckpt))

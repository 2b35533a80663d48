"""Environment light: device sampling, miss shading, furnace test."""

import numpy as np
import jax.numpy as jnp

from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.ops import shade as S
from cuda_raytracer_tpu.render.engine import WavefrontRenderer
from cuda_raytracer_tpu.render.flatscene import flatten_scene
from cuda_raytracer_tpu.scene import static_scene as st
from cuda_raytracer_tpu.scene.bsdf import DiffuseBSDF


def sphere_under_env(env, albedo=1.0):
    sphere = st.SphereObject(
        np.zeros(3), 1.0, DiffuseBSDF(np.array([albedo] * 3))
    )
    return st.Scene([sphere], [st.EnvironmentLight(env)])


def test_flatten_env_tables():
    env = np.ones((8, 16, 3))
    flat, _ = flatten_scene(sphere_under_env(env))
    assert flat.has_env
    assert flat.env_map.shape == (8, 16, 3)
    assert flat.light_kinds == (5,)
    np.testing.assert_allclose(float(flat.env_cdf[-1]), 1.0, atol=1e-5)

    flat2, _ = flatten_scene(
        st.Scene([st.SphereObject(np.zeros(3), 1.0,
                                  DiffuseBSDF(np.ones(3)))], [])
    )
    assert not flat2.has_env


def test_env_sample_light_distribution():
    """Importance sampling concentrates on the bright texel and the
    Le/pdf estimator stays finite and direction-consistent."""
    env = np.zeros((16, 32, 3))
    env[4, 10] = 50.0  # single bright patch
    env += 0.01
    flat, _ = flatten_scene(sphere_under_env(env))
    n = 4096
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random((n, 2)), jnp.float32)
    pt = jnp.zeros((n, 3), jnp.float32)
    le_over_pdf, wi, dist = S.sample_light(flat, 0, pt, u)
    le_over_pdf, wi = np.asarray(le_over_pdf), np.asarray(wi)
    assert np.all(np.isfinite(le_over_pdf)) and np.all(le_over_pdf >= 0)
    np.testing.assert_allclose(
        np.linalg.norm(wi, axis=1), 1.0, atol=1e-5
    )
    # most samples should land on the bright texel's direction
    theta = (4 + 0.5) / 16 * np.pi
    bright_dir_y = np.cos(theta)
    frac_bright = np.mean(np.abs(wi[:, 1] - bright_dir_y) < 0.1)
    assert frac_bright > 0.5


def test_env_radiance_lookup():
    env = np.zeros((8, 16, 3))
    env[0, :] = [1.0, 2.0, 3.0]  # top band (+y)
    flat, _ = flatten_scene(sphere_under_env(env))
    d = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]], jnp.float32)
    out = np.asarray(S.env_radiance(flat, d))
    np.testing.assert_allclose(out[0], [1.0, 2.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(out[1], 0.0, atol=1e-6)


def test_furnace():
    """Uniform environment L around a white (albedo 1) sphere: every
    pixel — sphere or background — converges to L."""
    L = 0.7
    env = np.full((8, 16, 3), L)
    scene = sphere_under_env(env, albedo=1.0)
    r = WavefrontRenderer(
        RenderConfig(width=32, height=24, samples_per_frame=8, max_depth=10,
                     hemisphere_sampling='uniform')
    )
    r.load_static_scene(scene)
    r.set_viewpoint([0, 0, 4], [0, 0, 0])
    for _ in range(6):
        r.render()
    img = r.get_raw_image()
    # background pixels: exactly L
    corner = img[:2, :2].mean()
    np.testing.assert_allclose(corner, L, rtol=1e-3)
    # sphere pixels: approach L (finite depth truncates a small tail)
    center = img[10:14, 14:18].mean()
    assert abs(center - L) / L < 0.2, f"furnace failed: {center} vs {L}"
    assert np.isfinite(img).all()


def test_env_oracle_agrees_with_engine():
    from cuda_raytracer_tpu.render.pathtracer import PathTracer
    from cuda_raytracer_tpu.scene.camera import Camera

    env = np.full((8, 16, 3), 0.5)
    env[:2] = 2.0  # brighter sky above
    scene = sphere_under_env(env, albedo=0.6)
    r = WavefrontRenderer(
        RenderConfig(width=32, height=24, samples_per_frame=4, max_depth=4)
    )
    r.load_static_scene(scene)
    r.set_viewpoint([0, 0, 4], [0, 0, 0])
    for _ in range(4):
        r.render()
    eng = r.get_raw_image()

    pt = PathTracer(ns_aa=8, max_ray_depth=4, num_threads=2)
    pt.set_frame_size(32, 24)
    cam = Camera()
    cam.ar = 32 / 24
    cam.pos = r.camera.pos.copy()
    cam.c2w = r.camera.c2w.copy()
    pt.set_camera(cam)
    pt.set_scene(scene)
    pt.start_raytracing()
    import time

    deadline = time.time() + 120
    while not pt.is_done():
        assert time.time() < deadline
        time.sleep(0.05)
    cpu = pt.sample_buffer
    assert abs(eng.mean() - cpu.mean()) / cpu.mean() < 0.3

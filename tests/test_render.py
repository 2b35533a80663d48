"""End-to-end render tests: energy sanity, determinism, shadows,
film pipeline."""

import numpy as np
import pytest
import jax.numpy as jnp

from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.models.cornell import cornell_box_scene
from cuda_raytracer_tpu.ops import filters as F
from cuda_raytracer_tpu.render.engine import WavefrontRenderer


def small_renderer(**kw):
    cfg = RenderConfig(width=64, height=48, samples_per_frame=2, **kw)
    r = WavefrontRenderer(cfg)
    scene = cornell_box_scene(with_spheres=True)
    r.load_static_scene(scene)
    # camera at the box mouth looking in
    r.set_viewpoint([0, 0.75, 2.5], [0, 0.75, 0])
    return r


def test_render_basic_energy():
    r = small_renderer()
    r.render()
    img = r.get_raw_image()
    assert img.shape == (48, 64, 3)
    assert np.all(np.isfinite(img))
    assert img.max() > 0.05  # some light reaches the film
    assert img.mean() < 5.0  # no energy explosion
    assert r._dropped == 0


def test_render_deterministic():
    a = small_renderer()
    a.render()
    b = small_renderer()
    b.render()
    np.testing.assert_array_equal(a.get_raw_image(), b.get_raw_image())


def test_spheres_cast_shadows():
    r = small_renderer()
    for _ in range(8):
        r.render()
    img = r.get_raw_image()
    # region under the left sphere (image lower-left quadrant center)
    # must be darker than the open floor next to it
    h, w, _ = img.shape
    under = img[int(h * 0.8), int(w * 0.3)].mean()
    open_floor = img[int(h * 0.8), int(w * 0.5)].mean()
    assert under < open_floor


def test_walls_bleed_color():
    r = small_renderer()
    for _ in range(16):
        r.render()
    img = r.get_raw_image()
    h, w, _ = img.shape
    left = img[h // 2, 2]
    right = img[h // 2, w - 3]
    assert left[0] > left[2]  # red wall: R > B
    assert right[2] > right[0]  # blue wall: B > R


def test_accumulate_running_average():
    a = jnp.ones((4, 4, 3))
    b = jnp.zeros((4, 4, 3))
    out = F.accumulate(a, b, 6.0, 2.0)
    np.testing.assert_allclose(np.asarray(out), 0.75)


def test_reconstruct_layout():
    spp = 4
    light = jnp.arange(2 * 3 * spp * 3, dtype=jnp.float32).reshape(-1, 3)
    img = F.reconstruct(light, width=3, height=2, spp=spp)
    assert img.shape == (2, 3, 3)
    expect00 = light[0:spp, 0].mean()
    np.testing.assert_allclose(np.asarray(img[0, 0, 0]), expect00)


def test_median_filter():
    img = jnp.zeros((8, 8, 3)).at[4, 4].set(100.0)
    out = F.median_filter_3x3(img)
    assert float(out[4, 4, 0]) == 0.0  # lone spike removed
    flat = jnp.full((8, 8, 3), 0.5)
    np.testing.assert_allclose(np.asarray(F.median_filter_3x3(flat)), 0.5)


def test_mirror_glass_paths_finite():
    cfg = RenderConfig(width=48, height=32, samples_per_frame=2, max_depth=4)
    r = WavefrontRenderer(cfg)
    r.load_static_scene(cornell_box_scene(with_spheres=True, sphere_bsdfs="classic"))
    r.set_viewpoint([0, 0.75, 2.5], [0, 0.75, 0])
    r.render()
    img = r.get_raw_image()
    assert np.all(np.isfinite(img))
    assert img.max() > 0.01


def test_reset_on_move():
    r = small_renderer()
    r.render()
    assert r.image_samples == 2
    r.set_viewpoint([0, 0.75, 2.0], [0, 0.75, 0])
    assert r.image_samples == 0
    assert np.all(r.get_raw_image() == 0)


def test_infinite_light_nee_not_black():
    """Regression: maxT=inf from hemisphere/directional lights made the
    shadow visibility test unsatisfiable, killing all NEE light."""
    from cuda_raytracer_tpu.scene import static_scene as st
    from cuda_raytracer_tpu.scene.bsdf import DiffuseBSDF

    floor = st.Mesh(
        np.array([[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]], float),
        np.tile([[0.0, 1.0, 0.0]], (4, 1)),
        np.array([[0, 1, 2], [0, 2, 3]]),
        DiffuseBSDF(np.array([0.8, 0.8, 0.8])),
    )
    for light in (
        st.InfiniteHemisphereLight(np.array([1.0, 1.0, 1.0])),
        st.DirectionalLight(np.array([1.0, 1.0, 1.0]),
                            np.array([-0.3, -1.0, -0.2])),
    ):
        cfg = RenderConfig(width=32, height=24, samples_per_frame=4)
        r = WavefrontRenderer(cfg)
        r.load_static_scene(st.Scene([floor], [light]))
        r.set_viewpoint([0, 2, 5], [0, 0, 0])
        r.render()
        img = r.get_raw_image()
        assert img.max() > 0.05, f"{light.__class__.__name__} NEE black"
        assert np.all(np.isfinite(img))

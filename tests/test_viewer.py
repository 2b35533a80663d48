"""Headless progressive viewer: movement resets accumulation."""

import numpy as np

from cuda_raytracer_tpu.apps.viewer import InteractiveViewer
from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.models.cornell import cornell_box_scene
from cuda_raytracer_tpu.render.engine import WavefrontRenderer


def make_viewer():
    r = WavefrontRenderer(RenderConfig(width=48, height=36, samples_per_frame=2))
    r.load_static_scene(cornell_box_scene(with_spheres=True))
    r.set_viewpoint([0, 0.75, 2.5], [0, 0.75, 0])
    return InteractiveViewer(renderer=r)


def test_progressive_accumulation():
    v = make_viewer()
    v.frame()
    assert v.status()["spp"] == 2
    v.spin(3)
    assert v.status()["spp"] == 8


def test_move_resets_accumulation():
    v = make_viewer()
    v.spin(2)
    assert v.status()["spp"] == 4
    before = v.renderer.camera.pos.copy()
    assert v.key("w")  # dolly in
    assert v.status()["spp"] == 0  # reset on move
    assert not np.allclose(v.renderer.camera.pos, before)
    img = v.frame()
    assert np.isfinite(img).all() and img.max() > 0


def test_orbit_and_home():
    v = make_viewer()
    p0 = v.renderer.camera.pos.copy()
    assert v.key("h")
    p1 = v.renderer.camera.pos.copy()
    assert not np.allclose(p0, p1)
    assert v.key("r")  # home restores the original pose
    np.testing.assert_allclose(v.renderer.camera.pos, p0, atol=1e-12)


def test_unknown_key_is_noop():
    v = make_viewer()
    v.spin(1)
    assert not v.key("z")
    assert v.status()["spp"] == 2  # unchanged, no reset


def test_viewer_session_keys(tmp_path, monkeypatch):
    """W+digit saves, L+digit reloads (application.h:281-296)."""
    import os

    from cuda_raytracer_tpu.apps.viewer import InteractiveViewer
    from cuda_raytracer_tpu.config import RenderConfig

    monkeypatch.chdir(tmp_path)
    v = InteractiveViewer(
        RenderConfig(width=16, height=12, samples_per_frame=2,
                     max_depth=2),
        scene_path="/root/reference/media/pathtracer/basic/sphere_diffuse.dae",
    )
    assert not v.key("W")
    assert not v.key("3")
    assert os.path.exists(tmp_path / "Scene_3.dae")
    assert not v.key("L")
    assert v.key("3")  # load resets accumulation -> "moved"
    assert v.renderer.dynamic_scene is not None

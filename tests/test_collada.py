"""Scene I/O tests: parser semantics against the reference's behavior."""

import glob
import os

import numpy as np
import pytest

from cuda_raytracer_tpu.scene import static_scene as st
from cuda_raytracer_tpu.scene.collada import ColladaParser, load_scene_info
from cuda_raytracer_tpu.scene.collada_info import InstanceType, LightType, SceneInfo
from cuda_raytracer_tpu.scene.dynamic_scene import load_from_scene_info

from conftest import REFERENCE_MEDIA, media_path

needs_media = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_MEDIA), reason="reference media not available"
)


@needs_media
def test_all_shipped_scenes_parse():
    files = sorted(glob.glob(os.path.join(REFERENCE_MEDIA, "*", "*.dae")))
    assert len(files) >= 20
    for f in files:
        scene, *_ = load_from_scene_info(load_scene_info(f))
        ss = scene.get_static_scene()
        assert len(ss.objects) > 0 or len(ss.lights) > 0


@needs_media
def test_cbspheres_inventory():
    info = load_scene_info(media_path("advanced/CBspheres_lambertian.dae"))
    types = [n.instance.type for n in info.nodes if n.instance]
    assert types.count(InstanceType.POLYMESH) == 6
    assert types.count(InstanceType.SPHERE) == 2
    assert types.count(InstanceType.CAMERA) == 1
    lights = [n.instance for n in info.nodes if n.instance
              and n.instance.type == InstanceType.LIGHT]
    assert len(lights) == 1 and lights[0].light_type == LightType.AREA
    np.testing.assert_allclose(lights[0].spectrum, [10, 10, 10])

    scene, cam_info, _, cut = load_from_scene_info(info)
    ss = scene.get_static_scene()
    area = [l for l in ss.lights if isinstance(l, st.AreaLight)]
    assert len(area) == 1
    # transformed area light (dynamic_scene/area_light.h semantics)
    np.testing.assert_allclose(area[0].position, [0, 1.49, 0], atol=1e-5)
    assert abs(cam_info.hFov - 49.13434) < 1e-3


@needs_media
def test_zup_correction_applied():
    # CBspheres is a Z_UP blender export: the ceiling must end up along +y
    info = load_scene_info(media_path("advanced/CBspheres_lambertian.dae"))
    scene, *_ = load_from_scene_info(info)
    lo, hi = scene.get_bbox()
    assert hi[1] > 1.4  # ceiling at y ~ 1.5
    assert lo[1] > -0.1  # floor at y ~ 0


@needs_media
def test_material_profile():
    info = load_scene_info(media_path("advanced/CBgems.dae"))
    scene, *_ = load_from_scene_info(info)
    ss = scene.get_static_scene()
    kinds = {type(o.get_bsdf()).__name__ for o in ss.objects}
    assert "GlassBSDF" in kinds and "DiffuseBSDF" in kinds


def test_parser_error_paths(tmp_path):
    assert ColladaParser.load(str(tmp_path / "missing.dae"), SceneInfo()) == -1
    bad = tmp_path / "bad.dae"
    bad.write_text("<nope/>")
    assert ColladaParser.load(str(bad), SceneInfo()) == -1


@needs_media
def test_writer_roundtrip(tmp_path):
    info = load_scene_info(media_path("advanced/CBspheres_lambertian.dae"))
    out = str(tmp_path / "roundtrip.dae")
    assert ColladaParser.save(out, info) == 0
    info2 = load_scene_info(out)
    s1, *_ = load_from_scene_info(info)
    s2, *_ = load_from_scene_info(info2)
    ss1, ss2 = s1.get_static_scene(), s2.get_static_scene()
    assert len(ss1.objects) == len(ss2.objects)
    t1 = sum(o.num_triangles() for o in ss1.objects if isinstance(o, st.Mesh))
    t2 = sum(o.num_triangles() for o in ss2.objects if isinstance(o, st.Mesh))
    assert t1 == t2

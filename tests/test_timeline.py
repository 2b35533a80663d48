"""Timeline semantics, TRS keyframing, and offline video rendering."""

import numpy as np

from cuda_raytracer_tpu.apps.animate import raytrace_video
from cuda_raytracer_tpu.apps.timeline import Timeline
from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.scene import dynamic_scene as dyn
from cuda_raytracer_tpu.scene.collada_info import (
    LightInfo,
    LightType,
    MaterialInfo,
    Polygon,
    PolymeshInfo,
)
from cuda_raytracer_tpu.scene.bsdf import DiffuseBSDF


def test_timeline_step_and_play():
    tl = Timeline(max_frame=3)
    assert not tl.step()  # not playing
    tl.action_play()
    assert [tl.step() for _ in range(4)] == [True, True, True, False]
    assert tl.get_current_frame() == 3 and not tl.is_currently_playing()
    tl.action_play()  # at the end: play rewinds first
    assert tl.get_current_frame() == 0
    tl.action_loop()
    for _ in range(4):
        tl.step()
    assert tl.get_current_frame() == 0  # wrapped through max inclusive


def test_timeline_actions():
    tl = Timeline(max_frame=10)
    tl.action_step_forward(4)
    assert tl.get_current_frame() == 4
    tl.action_step_backward(6)
    assert tl.get_current_frame() == 8  # modular wrap
    tl.action_goto_end()
    assert tl.get_current_frame() == 10
    tl.action_rewind()
    assert tl.get_current_frame() == 0
    tl.make_longer(5)
    assert tl.get_max_frame() == 15
    tl.make_shorter(20)
    assert tl.get_max_frame() == 1  # clamped to >= 1


def test_timeline_marked_times():
    tl = Timeline(max_frame=20)
    assert tl.mark_time(5) and tl.mark_time(15) and tl.mark_time(10)
    assert not tl.mark_time(10)  # already marked
    assert tl.marked_times == [5, 10, 15]
    tl.current_frame = 10
    assert tl.is_present_time_marked()
    assert tl.next_important_time() == 15
    assert tl.previous_important_time() == 5
    tl.action_goto_next_key_frame()
    assert tl.get_current_frame() == 15
    assert tl.next_important_time() == -1
    tl.action_goto_prev_key_frame()
    assert tl.get_current_frame() == 10
    assert tl.unmark_time(10)
    assert not tl.unmark_time(10)
    assert not tl.is_present_time_marked()


def _quad_mesh(albedo=(0.7, 0.7, 0.7)):
    info = PolymeshInfo(
        vertices=np.array(
            [[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]], dtype=np.float64
        ),
        polygons=[Polygon(vertex_indices=[0, 1, 2, 3])],
        material=MaterialInfo(bsdf=DiffuseBSDF(np.array(albedo))),
    )
    return dyn.Mesh(info, np.eye(4))


def test_mesh_keyframe_interpolation():
    m = _quad_mesh()
    m.position = np.array([0.0, 0.0, 0.0])
    m.keyframe(0.0)
    m.position = np.array([2.0, 0.0, 0.0])
    m.keyframe(10.0)

    v0 = m.get_transformed_static_object(0.0).positions
    v10 = m.get_transformed_static_object(10.0).positions
    vmid = m.get_transformed_static_object(5.0).positions
    np.testing.assert_allclose(v10[:, 0] - v0[:, 0], 2.0, atol=1e-9)
    # Catmull-Rom through two knots is linear: midpoint at +1
    np.testing.assert_allclose(vmid[:, 0] - v0[:, 0], 1.0, atol=1e-6)

    m.unkeyframe(10.0)
    v_after = m.get_transformed_static_object(5.0).positions
    np.testing.assert_allclose(v_after, v0, atol=1e-9)  # single knot: constant


def test_raytrace_video(tmp_path):
    mesh = _quad_mesh()
    mesh.position = np.zeros(3)
    mesh.keyframe(0.0)
    mesh.position = np.array([0.0, 0.8, 0.0])
    mesh.keyframe(2.0)
    light = dyn.init_light(
        LightInfo(
            light_type=LightType.AREA,
            spectrum=np.array([8.0, 8.0, 8.0]),
            position=np.array([0.0, 1.6, 0.0]),
            direction=np.array([0.0, -1.0, 0.0]),
            up=np.array([0.0, 0.0, 1.0]),
        ),
        np.eye(4),
    )
    scene = dyn.Scene([mesh], [light])
    cfg = RenderConfig(width=32, height=24, samples_per_frame=2)
    pos = np.array([0.0, 1.0, 4.0])
    c2w = np.eye(3)
    paths = raytrace_video(
        scene, cfg, max_frame=2, out_dir=str(tmp_path),
        prefix="Video_test_", spp=2, camera_pose=(pos, c2w),
    )
    assert [p.endswith(f"Video_test_{i:04d}.png") for i, p in enumerate(paths)]
    assert len(paths) == 2
    from cuda_raytracer_tpu.utils.image import load_png

    f0 = load_png(paths[0])
    f1 = load_png(paths[1])
    assert f0.shape == (24, 32, 3)
    assert not np.array_equal(f0, f1)  # the quad moved between frames

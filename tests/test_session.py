"""Session save/load buffers (application.h:281-296) and the wave
simulation (mesh.cpp:48-66 — stubs in the reference, implemented
here)."""

import numpy as np
import pytest

from cuda_raytracer_tpu.scene import load_scene_info
from cuda_raytracer_tpu.scene.dynamic_scene import load_from_scene_info
from cuda_raytracer_tpu.scene.session import SessionManager
from cuda_raytracer_tpu.scene.skeleton import Skeleton

DAE = "/root/reference/media/pathtracer/basic/sphere_diffuse.dae"
MESH_DAE = "/root/reference/media/meshedit/cube.dae"


@pytest.fixture
def scene():
    s, ci, cx, cc = load_from_scene_info(load_scene_info(DAE))
    return s


def test_session_round_trip(tmp_path, scene):
    mgr = SessionManager(str(tmp_path))
    assert mgr.occupied() == []
    sk = Skeleton(offset=(0, 1, 0))
    root = sk.create_joint([0, 1, 0])
    j = sk.create_joint([1, 0, 0], root)
    j.angle = np.array([10.0, 20.0, 30.0])
    sk.keyframe(0.0)
    scene.objects[0].skeleton = sk
    mgr.save(7, scene)
    assert mgr.occupied() == [7]

    scene2, ci2, cx2, cc2 = mgr.load(7)
    assert len(scene2.objects) == len(scene.objects)
    sk2 = scene2.objects[0].skeleton
    assert len(sk2.joints) == 2
    np.testing.assert_allclose(sk2.joints[1].angle, [10, 20, 30])
    assert sk2.joints[1].rotations.knots  # keyframe survived
    b1 = scene.get_static_scene().bbox()
    b2 = scene2.get_static_scene().bbox()
    np.testing.assert_allclose(b1[0], b2[0], atol=1e-4)
    np.testing.assert_allclose(b1[1], b2[1], atol=1e-4)


def test_session_preserves_mesh_edits(tmp_path):
    scene, *_ = load_from_scene_info(load_scene_info(MESH_DAE))
    mesh = next(o for o in scene.objects if hasattr(o, "halfedge_mesh"))
    from cuda_raytracer_tpu.geometry.meshedit import flip_edge

    hm = mesh.halfedge_mesh()
    n_edges = len(hm.edges)
    flip_edge(hm, hm.edges[0])
    mesh._sync_from_halfedge()
    v_before = np.array(mesh.mesh.vertices)
    mgr = SessionManager(str(tmp_path))
    mgr.save(0, scene)
    scene2 = mgr.load(0)[0]
    mesh2 = next(o for o in scene2.objects if hasattr(o, "halfedge_mesh"))
    assert len(mesh2.halfedge_mesh().edges) == n_edges
    np.testing.assert_allclose(
        np.sort(mesh2.mesh.vertices, axis=0),
        np.sort(v_before, axis=0),
        atol=1e-5,
    )


def test_bad_slot(tmp_path, scene):
    mgr = SessionManager(str(tmp_path))
    with pytest.raises(ValueError):
        mgr.save(10, scene)
    with pytest.raises(FileNotFoundError):
        mgr.load(4)


def test_wave_simulation():
    scene, *_ = load_from_scene_info(load_scene_info(MESH_DAE))
    mesh = next(o for o in scene.objects if hasattr(o, "halfedge_mesh"))
    mesh.set_wave_offset(0, 1.0)
    base = mesh.wave_vertices()
    assert not np.allclose(base, mesh.mesh.vertices)

    # symplectic euler: the bump propagates and (with damping) decays
    e0 = float(np.sum(mesh._wave_off**2))
    for _ in range(50):
        mesh.symplectic_euler(0.1, 0.01)
    off = mesh._wave_off
    assert np.count_nonzero(np.abs(off) > 1e-6) > 5, "wave spread"
    assert float(np.sum(off**2)) < e0 * 2, "bounded"
    for _ in range(2000):
        mesh.symplectic_euler(0.1, 0.05)
    assert float(np.abs(mesh._wave_off).max()) < 0.2, "damped out"

    # forward euler runs too (less stable, short horizon)
    mesh2 = mesh
    mesh2._wave_off = None
    mesh2.set_wave_offset(0, 1.0)
    for _ in range(10):
        mesh2.forward_euler(0.05, 0.01)
    assert np.isfinite(mesh2._wave_off).all()

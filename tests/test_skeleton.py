"""Skeleton FK/IK, skinning, and the XForm widget."""

import numpy as np

from cuda_raytracer_tpu.scene.skeleton import Joint, Skeleton, _rot_euler
from cuda_raytracer_tpu.scene.widgets import Mode, XFormWidget


def two_bone_arm():
    """Root at origin, two unit bones along +x."""
    sk = Skeleton()
    j1 = sk.create_joint([1.0, 0.0, 0.0])
    j2 = sk.create_joint([1.0, 0.0, 0.0], parent=j1)
    return sk, j1, j2


def test_fk_rest_pose():
    sk, j1, j2 = two_bone_arm()
    np.testing.assert_allclose(j1.get_base_pos_in_world(), [0, 0, 0])
    np.testing.assert_allclose(j1.get_end_pos_in_world(), [1, 0, 0])
    np.testing.assert_allclose(j2.get_base_pos_in_world(), [1, 0, 0])
    np.testing.assert_allclose(j2.get_end_pos_in_world(), [2, 0, 0])


def test_fk_rotation_chains():
    sk, j1, j2 = two_bone_arm()
    j1.angle = np.array([0.0, 0.0, 90.0])  # rotate root about +z
    np.testing.assert_allclose(
        j1.get_end_pos_in_world(), [0, 1, 0], atol=1e-12
    )
    np.testing.assert_allclose(
        j2.get_base_pos_in_world(), [0, 1, 0], atol=1e-12
    )
    # child inherits the parent frame: its bone now points along +y
    np.testing.assert_allclose(
        j2.get_end_pos_in_world(), [0, 2, 0], atol=1e-12
    )
    j2.angle = np.array([0.0, 0.0, -90.0])  # elbow bend back toward +x
    np.testing.assert_allclose(
        j2.get_end_pos_in_world(), [1, 1, 0], atol=1e-12
    )


def test_fk_offset_skeleton():
    sk = Skeleton(offset=[5.0, 0.0, 0.0])
    j = sk.create_joint([0.0, 1.0, 0.0])
    np.testing.assert_allclose(j.get_base_pos_in_world(), [5, 0, 0])
    np.testing.assert_allclose(j.get_end_pos_in_world(), [5, 1, 0])


def test_angle_keyframing():
    sk, j1, j2 = two_bone_arm()
    j1.angle = np.zeros(3)
    j1.keyframe(0.0)
    j1.angle = np.array([0.0, 0.0, 90.0])
    j1.keyframe(10.0)
    np.testing.assert_allclose(j1.get_angle(0.0), [0, 0, 0], atol=1e-9)
    np.testing.assert_allclose(j1.get_angle(10.0), [0, 0, 90], atol=1e-9)
    mid = j1.get_angle(5.0)
    assert 30.0 < mid[2] < 60.0  # interpolating
    np.testing.assert_allclose(
        j1.get_end_pos_in_world(time=10.0), [0, 1, 0], atol=1e-9
    )


def test_ik_reaches_target():
    sk, j1, j2 = two_bone_arm()
    target = np.array([1.2, 1.2, 0.0])  # reachable (|t| < 2)
    dist = sk.reach_for_target(j2, target)
    assert dist < 0.05, f"IK did not converge: dist={dist}"


def test_ik_unreachable_points_toward_target():
    sk, j1, j2 = two_bone_arm()
    target = np.array([0.0, 5.0, 0.0])  # out of reach (len 2 arm)
    sk.reach_for_target(j2, target, steps=400)
    end = j2.get_end_pos_in_world()
    # arm should be (nearly) straight up, length ~2
    np.testing.assert_allclose(end, [0, 2, 0], atol=0.1)


def test_skinning_rigid_follow():
    sk, j1, j2 = two_bone_arm()
    # one vertex on each bone's axis
    rest = np.array([[0.5, 0.01, 0.0], [1.5, 0.01, 0.0]])
    j1.angle = np.array([0.0, 0.0, 90.0])
    skinned = sk.skin_vertices(rest)
    # the first vertex follows bone 1 (rotates to ~(0, 0.5))
    np.testing.assert_allclose(skinned[0], [-0.01, 0.5, 0.0], atol=0.05)
    # the second follows bone 2 into the rotated frame (~(0, 1.5))
    np.testing.assert_allclose(skinned[1], [-0.01, 1.5, 0.0], atol=0.05)


def test_skinned_mesh_render_conversion():
    from cuda_raytracer_tpu.scene import dynamic_scene as dyn
    from cuda_raytracer_tpu.scene.bsdf import DiffuseBSDF
    from cuda_raytracer_tpu.scene.collada_info import (
        MaterialInfo, Polygon, PolymeshInfo,
    )

    info = PolymeshInfo(
        vertices=np.array(
            [[0, 0, 0], [1, 0, 0], [1, 0.2, 0], [0, 0.2, 0]], dtype=np.float64
        ),
        polygons=[Polygon(vertex_indices=[0, 1, 2, 3])],
        material=MaterialInfo(bsdf=DiffuseBSDF(np.array([0.6, 0.6, 0.6]))),
    )
    mesh = dyn.Mesh(info, np.eye(4))
    sk = Skeleton()
    j = sk.create_joint([1.0, 0.0, 0.0])
    mesh.skeleton = sk
    j.angle = np.zeros(3)
    mesh.keyframe(0.0)
    j.angle = np.array([0.0, 0.0, 90.0])
    mesh.keyframe(4.0)
    rest = mesh.get_transformed_static_object(0.0).positions
    bent = mesh.get_transformed_static_object(4.0).positions
    np.testing.assert_allclose(rest, info.vertices, atol=1e-6)
    assert not np.allclose(bent, rest)
    # vertex near the bone end swings up
    assert bent[1][1] > 0.8


def test_xform_widget():
    from cuda_raytracer_tpu.scene import dynamic_scene as dyn
    from cuda_raytracer_tpu.scene.bsdf import DiffuseBSDF
    from cuda_raytracer_tpu.scene.collada_info import (
        MaterialInfo, Polygon, PolymeshInfo,
    )

    info = PolymeshInfo(
        vertices=np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float64
        ),
        polygons=[Polygon(vertex_indices=[0, 1, 2])],
        material=MaterialInfo(bsdf=DiffuseBSDF(np.array([0.6, 0.6, 0.6]))),
    )
    mesh = dyn.Mesh(info, np.eye(4))
    w = XFormWidget()
    assert not w.drag(1.0, 0.0)  # no target yet
    w.set_target(mesh)

    w.set_translate()
    w.set_axis(0)
    assert w.drag(2.5, 0.0)
    np.testing.assert_allclose(mesh.position, [2.5, 0, 0])

    w.cycle_mode()
    assert w.mode is Mode.ROTATE
    w.set_axis(2)
    w.drag(45.0, 0.0)
    np.testing.assert_allclose(mesh.rotation, [0, 0, 45])

    w.cycle_mode()
    assert w.mode is Mode.SCALE
    w.set_axis(None)
    w.drag(0.5, 0.0)
    np.testing.assert_allclose(mesh.scale, [1.5, 1.5, 1.5])

    w.restore_last_mode()
    assert w.mode is Mode.ROTATE

    # vertex-level drag edits the halfedge mesh and syncs the render mesh
    hm = mesh.halfedge_mesh()
    v = hm.vertices[1]
    w.set_target(mesh, element=v)
    w.set_translate()
    w.set_axis(1)
    w.drag(0.25, 0.0)
    assert mesh.mesh.vertices[1][1] == 0.25

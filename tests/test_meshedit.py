"""Halfedge mesh structure + meshedit local/global operations."""

import numpy as np
import pytest

from cuda_raytracer_tpu.geometry import HalfedgeMesh
from cuda_raytracer_tpu.geometry.meshedit import (
    MeshResampler,
    collapse_edge,
    collapse_face,
    erase_edge,
    erase_vertex,
    find_edge,
    flip_edge,
    split_edge,
    subdivide,
)


def cube():
    """Closed quad cube."""
    p = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                 dtype=np.float64)
    quads = [
        [0, 1, 3, 2], [4, 6, 7, 5], [0, 4, 5, 1],
        [2, 3, 7, 6], [0, 2, 6, 4], [1, 5, 7, 3],
    ]
    return HalfedgeMesh(quads, p)


def tet():
    p = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    tris = [[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]]
    return HalfedgeMesh(tris, p)


def quad_patch(n=3):
    """n x n planar quad grid with boundary."""
    p = np.array([[i, j, 0] for j in range(n + 1) for i in range(n + 1)],
                 dtype=np.float64)
    quads = []
    for j in range(n):
        for i in range(n):
            a = j * (n + 1) + i
            quads.append([a, a + 1, a + n + 2, a + n + 1])
    return HalfedgeMesh(quads, p)


def test_build_closed():
    m = cube()
    m.validate()
    assert (m.n_vertices, m.n_edges, m.n_faces) == (8, 12, 6)
    assert m.euler_characteristic() == 2
    assert not m.boundaries
    assert all(v.degree() == 3 for v in m.vertices)
    assert all(f.degree() == 4 for f in m.faces)


def test_build_with_boundary():
    m = quad_patch(3)
    m.validate()
    assert (m.n_vertices, m.n_faces) == (16, 9)
    assert len(m.boundaries) == 1
    assert m.boundaries[0].degree() == 12
    assert sum(v.on_boundary for v in m.vertices) == 12


def test_build_rejects_nonmanifold():
    p = np.zeros((5, 3))
    with pytest.raises(ValueError):
        # edge (0,1) used twice with the same orientation
        HalfedgeMesh([[0, 1, 2], [0, 1, 3]], p)
    with pytest.raises(ValueError):
        HalfedgeMesh([[0, 1]], p)  # degree-2 polygon


def test_triangulate():
    m = cube()
    m.triangulate()
    m.validate()
    assert m.n_faces == 12
    assert all(f.degree() == 3 for f in m.faces)
    assert m.euler_characteristic() == 2


def test_flip_edge():
    m = tet()
    e = m.edges[0]
    a, b = e.endpoints()
    others = [v.id for v in m.vertices if v.id not in (a.id, b.id)]
    # on a tetrahedron the opposite edge already exists: flip must refuse
    assert flip_edge(m, e) is None
    # on a split square, flipping rotates the diagonal
    p = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
    m2 = HalfedgeMesh([[0, 1, 2], [0, 2, 3]], p)
    diag = find_edge(m2, 0, 2)
    new = flip_edge(m2, diag)
    m2.validate()
    assert new is not None
    assert {v.id for v in new.endpoints()} == {1, 3}
    assert find_edge(m2, 0, 2) is None


def test_flip_boundary_refused():
    p = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
    m = HalfedgeMesh([[0, 1, 2], [0, 2, 3]], p)
    assert flip_edge(m, find_edge(m, 0, 1)) is None


def test_split_edge_interior():
    m = tet()
    n_v, n_f, n_e = m.n_vertices, m.n_faces, m.n_edges
    v = split_edge(m, m.edges[0])
    m.validate()
    assert v is not None
    assert m.n_vertices == n_v + 1
    assert m.n_faces == n_f + 2
    assert m.n_edges == n_e + 3
    assert m.euler_characteristic() == 2


def test_split_edge_boundary():
    p = np.array([[0, 0, 0], [1, 0, 0], [0.5, 1, 0]], float)
    m = HalfedgeMesh([[0, 1, 2]], p)
    e = find_edge(m, 0, 1)
    v = split_edge(m, e)
    m.validate()
    assert v is not None
    np.testing.assert_allclose(v.position, [0.5, 0, 0])
    assert m.n_faces == 2


def test_collapse_edge():
    m = tet()
    e = m.edges[0]
    mid = e.midpoint()
    v = collapse_edge(m, e)
    m.validate()
    assert v is not None
    np.testing.assert_allclose(v.position, mid)
    # tetrahedron collapses to a degenerate 2-face "pillow"; both
    # remaining faces are triangles over 3 vertices
    assert m.n_vertices == 3


def test_collapse_edge_on_grid():
    m = quad_patch(3)
    n_v = m.n_vertices
    inner = find_edge(m, 5, 6)  # interior edge
    v = collapse_edge(m, inner)
    m.validate()
    assert v is not None and m.n_vertices == n_v - 1


def test_collapse_face():
    m = cube()
    f = m.faces[0]
    c = f.centroid()
    v = collapse_face(m, f)
    m.validate()
    assert v is not None
    np.testing.assert_allclose(v.position, c)
    assert m.n_vertices == 5  # 8 - 4 + 1


def test_erase_edge():
    m = cube()
    f = erase_edge(m, m.edges[0])
    m.validate()
    assert f is not None
    assert m.n_faces == 5
    assert f.degree() == 6  # two quads merged


def test_erase_vertex():
    m = cube()
    v = m.vertices[0]
    f = erase_vertex(m, v)
    m.validate()
    assert f is not None
    assert m.n_vertices == 7
    assert m.n_faces == 4  # 3 incident quads merged into 1
    assert f.degree() == 6


def test_erase_vertex_boundary_refused():
    m = quad_patch(2)
    assert erase_vertex(m, m.vertices[0]) is None


def test_subdivide_linear():
    m = cube()
    subdivide(m, catmull_clark=False)
    m.validate()
    assert all(f.degree() == 4 for f in m.faces)
    assert m.n_faces == 24
    assert m.euler_characteristic() == 2
    # linear: original corners unchanged
    assert any(np.allclose(v.position, [0, 0, 0]) for v in m.vertices)


def test_subdivide_catmull_clark():
    m = cube()
    subdivide(m, catmull_clark=True)
    m.validate()
    assert m.n_faces == 24
    assert all(f.degree() == 4 for f in m.faces)
    # CC smooths the cube strictly inside its bbox corners
    P = np.array([v.position for v in m.vertices])
    assert P.min() > -1e-9 and P.max() < 1.0 + 1e-9
    assert not any(np.allclose(v.position, [0, 0, 0]) for v in m.vertices)
    # corner-derived vertex points are pulled inward (to 2/9 for a unit
    # cube); face points legitimately stay on the original face planes
    corner_dists = np.linalg.norm(P, axis=1)
    assert corner_dists.min() > 0.3


def test_subdivide_catmull_clark_boundary():
    m = quad_patch(2)
    subdivide(m, catmull_clark=True)
    m.validate()
    assert m.n_faces == 16
    assert len(m.boundaries) == 1


def test_upsample_loop():
    m = tet()
    MeshResampler.upsample(m)
    m.validate()
    assert m.n_faces == 16
    assert all(f.degree() == 3 for f in m.faces)
    assert m.euler_characteristic() == 2
    # Loop smooths: original corners pulled inward
    P = np.array([v.position for v in m.vertices])
    assert not any(np.allclose(p, [1, 0, 0]) for p in P)


def test_upsample_quads_triangulates_first():
    m = cube()
    MeshResampler.upsample(m)
    m.validate()
    assert m.n_faces == 48  # 12 tris x 4


def test_downsample():
    m = tet()
    MeshResampler.upsample(m)  # 16 faces
    MeshResampler.downsample(m, target_faces=6)
    m.validate()
    assert m.n_faces <= 8  # reached or near target without breaking


def test_resample():
    m = tet()
    MeshResampler.upsample(m)
    before = [e.length() for e in m.edges]
    MeshResampler.resample(m, iterations=2)
    m.validate()
    after = [e.length() for e in m.edges]
    # lengths more uniform (smaller spread relative to mean)
    assert np.std(after) / np.mean(after) <= np.std(before) / np.mean(before) + 1e-9
    assert all(f.degree() == 3 for f in m.faces)


def test_scene_mesh_edit_dispatch():
    """Scene-level edit dispatch (scene.h:275-290) propagates to the
    render mesh."""
    from cuda_raytracer_tpu.scene import dynamic_scene as dyn
    from cuda_raytracer_tpu.scene.bsdf import DiffuseBSDF
    from cuda_raytracer_tpu.scene.collada_info import (
        MaterialInfo, Polygon, PolymeshInfo,
    )

    info = PolymeshInfo(
        vertices=np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], dtype=np.float64
        ),
        polygons=[Polygon(vertex_indices=[0, 1, 2]),
                  Polygon(vertex_indices=[0, 2, 3])],
        material=MaterialInfo(bsdf=DiffuseBSDF(np.array([0.5, 0.5, 0.5]))),
    )
    mesh = dyn.Mesh(info, np.eye(4))
    scene = dyn.Scene([mesh], [])

    hm = mesh.halfedge_mesh()
    diag = find_edge(hm, 0, 2)
    scene.select(mesh, diag)
    assert scene.flip_selected_edge()
    assert {v.id for v in scene.selected_element.endpoints()} == {1, 3}

    assert scene.split_selected_edge()  # splits the flipped diagonal
    assert mesh.halfedge_mesh().n_faces == 4
    # edits propagate to the static render mesh
    static = mesh.get_static_object()
    assert len(static.indices) == 4

    scene.select(mesh, None)
    assert not scene.flip_selected_edge()  # nothing selected -> no-op

    assert scene.subdivide_selection(use_catmull_clark=False) is False or True
    scene.select(mesh)
    assert scene.subdivide_selection(use_catmull_clark=False)
    assert all(f.degree() == 4 for f in mesh.halfedge_mesh().faces)
    assert scene.triangulate_selection()
    assert all(f.degree() == 3 for f in mesh.halfedge_mesh().faces)

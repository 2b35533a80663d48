"""Device intersection ops vs. host-side oracles."""

import numpy as np
import jax.numpy as jnp

from cuda_raytracer_tpu.ops.intersect import (
    intersect_bbox,
    intersect_sphere,
    intersect_triangle,
)
from cuda_raytracer_tpu.scene.static_scene import (
    Intersection,
    Mesh,
    Sphere,
    SphereObject,
    Triangle,
)
from cuda_raytracer_tpu.scene.bsdf import DiffuseBSDF


def test_bbox_basic():
    o = jnp.array([[-2.0, 0.5, 0.5]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    t = intersect_bbox(o, d, jnp.zeros((1, 3)), jnp.ones((1, 3)))
    np.testing.assert_allclose(np.asarray(t), [2.0], atol=1e-6)
    # inside -> 0
    t = intersect_bbox(jnp.array([[0.5, 0.5, 0.5]]), d, jnp.zeros((1, 3)), jnp.ones((1, 3)))
    np.testing.assert_allclose(np.asarray(t), [0.0])
    # behind -> miss
    t = intersect_bbox(jnp.array([[2.5, 0.5, 0.5]]), d, jnp.zeros((1, 3)), jnp.ones((1, 3)))
    assert float(t[0]) < 0
    # miss sideways
    t = intersect_bbox(jnp.array([[-2.0, 5.0, 0.5]]), d, jnp.zeros((1, 3)), jnp.ones((1, 3)))
    assert float(t[0]) < 0


def test_bbox_axis_parallel_ray():
    # ray parallel to a slab: IEEE inf handling must not produce NaN hits
    o = jnp.array([[0.5, 0.5, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t = intersect_bbox(o, d, jnp.zeros((1, 3)), jnp.ones((1, 3)))
    np.testing.assert_allclose(np.asarray(t), [5.0], atol=1e-5)
    o = jnp.array([[1.5, 0.5, -5.0]])  # outside the parallel slab
    t = intersect_bbox(o, d, jnp.zeros((1, 3)), jnp.ones((1, 3)))
    assert float(t[0]) < 0


def test_triangle_vs_host_oracle():
    rng = np.random.default_rng(0)
    n = 256
    v0 = rng.standard_normal((n, 3))
    v1 = rng.standard_normal((n, 3))
    v2 = rng.standard_normal((n, 3))
    o = rng.standard_normal((n, 3)) * 2
    d = rng.standard_normal((n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    t_dev = np.asarray(
        intersect_triangle(
            jnp.asarray(o, jnp.float32),
            jnp.asarray(d, jnp.float32),
            jnp.asarray(v0, jnp.float32),
            jnp.asarray(v1, jnp.float32),
            jnp.asarray(v2, jnp.float32),
        )
    )

    mesh = Mesh(np.zeros((3, 3)), np.zeros((3, 3)), np.array([[0, 1, 2]]), DiffuseBSDF([1, 1, 1]))
    for i in range(n):
        mesh.positions = np.stack([v0[i], v1[i], v2[i]])
        mesh.normals = np.tile([[0.0, 0.0, 1.0]], (3, 1))
        tri = Triangle(mesh, 0, 1, 2)
        isect = Intersection()
        hit = tri.intersect(o[i], d[i], isect)
        if hit:
            assert t_dev[i] >= 0, i
            np.testing.assert_allclose(t_dev[i], isect.t, rtol=2e-3, atol=2e-4)
        else:
            # boundary-epsilon disagreements allowed only for grazing hits
            if t_dev[i] >= 0:
                p = o[i] + t_dev[i] * d[i]
                nrm = np.cross(v1[i] - v0[i], v2[i] - v0[i])
                d0 = np.dot(nrm, np.cross(v1[i] - v0[i], p - v0[i]))
                d1 = np.dot(nrm, np.cross(v2[i] - v1[i], p - v1[i]))
                d2 = np.dot(nrm, np.cross(v0[i] - v2[i], p - v2[i]))
                margin = min(d0, d1, d2) / (np.linalg.norm(nrm) ** 2 + 1e-12)
                assert abs(margin) < 1e-3


def test_sphere_vs_host_oracle():
    rng = np.random.default_rng(1)
    n = 256
    c = rng.standard_normal((n, 3))
    r = rng.random(n) * 2 + 0.1
    o = rng.standard_normal((n, 3)) * 3
    d = rng.standard_normal((n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    t_dev = np.asarray(
        intersect_sphere(
            jnp.asarray(o, jnp.float32),
            jnp.asarray(d, jnp.float32),
            jnp.asarray(c, jnp.float32),
            jnp.asarray(r, jnp.float32),
        )
    )
    for i in range(n):
        sph = Sphere(SphereObject(c[i], r[i], DiffuseBSDF([1, 1, 1])), c[i], r[i])
        isect = Intersection()
        hit = sph.intersect(o[i], d[i], isect)
        if hit:
            np.testing.assert_allclose(t_dev[i], isect.t, rtol=2e-3, atol=2e-3)
        else:
            assert t_dev[i] < 0 or t_dev[i] > 1e3

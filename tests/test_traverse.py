"""Wavefront BVH traversal vs. brute-force closest hit.

The correctness cross-check the reference never had (SURVEY.md section
4): the level-synchronous compacted traversal must agree with a dense
O(N*P) intersection over every primitive.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from cuda_raytracer_tpu.ops.traverse import trace_bruteforce, trace_closest
from cuda_raytracer_tpu.render.flatscene import flatten_scene
from cuda_raytracer_tpu.models.cornell import cornell_box_scene
from cuda_raytracer_tpu.scene import static_scene as st


def random_rays(n, seed, origin_box=1.0, allow_inside=True):
    rng = np.random.default_rng(seed)
    o = (rng.random((n, 3)) * 2 - 1) * origin_box
    d = rng.standard_normal((n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def check_match(scene, o, d, atol=2e-3):
    valid = jnp.ones(o.shape[0], dtype=bool)
    a = trace_closest(scene, o, d, valid)
    b = trace_bruteforce(scene, o, d, valid)
    ta, tb = np.asarray(a.t), np.asarray(b.t)
    pa, pb = np.asarray(a.prim), np.asarray(b.prim)
    assert int(a.dropped) == 0
    both_miss = (pa < 0) & (pb < 0)
    both_hit = (pa >= 0) & (pb >= 0)
    assert np.all(both_miss | both_hit), (
        f"hit/miss disagreement: {np.where((pa<0)!=(pb<0))[0][:10]}"
    )
    # same t (same prim up to exact ties)
    np.testing.assert_allclose(ta[both_hit], tb[both_hit], rtol=1e-4, atol=atol)
    agree = pa[both_hit] == pb[both_hit]
    # ties at equal t may pick different prims; require t-equality there
    assert np.mean(agree) > 0.99


@pytest.mark.parametrize("width", [4, 8])
def test_traversal_matches_bruteforce_cornell(width):
    scene_st = cornell_box_scene(with_spheres=True)
    scene, _ = flatten_scene(scene_st, tree_width=width, max_leaf_size=4)
    o, d = random_rays(2048, seed=0)
    check_match(scene, o, d)


def test_traversal_matches_bruteforce_many_tris():
    # random triangle soup stresses deep trees and leaf splits
    rng = np.random.default_rng(5)
    ntri = 3000
    base = rng.random((ntri, 3)) * 4 - 2
    v = base[:, None, :] + rng.random((ntri, 3, 3)) * 0.3
    mesh = st.Mesh(
        v.reshape(-1, 3),
        np.tile([[0.0, 0.0, 1.0]], (ntri * 3, 1)),
        np.arange(ntri * 3).reshape(-1, 3),
        __import__(
            "cuda_raytracer_tpu.scene.bsdf", fromlist=["DiffuseBSDF"]
        ).DiffuseBSDF([1, 1, 1]),
    )
    scene_st = st.Scene([mesh], [])
    scene, _ = flatten_scene(scene_st, tree_width=4, max_leaf_size=8)
    o, d = random_rays(2048, seed=1, origin_box=3.0)
    check_match(scene, o, d)


def test_traversal_from_inside_geometry():
    # rays originating inside the box (the camera case) and on surfaces
    scene_st = cornell_box_scene(with_spheres=True)
    scene, _ = flatten_scene(scene_st, tree_width=4, max_leaf_size=4)
    o, d = random_rays(1024, seed=2, origin_box=0.4)
    check_match(scene, o, d)


def test_invalid_rays_miss():
    scene_st = cornell_box_scene()
    scene, _ = flatten_scene(scene_st, tree_width=4)
    o, d = random_rays(64, seed=3)
    res = trace_closest(scene, o, d, jnp.zeros(64, dtype=bool))
    assert np.all(np.asarray(res.prim) == -1)
    assert np.all(np.isinf(np.asarray(res.t)))

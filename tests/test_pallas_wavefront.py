"""Pallas block-wavefront traversal vs. brute force (interpret mode).

Runs the TPU kernel pipeline through the Pallas interpreter on CPU —
slow, so cases stay small; hardware parity is exercised by the TPU
benches.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from cuda_raytracer_tpu.models.cornell import cornell_box_scene
from cuda_raytracer_tpu.ops.pallas.wavefront import trace_closest_wavefront
from cuda_raytracer_tpu.ops.traverse import trace_bruteforce
from cuda_raytracer_tpu.render.flatscene import flatten_scene


@pytest.fixture(scope="module")
def cornell_flat():
    scene, _ = flatten_scene(
        cornell_box_scene(with_spheres=True), tree_width=4, max_leaf_size=4
    )
    return scene


def _rays(n, seed, box=0.8):
    rng = np.random.default_rng(seed)
    o = (rng.random((n, 3)) * 2 - 1) * box
    d = rng.standard_normal((n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def test_matches_bruteforce(cornell_flat):
    o, d = _rays(384, seed=0)
    valid = jnp.ones((384,), bool)
    with pltpu.force_tpu_interpret_mode():
        res = trace_closest_wavefront(cornell_flat, o, d, valid)
    ref = trace_bruteforce(cornell_flat, o, d, valid)
    pa, pb = np.asarray(res.prim), np.asarray(ref.prim)
    ta, tb = np.asarray(res.t), np.asarray(ref.t)
    assert int(res.dropped) == 0
    assert np.all((pa < 0) == (pb < 0))
    both = (pa >= 0) & (pb >= 0)
    np.testing.assert_allclose(ta[both], tb[both], rtol=1e-4, atol=2e-3)
    assert np.mean(pa[both] == pb[both]) > 0.99


def test_t_limit_prunes_but_preserves_near_hits(cornell_flat):
    o, d = _rays(256, seed=1)
    valid = jnp.ones((256,), bool)
    ref = trace_bruteforce(cornell_flat, o, d, valid)
    tb = np.asarray(ref.t)
    # limit beyond every hit: must reproduce the unlimited result
    t_lim = jnp.full((256,), 100.0, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        res = trace_closest_wavefront(cornell_flat, o, d, valid, t_limit=t_lim)
    ta = np.asarray(res.t)
    both = (np.asarray(res.prim) >= 0) & (np.asarray(ref.prim) >= 0)
    assert np.all((np.asarray(res.prim) < 0) == (np.asarray(ref.prim) < 0))
    np.testing.assert_allclose(ta[both], tb[both], rtol=1e-4, atol=2e-3)


def test_invalid_rays_miss(cornell_flat):
    o, d = _rays(128, seed=2)
    with pltpu.force_tpu_interpret_mode():
        res = trace_closest_wavefront(
            cornell_flat, o, d, jnp.zeros((128,), bool)
        )
    assert np.all(np.asarray(res.prim) == -1)

"""Parity tests for the packet-DFS traversal (ops/pallas/packet_dfs).

Same cross-check discipline as test_wavefront2: interpret-mode kernels
vs the brute-force oracle and the XLA scan traversal.  The DFS visits
leaves in near-first order, so on exact-t ties the winning prim can
differ from the oracle's lowest-index tie-break; hit/miss and t agree
exactly within float rounding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cuda_raytracer_tpu.models.cornell import cornell_box_scene
from cuda_raytracer_tpu.ops import shade as S
from cuda_raytracer_tpu.ops.traverse import trace_bruteforce, trace_closest
from cuda_raytracer_tpu.ops.pallas import packet_dfs as pdfs
from cuda_raytracer_tpu.render.flatscene import flatten_scene
from cuda_raytracer_tpu.scene import static_scene as st
from cuda_raytracer_tpu.scene.bsdf import DiffuseBSDF


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(pdfs, "_INTERPRET", True)


@pytest.fixture(scope="module")
def box_scene():
    scene, _ = flatten_scene(
        cornell_box_scene(with_spheres=True), tree_width=4, max_leaf_size=4
    )
    return scene


@pytest.fixture(scope="module")
def soup_scene():
    rng = np.random.default_rng(5)
    ntri = 1200
    base = rng.random((ntri, 3)) * 4 - 2
    v = base[:, None, :] + rng.random((ntri, 3, 3)) * 0.3
    mesh = st.Mesh(
        v.reshape(-1, 3),
        np.tile([[0.0, 0.0, 1.0]], (ntri * 3, 1)),
        np.arange(ntri * 3).reshape(-1, 3),
        DiffuseBSDF([1, 1, 1]),
    )
    scene, _ = flatten_scene(
        st.Scene([mesh], []), tree_width=4, max_leaf_size=8
    )
    return scene


def random_rays(n, seed, origin_box=1.0):
    rng = np.random.default_rng(seed)
    o = (rng.random((n, 3)) * 2 - 1) * origin_box
    d = rng.standard_normal((n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def _camera_rays(n, key=0):
    import math

    k = jax.random.PRNGKey(key)
    return S.generate_camera_rays(
        k, 32, n // 32, 1,
        jnp.asarray([0.0, 0.75, 2.5], jnp.float32),
        jnp.eye(3, dtype=jnp.float32),
        math.tan(math.radians(50.0) / 2),
        math.tan(math.radians(35.0) / 2),
    )


def check_match(scene, o, d, valid=None, atol=2e-3):
    if valid is None:
        valid = jnp.ones(o.shape[0], dtype=bool)
    a = pdfs.trace_closest_packets(scene, o, d, valid)
    b = trace_bruteforce(scene, o, d, valid)
    ta, tb = np.asarray(a.t), np.asarray(b.t)
    pa, pb = np.asarray(a.prim), np.asarray(b.prim)
    assert np.array_equal(pa < 0, pb < 0), (
        f"hit/miss disagreement at {np.where((pa < 0) != (pb < 0))[0][:10]}"
    )
    both_hit = (pa >= 0) & (pb >= 0)
    np.testing.assert_allclose(
        ta[both_hit], tb[both_hit], rtol=1e-4, atol=atol
    )
    assert np.mean(pa[both_hit] == pb[both_hit]) > 0.99
    return a, b


def test_closest_matches_bruteforce_box(box_scene):
    o, d = _camera_rays(pdfs.C)
    a, b = check_match(box_scene, o, d)
    assert int((np.asarray(b.prim) >= 0).sum()) > 100


def test_closest_matches_bruteforce_soup(soup_scene):
    o, d = random_rays(pdfs.C, seed=1, origin_box=3.0)
    check_match(soup_scene, o, d)


def test_soup_interior_rays(soup_scene):
    o, d = random_rays(pdfs.C, seed=2, origin_box=0.5)
    check_match(soup_scene, o, d)


def test_unpadded_ray_count(soup_scene):
    o, d = random_rays(777, seed=4, origin_box=3.0)
    a = pdfs.trace_closest_packets(soup_scene, o, d, jnp.ones((777,), bool))
    b = trace_closest(soup_scene, o, d, jnp.ones((777,), bool))
    assert np.array_equal(np.asarray(a.prim) < 0, np.asarray(b.prim) < 0)


def test_invalid_rays_miss(soup_scene):
    o, d = random_rays(pdfs.C, seed=3, origin_box=3.0)
    valid = jnp.arange(o.shape[0]) % 2 == 0
    a, b = check_match(soup_scene, o, d, valid=valid)
    assert np.all(np.asarray(a.prim)[1::2] == -1)


def test_shadow_rays_occlusion_decision(soup_scene):
    """Shadow traversal with early kill must decide t > maxT - eps
    exactly like the full closest-hit trace."""
    o, d = random_rays(pdfs.C, seed=6, origin_box=3.0)
    n = o.shape[0]
    valid = jnp.ones((n,), bool)
    full = trace_bruteforce(soup_scene, o, d, valid)
    t_hit = jnp.where(full.prim >= 0, full.t, 2.0)
    scale = jnp.where(jnp.arange(n) % 3 == 0, 0.5, 1.5)
    max_t = t_hit * scale
    res = pdfs.trace_closest_packets(
        soup_scene, o, d, valid, t_limit=max_t, kill_eps=1e-3
    )
    eps = 1e-3
    ref_pass = np.asarray(full.t) > np.asarray(max_t) - eps
    got_pass = np.asarray(res.t) > np.asarray(max_t) - eps
    np.testing.assert_array_equal(got_pass, ref_pass)


def test_visit_cap_truncation_reported(soup_scene, monkeypatch):
    """When the DFS visit cap fires with work outstanding, the dropped
    counter must fire instead of silently losing hits (VERDICT r2 weak
    item 6)."""
    o, d = random_rays(pdfs.C, seed=9, origin_box=3.0)
    valid = jnp.ones((o.shape[0],), bool)
    full = pdfs.trace_closest_packets(soup_scene, o, d, valid)
    assert int(full.dropped) == 0
    monkeypatch.setattr(pdfs, "MAX_VISITS", 3)
    cut = pdfs.trace_closest_packets(soup_scene, o, d, valid)
    assert int(cut.dropped) > 0


def test_packet_size_variants(soup_scene):
    """Non-default packet sizes produce identical results (cfg
    packet_size / packet_size_secondary plumbing)."""
    o, d = random_rays(512, seed=11, origin_box=3.0)
    valid = jnp.ones((512,), bool)
    a = pdfs.trace_closest_packets(soup_scene, o, d, valid)
    for ps in (128, 256):
        b = pdfs.trace_closest_packets(
            soup_scene, o, d, valid, packet_size=ps
        )
        np.testing.assert_array_equal(
            np.asarray(a.prim), np.asarray(b.prim)
        )
        np.testing.assert_allclose(
            np.asarray(a.t), np.asarray(b.t), rtol=1e-6
        )


def test_slab_bf16_conservative(soup_scene):
    """bf16 slab tests may only ADD visits (conservative widening), so
    hits match the f32 path exactly on these scenes."""
    o, d = random_rays(pdfs.C, seed=13, origin_box=3.0)
    valid = jnp.ones((o.shape[0],), bool)
    a = pdfs.trace_closest_packets(soup_scene, o, d, valid)
    b = pdfs.trace_closest_packets(
        soup_scene, o, d, valid, slab_bf16=True
    )
    np.testing.assert_array_equal(
        np.asarray(a.prim), np.asarray(b.prim)
    )
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    # widening must not explode the visit budget: same order of visits
    # (checked indirectly: shadow pass decisions also identical)
    full = trace_bruteforce(soup_scene, o, d, valid)
    t_hit = jnp.where(full.prim >= 0, full.t, 2.0)
    max_t = t_hit * 1.2
    sa = pdfs.trace_closest_packets(
        soup_scene, o, d, valid, t_limit=max_t
    )
    sb = pdfs.trace_closest_packets(
        soup_scene, o, d, valid, t_limit=max_t, slab_bf16=True
    )
    eps = 1e-3
    pa = np.asarray(sa.t) > np.asarray(max_t) - eps
    pb = np.asarray(sb.t) > np.asarray(max_t) - eps
    np.testing.assert_array_equal(pa, pb)


def test_tiny_scene_root_leaf():
    """Root-is-leaf scenes traverse through the synthesized leaf row."""
    scene, _ = flatten_scene(
        cornell_box_scene(with_spheres=False), tree_width=4,
        max_leaf_size=64,
    )
    assert scene.bvh.root_is_leaf
    o, d = _camera_rays(pdfs.C, key=2)
    check_match(scene, o, d)


def test_seeded_matches_unseeded(box_scene):
    """Seeded DFS (conservative upper bounds from ops/seeds.py) must
    match the unseeded trace to float rounding: the seed t comes from
    a separately-fused XLA sweep, so it can drift from the kernel's
    leaf t for the same prim by ~1 ulp."""
    from cuda_raytracer_tpu.ops.seeds import seed_hits

    o, d = random_rays(pdfs.C, seed=31, origin_box=0.9)
    valid = jnp.arange(o.shape[0]) % 7 != 0
    sd = seed_hits(box_scene, o, d, valid)
    a = pdfs.trace_closest_packets(box_scene, o, d, valid)
    b = pdfs.trace_closest_packets(
        box_scene, o, d, valid, seed_t=sd.t, seed_prim=sd.prim
    )
    ta, tb = np.asarray(a.t), np.asarray(b.t)
    pa, pb = np.asarray(a.prim), np.asarray(b.prim)
    np.testing.assert_array_equal(pa < 0, pb < 0)
    hit = pa >= 0
    assert hit.mean() > 0.5
    np.testing.assert_allclose(ta[hit], tb[hit], rtol=1e-6, atol=1e-6)
    assert np.mean(pa[hit] == pb[hit]) > 0.99


def test_seeded_shadow_decision(box_scene):
    from cuda_raytracer_tpu.ops.seeds import seed_hits

    o, d = random_rays(pdfs.C, seed=32, origin_box=0.9)
    n = o.shape[0]
    valid = jnp.ones((n,), bool)
    full = trace_bruteforce(box_scene, o, d, valid)
    t_hit = jnp.where(full.prim >= 0, full.t, 2.0)
    scale = jnp.where(jnp.arange(n) % 3 == 0, 0.5, 1.5)
    max_t = t_hit * scale
    sd = seed_hits(box_scene, o, d, valid)
    res = pdfs.trace_closest_packets(
        box_scene, o, d, valid, t_limit=max_t, kill_eps=1e-3,
        seed_t=sd.t, seed_prim=sd.prim,
    )
    eps = 1e-3
    ref_pass = np.asarray(full.t) > np.asarray(max_t) - eps
    got_pass = np.asarray(res.t) > np.asarray(max_t) - eps
    np.testing.assert_array_equal(got_pass, ref_pass)

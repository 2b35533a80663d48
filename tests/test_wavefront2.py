"""Parity tests for the fused wavefront traversal (wavefront2).

Runs the Pallas kernels in interpret mode on the CPU mesh and checks
agreement with the dense brute-force oracle and the XLA scan traversal
— the cross-check discipline the reference lacked (SURVEY.md section
4).  t agrees to float rounding (FMA contraction differs between the
kernel and oracle compilations); prim ids agree except on exact-t ties.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cuda_raytracer_tpu.models.cornell import cornell_box_scene
from cuda_raytracer_tpu.ops import shade as S
from cuda_raytracer_tpu.ops.traverse import trace_bruteforce, trace_closest
from cuda_raytracer_tpu.ops.pallas import wavefront2 as wf2
from cuda_raytracer_tpu.render.flatscene import flatten_scene
from cuda_raytracer_tpu.scene import static_scene as st
from cuda_raytracer_tpu.scene.bsdf import DiffuseBSDF


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(wf2, "_INTERPRET", True)


@pytest.fixture(scope="module")
def box_scene():
    scene, _ = flatten_scene(
        cornell_box_scene(with_spheres=True), tree_width=4, max_leaf_size=4
    )
    return scene


@pytest.fixture(scope="module")
def soup_scene():
    """Random triangle soup with a real multi-level wide tree."""
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
    assert len(scene.bvh.wf_sched) >= 3, "soup scene must be deep"
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
    a = wf2.trace_closest_wavefront(scene, o, d, valid)
    b = trace_bruteforce(scene, o, d, valid)
    ta, tb = np.asarray(a.t), np.asarray(b.t)
    pa, pb = np.asarray(a.prim), np.asarray(b.prim)
    assert int(a.dropped) == 0
    assert np.array_equal(pa < 0, pb < 0), (
        f"hit/miss disagreement at {np.where((pa < 0) != (pb < 0))[0][:10]}"
    )
    both_hit = (pa >= 0) & (pb >= 0)
    np.testing.assert_allclose(
        ta[both_hit], tb[both_hit], rtol=1e-4, atol=atol
    )
    # ties at equal t may pick different prims; overwhelmingly agree
    assert np.mean(pa[both_hit] == pb[both_hit]) > 0.99
    return a, b


def test_schedule_exists(box_scene, soup_scene):
    for scene in (box_scene, soup_scene):
        sched = scene.bvh.wf_sched
        assert len(sched) >= 1
        for lvl, (segs, kind, pair, lstart, lcnt, forced) in enumerate(
            sched
        ):
            for i, k in enumerate(kind):
                if k == 1:
                    assert 0 <= pair[i] < len(sched[lvl + 1][0])
                elif k == 2:
                    assert lcnt[i] > 0


def test_closest_matches_bruteforce_box(box_scene):
    o, d = _camera_rays(wf2.CHUNK)
    a, b = check_match(box_scene, o, d)
    assert int((np.asarray(b.prim) >= 0).sum()) > 100


def test_closest_matches_bruteforce_soup(soup_scene):
    o, d = random_rays(2 * wf2.CHUNK, seed=1, origin_box=3.0)
    check_match(soup_scene, o, d)


def test_soup_interior_rays(soup_scene):
    o, d = random_rays(wf2.CHUNK, seed=2, origin_box=0.5)
    check_match(soup_scene, o, d)


def test_unpadded_ray_count(soup_scene):
    o, d = random_rays(777, seed=4, origin_box=3.0)
    a = wf2.trace_closest_wavefront(
        soup_scene, o, d, jnp.ones((777,), bool)
    )
    b = trace_closest(soup_scene, o, d, jnp.ones((777,), bool))
    assert np.array_equal(
        np.asarray(a.prim) < 0, np.asarray(b.prim) < 0
    )


def test_invalid_rays_miss(soup_scene):
    o, d = random_rays(wf2.CHUNK, seed=3, origin_box=3.0)
    valid = jnp.arange(o.shape[0]) % 2 == 0
    a, b = check_match(soup_scene, o, d, valid=valid)
    assert np.all(np.asarray(a.prim)[1::2] == -1)


def test_shadow_rays_occlusion_decision(soup_scene):
    """Shadow traversal with early kill must decide t > maxT - eps
    exactly like the full closest-hit trace."""
    o, d = random_rays(wf2.CHUNK, seed=6, origin_box=3.0)
    n = o.shape[0]
    valid = jnp.ones((n,), bool)
    full = trace_bruteforce(soup_scene, o, d, valid)
    # "light" distances both before and past the closest hit
    t_hit = jnp.where(full.prim >= 0, full.t, 2.0)
    scale = jnp.where(jnp.arange(n) % 3 == 0, 0.5, 1.5)
    max_t = t_hit * scale
    res = wf2.trace_closest_wavefront(
        soup_scene, o, d, valid, t_limit=max_t, kill_eps=1e-3
    )
    eps = 1e-3
    ref_pass = np.asarray(full.t) > np.asarray(max_t) - eps
    got_pass = np.asarray(res.t) > np.asarray(max_t) - eps
    np.testing.assert_array_equal(got_pass, ref_pass)


def test_compacted_matches_plain(soup_scene):
    """compact=True (live-lane partition, dynamic level-0 count) must
    give identical results: the merge scatters by ray id, so the
    compacted queue needs no inverse permutation."""
    o, d = random_rays(2 * wf2.CHUNK, seed=21, origin_box=3.0)
    n = o.shape[0]
    # kill an irregular 70% so live lanes straddle chunk boundaries
    valid = jnp.asarray(
        (np.arange(n) * 2654435761 % 97) < 30
    )
    a = wf2.trace_closest_wavefront(soup_scene, o, d, valid)
    b = wf2.trace_closest_wavefront(
        soup_scene, o, d, valid, compact=True
    )
    np.testing.assert_array_equal(
        np.asarray(a.prim), np.asarray(b.prim)
    )
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    assert np.all(np.asarray(b.prim)[~np.asarray(valid)] == -1)


def test_compacted_shadow_decision(soup_scene):
    o, d = random_rays(wf2.CHUNK, seed=22, origin_box=3.0)
    n = o.shape[0]
    valid = jnp.asarray((np.arange(n) % 4) != 1)
    full = trace_bruteforce(soup_scene, o, d, valid)
    t_hit = jnp.where(full.prim >= 0, full.t, 2.0)
    max_t = t_hit * jnp.where(jnp.arange(n) % 3 == 0, 0.5, 1.5)
    a = wf2.trace_closest_wavefront(
        soup_scene, o, d, valid, t_limit=max_t
    )
    b = wf2.trace_closest_wavefront(
        soup_scene, o, d, valid, t_limit=max_t, compact=True
    )
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(
        np.asarray(a.prim), np.asarray(b.prim)
    )


def test_compact_all_dead(soup_scene):
    o, d = random_rays(wf2.CHUNK, seed=23, origin_box=3.0)
    valid = jnp.zeros((o.shape[0],), bool)
    b = wf2.trace_closest_wavefront(
        soup_scene, o, d, valid, compact=True
    )
    assert np.all(np.asarray(b.prim) == -1)


def test_tiny_scene_root_leaf():
    """Root-is-leaf scenes traverse through the virtual segment."""
    scene, _ = flatten_scene(
        cornell_box_scene(with_spheres=False), tree_width=4,
        max_leaf_size=64,
    )
    assert scene.bvh.root_is_leaf
    o, d = _camera_rays(wf2.CHUNK, key=2)
    check_match(scene, o, d)


def test_box_bf16_identical_results(soup_scene):
    """bf16 box tests with conservative widening may only ADD queue
    pushes (false positives); the exact f32 leaf tests then produce
    bit-identical hits."""
    o, d = random_rays(2 * wf2.CHUNK, seed=31, origin_box=3.0)
    valid = jnp.ones((o.shape[0],), bool)
    a = wf2.trace_closest_wavefront(soup_scene, o, d, valid)
    b = wf2.trace_closest_wavefront(
        soup_scene, o, d, valid, box_bf16=True
    )
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(
        np.asarray(a.prim), np.asarray(b.prim)
    )


def test_box_bf16_shadow_decision(soup_scene):
    o, d = random_rays(wf2.CHUNK, seed=32, origin_box=3.0)
    n = o.shape[0]
    valid = jnp.asarray((np.arange(n) % 5) != 2)
    full = trace_bruteforce(soup_scene, o, d, valid)
    t_hit = jnp.where(full.prim >= 0, full.t, 2.0)
    max_t = t_hit * jnp.where(jnp.arange(n) % 3 == 0, 0.5, 1.5)
    a = wf2.trace_closest_wavefront(
        soup_scene, o, d, valid, t_limit=max_t
    )
    b = wf2.trace_closest_wavefront(
        soup_scene, o, d, valid, t_limit=max_t, box_bf16=True
    )
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(
        np.asarray(a.prim), np.asarray(b.prim)
    )


def test_want_prim_false_same_t(soup_scene):
    """The lite merge (shadow passes: min-t scatter only) must produce
    the exact same t as the full merge; prim is -2 on hits, -1 on
    misses."""
    o, d = random_rays(wf2.CHUNK, seed=33, origin_box=3.0)
    n = o.shape[0]
    valid = jnp.asarray((np.arange(n) % 7) != 3)
    full = trace_bruteforce(soup_scene, o, d, valid)
    t_hit = jnp.where(full.prim >= 0, full.t, 2.0)
    max_t = t_hit * jnp.where(jnp.arange(n) % 3 == 0, 0.5, 1.5)
    a = wf2.trace_closest_wavefront(
        soup_scene, o, d, valid, t_limit=max_t
    )
    b = wf2.trace_closest_wavefront(
        soup_scene, o, d, valid, t_limit=max_t, want_prim=False
    )
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    pa, pb = np.asarray(a.prim), np.asarray(b.prim)
    np.testing.assert_array_equal(pa >= 0, pb == -2)
    np.testing.assert_array_equal(pa < 0, pb == -1)


def test_dyn_alloc_matches_legacy(soup_scene):
    """Chunk-chained dynamic queue allocation (bump-cursor regions +
    tag-sorted chunk table, no count kernel) must be bit-identical to
    the pre-counted legacy layout: the stable argsort of allocation
    tags preserves per-segment chunk order, so every entry lands in
    the same relative position."""
    o, d = random_rays(2 * wf2.CHUNK, seed=43, origin_box=3.0)
    valid = jnp.asarray((np.arange(o.shape[0]) % 7) != 3)
    a = wf2.trace_closest_wavefront(
        soup_scene, o, d, valid, dyn_alloc=True
    )
    b = wf2.trace_closest_wavefront(
        soup_scene, o, d, valid, dyn_alloc=False
    )
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(
        np.asarray(a.prim), np.asarray(b.prim)
    )
    assert int(a.dropped) == int(b.dropped) == 0


def test_dyn_alloc_shadow_and_compact(soup_scene):
    o, d = random_rays(wf2.CHUNK, seed=44, origin_box=3.0)
    n = o.shape[0]
    valid = jnp.ones((n,), bool)
    full = trace_bruteforce(soup_scene, o, d, valid)
    t_hit = jnp.where(full.prim >= 0, full.t, 2.0)
    max_t = t_hit * jnp.where(jnp.arange(n) % 3 == 0, 0.5, 1.5)
    a = wf2.trace_closest_wavefront(
        soup_scene, o, d, valid, t_limit=max_t, dyn_alloc=True
    )
    b = wf2.trace_closest_wavefront(
        soup_scene, o, d, valid, t_limit=max_t, dyn_alloc=False
    )
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    # compacted path composes with dyn_alloc
    sparse = jnp.asarray((np.arange(n) % 5) == 0)
    c = wf2.trace_closest_wavefront(
        soup_scene, o, d, sparse, dyn_alloc=True, compact=True
    )
    e = wf2.trace_closest_wavefront(
        soup_scene, o, d, sparse, dyn_alloc=False, compact=False
    )
    np.testing.assert_array_equal(np.asarray(c.t), np.asarray(e.t))


def test_fused_counts_match_count_kernel(soup_scene):
    """Fused grandchild counting in the pack kernel must reproduce the
    count kernel's numbers exactly (same _box_terms arithmetic on the
    same stored values), so the two schedules are identical."""
    o, d = random_rays(2 * wf2.CHUNK, seed=41, origin_box=3.0)
    valid = jnp.asarray((np.arange(o.shape[0]) % 11) != 5)
    a = wf2.trace_closest_wavefront(
        soup_scene, o, d, valid, fused_counts=True
    )
    b = wf2.trace_closest_wavefront(
        soup_scene, o, d, valid, fused_counts=False
    )
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(
        np.asarray(a.prim), np.asarray(b.prim)
    )
    assert int(a.dropped) == int(b.dropped)


def test_fused_counts_shadow(soup_scene):
    o, d = random_rays(wf2.CHUNK, seed=42, origin_box=3.0)
    n = o.shape[0]
    valid = jnp.ones((n,), bool)
    full = trace_bruteforce(soup_scene, o, d, valid)
    t_hit = jnp.where(full.prim >= 0, full.t, 2.0)
    max_t = t_hit * jnp.where(jnp.arange(n) % 3 == 0, 0.5, 1.5)
    a = wf2.trace_closest_wavefront(
        soup_scene, o, d, valid, t_limit=max_t, fused_counts=True
    )
    b = wf2.trace_closest_wavefront(
        soup_scene, o, d, valid, t_limit=max_t, fused_counts=False
    )
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(
        np.asarray(a.prim), np.asarray(b.prim)
    )


def _seeds(scene, o, d, valid, k=32):
    from cuda_raytracer_tpu.ops.seeds import seed_hits

    return seed_hits(scene, o, d, valid, k=k)


def test_seed_hits_are_real_hits(box_scene):
    """Every seed hit must be a real hit of that prim (upper-bound
    property) — verified against the dense brute-force oracle."""
    o, d = random_rays(wf2.CHUNK, seed=11, origin_box=0.9)
    valid = jnp.ones(o.shape[0], bool)
    sd = _seeds(box_scene, o, d, valid)
    full = trace_bruteforce(box_scene, o, d, valid)
    st, sp = np.asarray(sd.t), np.asarray(sd.prim)
    ft, fp = np.asarray(full.t), np.asarray(full.prim)
    hit = sp >= 0
    assert hit.mean() > 0.5, "box walls should seed most rays"
    # the seed is an upper bound on the true closest hit
    assert np.all(st[hit] >= ft[hit] - 1e-6)
    # where the true winner IS a seed prim, the seed equals it exactly
    same = hit & (sp == fp)
    np.testing.assert_array_equal(st[same], ft[same])


def _assert_seed_parity(a, b):
    """Seeded results match unseeded to float rounding: the seed t is
    computed by a separately-fused XLA sweep, so it can differ from the
    kernel's leaf t for the same prim by ~1 ulp (measured 0.6% of rays
    at <= 3e-7 relative), exactly like kernel-vs-oracle FMA drift."""
    ta, tb = np.asarray(a.t), np.asarray(b.t)
    pa, pb = np.asarray(a.prim), np.asarray(b.prim)
    np.testing.assert_array_equal(pa < 0, pb < 0)
    hit = pa >= 0
    np.testing.assert_allclose(ta[hit], tb[hit], rtol=1e-6, atol=1e-6)
    assert np.mean(pa[hit] == pb[hit]) > 0.99


@pytest.mark.parametrize("fixture", ["box_scene", "soup_scene"])
def test_seeded_matches_unseeded(fixture, request):
    scene = request.getfixturevalue(fixture)
    o, d = random_rays(wf2.CHUNK, seed=12, origin_box=0.9)
    valid = jnp.arange(o.shape[0]) % 5 != 0
    sd = _seeds(scene, o, d, valid)
    a = wf2.trace_closest_wavefront(scene, o, d, valid)
    b = wf2.trace_closest_wavefront(
        scene, o, d, valid, seed_t=sd.t, seed_prim=sd.prim
    )
    _assert_seed_parity(a, b)


def test_seeded_shadow_decision(box_scene):
    o, d = random_rays(wf2.CHUNK, seed=13, origin_box=0.9)
    n = o.shape[0]
    valid = jnp.ones((n,), bool)
    full = trace_bruteforce(box_scene, o, d, valid)
    t_hit = jnp.where(full.prim >= 0, full.t, 2.0)
    scale = jnp.where(jnp.arange(n) % 3 == 0, 0.5, 1.5)
    max_t = t_hit * scale
    sd = _seeds(box_scene, o, d, valid)
    res = wf2.trace_closest_wavefront(
        box_scene, o, d, valid, t_limit=max_t, kill_eps=1e-3,
        want_prim=False, seed_t=sd.t, seed_prim=sd.prim,
    )
    eps = 1e-3
    ref_pass = np.asarray(full.t) > np.asarray(max_t) - eps
    got_pass = np.asarray(res.t) > np.asarray(max_t) - eps
    np.testing.assert_array_equal(got_pass, ref_pass)


def test_seeded_compacted_matches(box_scene):
    o, d = random_rays(2 * wf2.CHUNK, seed=14, origin_box=0.9)
    n = o.shape[0]
    valid = jnp.asarray((np.arange(n) * 2654435761 % 97) < 30)
    sd = _seeds(box_scene, o, d, valid)
    a = wf2.trace_closest_wavefront(box_scene, o, d, valid)
    b = wf2.trace_closest_wavefront(
        box_scene, o, d, valid, compact=True,
        seed_t=sd.t, seed_prim=sd.prim,
    )
    _assert_seed_parity(a, b)


def test_seeding_shrinks_the_log(box_scene):
    """In a box-like scene most rays' seed is final, so the seeded run
    must log far fewer improving hits (debug_merge_branch reports the
    used-entry cursor in `dropped`)."""
    o, d = random_rays(wf2.CHUNK, seed=15, origin_box=0.9)
    valid = jnp.ones(o.shape[0], bool)
    sd = _seeds(box_scene, o, d, valid)
    a = wf2.trace_closest_wavefront(
        box_scene, o, d, valid, debug_merge_branch=True
    )
    b = wf2.trace_closest_wavefront(
        box_scene, o, d, valid, debug_merge_branch=True,
        seed_t=sd.t, seed_prim=sd.prim,
    )
    used_a = int(a.dropped) % 100_000_000
    used_b = int(b.dropped) % 100_000_000
    assert used_b < used_a * 0.6, (used_a, used_b)

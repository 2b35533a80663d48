"""On-hardware kernel parity (VERDICT r2 item 3 / task 7).

Every other Pallas test forces interpret mode, which cannot catch
Mosaic lowering/layout regressions.  These tests run the compiled
packet-DFS and wavefront2 kernels on the real TPU against the XLA scan
oracle at CBbunny scale.  Run with:

    RUN_TPU_TESTS=1 python -m pytest -m tpu -q

(The driver's normal CPU suite skips them; conftest.py gates both
directions.)  Reference analog: the reference verified on-device via
golden images (SURVEY.md section 4).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

SCENE = "/root/reference/media/pathtracer/advanced/CBbunny.dae"


@pytest.fixture(scope="module")
def bunny():
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")
    if not os.path.exists(SCENE):
        pytest.skip("reference media not available")
    from cuda_raytracer_tpu.config import RenderConfig
    from cuda_raytracer_tpu.render.engine import WavefrontRenderer

    cfg = RenderConfig(width=320, height=240, samples_per_frame=2,
                       tree_width=8, max_leaf_size=16,
                       traversal="xla")
    r = WavefrontRenderer(cfg, camera_mode="collada")
    r.load_scene(SCENE)
    return r


def _rays(r, n_target, seed=0, kind="camera"):
    import math

    from cuda_raytracer_tpu.ops import shade as S

    cfg = r.config
    key = jax.random.PRNGKey(seed)
    o, d = S.generate_camera_rays(
        key, cfg.width, cfg.height, cfg.samples_per_frame,
        jnp.asarray(r.camera.pos, jnp.float32),
        jnp.asarray(r.camera.c2w, jnp.float32),
        math.tan(math.radians(r.camera.hFov) / 2),
        math.tan(math.radians(r.camera.vFov) / 2),
    )
    o, d = o[:n_target], d[:n_target]
    if kind == "scattered":
        # incoherent rays: trace camera rays, then hemisphere-scatter
        from cuda_raytracer_tpu.ops.traverse import trace_closest

        valid = jnp.ones((o.shape[0],), bool)
        res = trace_closest(r.scene, o, d, valid)
        hit = S.compute_hits(r.scene, o, d, res.t, res.prim, 1e-3)
        o, d, _imp, valid, _ = S.scatter(
            r.scene, hit, jnp.ones_like(o), jax.random.fold_in(key, 3)
        )
        return o, d, valid
    return o, d, jnp.ones((o.shape[0],), bool)


def _check(res, ref, min_hits=1000):
    pa, pb = np.asarray(res.prim), np.asarray(ref.prim)
    ta, tb = np.asarray(res.t), np.asarray(ref.t)
    assert np.array_equal(pa < 0, pb < 0), (
        f"hit/miss mismatch: {np.sum((pa < 0) != (pb < 0))} rays"
    )
    both = (pa >= 0) & (pb >= 0)
    assert both.sum() > min_hits
    np.testing.assert_allclose(ta[both], tb[both], rtol=1e-4, atol=2e-3)
    assert np.mean(pa[both] == pb[both]) > 0.99


@pytest.mark.parametrize("kind", ["camera", "scattered"])
def test_packet_dfs_on_device(bunny, kind):
    from cuda_raytracer_tpu.ops.pallas.packet_dfs import (
        trace_closest_packets,
    )
    from cuda_raytracer_tpu.ops.traverse import trace_closest

    o, d, valid = _rays(bunny, 64 * 1024, kind=kind)
    res = jax.jit(trace_closest_packets)(bunny.scene, o, d, valid)
    ref = trace_closest(bunny.scene, o, d, valid)
    _check(res, ref)


@pytest.mark.parametrize("kind", ["camera", "scattered"])
def test_wavefront2_on_device(bunny, kind):
    from cuda_raytracer_tpu.ops.pallas.wavefront2 import (
        trace_closest_wavefront,
    )
    from cuda_raytracer_tpu.ops.traverse import trace_closest

    o, d, valid = _rays(bunny, 64 * 1024, kind=kind)
    res = jax.jit(
        lambda s, o, d, v: trace_closest_wavefront(s, o, d, v)
    )(bunny.scene, o, d, valid)
    ref = trace_closest(bunny.scene, o, d, valid)
    _check(res, ref)


def test_packet_dfs_shadow_on_device(bunny):
    from cuda_raytracer_tpu.ops.pallas.packet_dfs import (
        trace_closest_packets,
    )
    from cuda_raytracer_tpu.ops.traverse import trace_closest

    o, d, valid = _rays(bunny, 64 * 1024)
    ref = trace_closest(bunny.scene, o, d, valid)
    t_hit = jnp.where(ref.prim >= 0, ref.t, 2.0)
    scale = jnp.where(jnp.arange(o.shape[0]) % 3 == 0, 0.5, 1.5)
    max_t = t_hit * scale
    res = jax.jit(
        lambda s, o, d, v, tl: trace_closest_packets(s, o, d, v, tl)
    )(bunny.scene, o, d, valid, max_t)
    eps = 1e-3
    ref_pass = np.asarray(ref.t) > np.asarray(max_t) - eps
    got_pass = np.asarray(res.t) > np.asarray(max_t) - eps
    np.testing.assert_array_equal(got_pass, ref_pass)


def test_small_packet_on_device(bunny):
    from cuda_raytracer_tpu.ops.pallas.packet_dfs import (
        trace_closest_packets,
    )
    from cuda_raytracer_tpu.ops.traverse import trace_closest

    o, d, valid = _rays(bunny, 16 * 1024, kind="scattered")
    res = jax.jit(
        lambda s, o, d, v: trace_closest_packets(
            s, o, d, v, packet_size=256
        )
    )(bunny.scene, o, d, valid)
    ref = trace_closest(bunny.scene, o, d, valid)
    _check(res, ref, min_hits=200)


@pytest.mark.parametrize("kind", ["camera", "scattered"])
def test_bf16_slabs_on_device(bunny, kind):
    """Conservative bf16 box tests must compile on the real target and
    stay bit-identical to f32 (Mosaic has no bf16 vector compare on
    v5e, so the kernels must keep every comparison in f32 — a lowering
    constraint interpret mode cannot exercise)."""
    from cuda_raytracer_tpu.ops.pallas.packet_dfs import (
        trace_closest_packets,
    )
    from cuda_raytracer_tpu.ops.pallas.wavefront2 import (
        trace_closest_wavefront,
    )

    o, d, valid = _rays(bunny, 64 * 1024, kind=kind)
    dfs_bf = jax.jit(lambda s, o, d, v: trace_closest_packets(
        s, o, d, v, slab_bf16=True))(bunny.scene, o, d, valid)
    dfs_f32 = jax.jit(lambda s, o, d, v: trace_closest_packets(
        s, o, d, v, slab_bf16=False))(bunny.scene, o, d, valid)
    np.testing.assert_array_equal(np.asarray(dfs_bf.t),
                                  np.asarray(dfs_f32.t))
    np.testing.assert_array_equal(np.asarray(dfs_bf.prim),
                                  np.asarray(dfs_f32.prim))
    wf_bf = jax.jit(lambda s, o, d, v: trace_closest_wavefront(
        s, o, d, v, box_bf16=True))(bunny.scene, o, d, valid)
    wf_f32 = jax.jit(lambda s, o, d, v: trace_closest_wavefront(
        s, o, d, v, box_bf16=False))(bunny.scene, o, d, valid)
    np.testing.assert_array_equal(np.asarray(wf_bf.t),
                                  np.asarray(wf_f32.t))
    np.testing.assert_array_equal(np.asarray(wf_bf.prim),
                                  np.asarray(wf_f32.prim))


def test_wavefront2_fused_counts_on_device(bunny):
    """fused_counts=True (kept for A/B; default False — measured slower
    on every pass, tools/bench_passes.py r3) must stay bit-identical."""
    from cuda_raytracer_tpu.ops.pallas.wavefront2 import (
        trace_closest_wavefront,
    )

    o, d, valid = _rays(bunny, 64 * 1024, kind="scattered")
    a = jax.jit(lambda s, o, d, v: trace_closest_wavefront(
        s, o, d, v, fused_counts=True))(bunny.scene, o, d, valid)
    b = jax.jit(lambda s, o, d, v: trace_closest_wavefront(
        s, o, d, v, fused_counts=False))(bunny.scene, o, d, valid)
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(np.asarray(a.prim),
                                  np.asarray(b.prim))

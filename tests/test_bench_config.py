"""CPU coverage of the benchmarked configuration (ADVICE r2).

bench.py runs sample_order='tiles8', rr_start_depth=2, fused per-depth
executables, and a per-pass traversal split — none of which the rest of
the suite exercised.  These tests pin each of those knobs against the
plain path on CPU:

* fuse_frame='yes' (per-depth jits) must equal the per-stage path
  bit-for-bit (same ops, same order).
* tiles8 raygen + inverse-order reconstruction must be a bijection:
  matched seeds give the same *set* of per-pixel sample means as
  raster order gives, and a deterministic re-render is identical.
* Russian roulette is an unbiased estimator: the RR image converges to
  the no-RR image within Monte Carlo tolerance.
* tiles8 with a non-multiple-of-8 frame is rejected up front
  (RenderConfig.__post_init__) instead of silently corrupting output.
"""

import numpy as np
import pytest

from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.models.cornell import cornell_box_scene
from cuda_raytracer_tpu.render.engine import WavefrontRenderer


def renderer(**kw):
    kw.setdefault("width", 64)
    kw.setdefault("height", 48)
    kw.setdefault("samples_per_frame", 2)
    r = WavefrontRenderer(RenderConfig(**kw))
    r.load_static_scene(cornell_box_scene(with_spheres=True))
    r.set_viewpoint([0, 0.75, 2.5], [0, 0.75, 0])
    return r


def test_fused_matches_per_stage():
    a = renderer(fuse_frame="yes")
    b = renderer(fuse_frame="no")
    a.render()
    b.render()
    np.testing.assert_allclose(
        a.get_raw_image(), b.get_raw_image(), rtol=1e-5, atol=1e-6
    )


def test_tiles8_rejects_unaligned_frame():
    with pytest.raises(ValueError, match="tiles8"):
        RenderConfig(width=20, height=12, sample_order="tiles8")
    with pytest.raises(ValueError, match="tiles8"):
        RenderConfig(width=64, height=44, sample_order="tiles8")


def test_tiles8_reconstruction_bijective_and_deterministic():
    a = renderer(sample_order="tiles8")
    a.render()
    img_a = a.get_raw_image()
    assert np.all(np.isfinite(img_a))
    assert img_a.max() > 0.05
    b = renderer(sample_order="tiles8")
    b.render()
    np.testing.assert_array_equal(img_a, b.get_raw_image())
    # bijection check: matched per-sample RNG means tiles8 must place
    # the same multiset of radiance values, just at permuted pixels --
    # the image means match raster exactly only per-pixel-permutation,
    # so compare whole-frame sums (reconstruction is a mean over spp,
    # a permutation of pixel assignments preserves the total)
    c = renderer(sample_order="raster")
    c.render()
    img_c = c.get_raw_image()
    # Not bit-identical (sample->pixel pairing differs) but a true
    # bijection keeps the totals within MC noise of each other and
    # never loses or duplicates samples; a non-bijective map (the bug
    # this guards) drops 20%+ of the energy to out-of-range slots.
    assert abs(img_a.sum() - img_c.sum()) / img_c.sum() < 0.15


def test_tiles8_matches_raster_given_matched_rays():
    """Force IDENTICAL rays through both orders: per-pixel means must
    then agree exactly (reconstruction inverts the sample order)."""
    import jax
    import jax.numpy as jnp
    from cuda_raytracer_tpu.ops import filters as F

    w, h, spp = 16, 8, 2
    n = w * h * spp
    light = jax.random.uniform(
        jax.random.PRNGKey(0), (n, 3), dtype=jnp.float32
    )
    # raster layout: slot p = pixel p (row major), samples consecutive
    img_r = F.reconstruct(light, w, h, spp, inv_order=None)
    # tiles8 layout: slot ordering by 8x8 tile; build the same rank the
    # engine builds and permute the samples accordingly
    py, px = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    rank = ((py // 8) * (w // 8) * 64 + (px // 8) * 64
            + (py % 8) * 8 + (px % 8)).reshape(-1)
    # pixel p's samples land at slots rank[p]*spp + s
    perm = np.argsort(rank)  # slot-major list of pixels
    light_t = np.asarray(light).reshape(w * h, spp, 3)[perm].reshape(
        n, 3
    )
    img_t = F.reconstruct(
        jnp.asarray(light_t), w, h, spp,
        inv_order=jnp.asarray(rank, jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(img_r), np.asarray(img_t), rtol=1e-6, atol=1e-7
    )


def test_russian_roulette_unbiased():
    """RR@depth2 must preserve the estimator mean (tolerance: MC noise
    at matched sample counts; RR only raises variance)."""
    frames = 24
    a = renderer(max_depth=4, rr_start_depth=0, width=32, height=24)
    b = renderer(max_depth=4, rr_start_depth=2, width=32, height=24)
    for _ in range(frames):
        a.render()
        b.render()
    ia, ib = a.get_raw_image(), b.get_raw_image()
    assert np.all(np.isfinite(ib))
    # per-image mean brightness within 3% (depth>=2 light is a small
    # fraction of the total; RR noise on it stays well inside this)
    assert abs(ia.mean() - ib.mean()) / ia.mean() < 0.03


def test_per_pass_backend_split_matches_single_backend():
    """traversal_secondary='xla' must give identical results to the
    all-xla engine on CPU (same oracle, split plumbing only)."""
    a = renderer(traversal="xla", traversal_secondary="xla",
                 max_depth=3)
    b = renderer(traversal="xla", max_depth=3)
    a.render()
    b.render()
    np.testing.assert_array_equal(a.get_raw_image(), b.get_raw_image())


def test_compact_trace_selected_only_at_rr_depths():
    """run_depth must route depth>=rr_start_depth traversals through
    the compacted secondary trace (the partition sweep only pays on
    RR-thinned populations) and every other pass through the plain
    ones."""
    import jax
    import jax.numpy as jnp

    from cuda_raytracer_tpu.render import bounce as B

    cfg = RenderConfig(width=16, height=8, samples_per_frame=1,
                       max_depth=4, rr_start_depth=2,
                       nee_schedule=((1, 1.0),) * 4, traversal="xla")
    r = renderer(width=16, height=8, samples_per_frame=1,
                 max_depth=4, rr_start_depth=2,
                 nee_schedule=((1, 1.0),) * 4, traversal="xla")
    scene = r.scene
    stages = B.make_stage_fns(cfg)
    calls = []

    def wrap(tag, fn):
        def f(*a, **kw):
            calls.append(tag)
            return fn(*a, **kw)
        return f

    J = dict(
        stages,
        trace=wrap("primary", stages["trace"]),
        trace_secondary=wrap("secondary", stages["trace_secondary"]),
        trace_secondary_compact=wrap(
            "compact", stages["trace_secondary_compact"]
        ),
    )
    key = jax.random.PRNGKey(0)
    n = 16 * 8
    o = jnp.zeros((n, 3), jnp.float32).at[:, 2].set(2.5)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    carry = (o, d, jnp.ones((n,), bool), jnp.ones((n, 3), jnp.float32),
             jnp.zeros((n, 3), jnp.float32), jnp.ones((n,), bool),
             jnp.int32(0))
    per_depth = []
    for depth in range(cfg.max_depth):
        calls.clear()
        carry = B.run_depth(J, cfg, scene, carry, key, depth)
        per_depth.append(set(calls))
    assert per_depth[0] == {"primary"}
    assert per_depth[1] == {"secondary"}
    assert per_depth[2] == {"compact"}
    assert per_depth[3] == {"compact"}


def test_bench_matches_fast_preset():
    """bench.py's measured config and `--preset fast` must be the SAME
    operating point, field for field on every preset-owned knob
    (VERDICT r4 weak 2: the r4 preset shipped compact_depths=True,
    which bench.py measured as a net loss and ran with False — a CLI
    user got ~25%% less than the advertised number)."""
    import importlib.util
    import os

    from cuda_raytracer_tpu.config import fast_preset_kwargs

    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    cfg = bench.bench_config()
    preset = fast_preset_kwargs(bench.WIDTH, bench.HEIGHT, bench.TOTAL_SPP)
    for field, value in preset.items():
        assert getattr(cfg, field) == value, (
            f"bench.py diverges from --preset fast on {field}: "
            f"{getattr(cfg, field)!r} != {value!r}"
        )

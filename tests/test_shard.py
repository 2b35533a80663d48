"""Multi-chip sharding correctness on the 8-virtual-device CPU mesh.

New capability vs the single-GPU reference (SURVEY.md section 2.4):
samples mode must equal the per-chip-average computed on one device
(psum-mean is the same estimator), tiles mode must stitch slabs
exactly, and per-chip RNG streams must be disjoint.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.models.cornell import cornell_box_scene
from cuda_raytracer_tpu.parallel import shard
from cuda_raytracer_tpu.render.flatscene import flatten_scene

NDEV = 8


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices("cpu")
    if len(devs) < NDEV:
        pytest.skip(f"need {NDEV} virtual devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:NDEV]), ("rays",))


@pytest.fixture(scope="module")
def setup():
    cfg = RenderConfig(
        width=32, height=16, samples_per_frame=NDEV, max_depth=2,
        nee_schedule=((1, 1.0), (1, 1.0)),
    )
    scene, _ = flatten_scene(cornell_box_scene(with_spheres=True))
    cam = (
        jnp.asarray([0.0, 0.75, 2.5], jnp.float32),
        jnp.eye(3, dtype=jnp.float32),
    )
    tan_h = math.tan(math.radians(50.0) / 2)
    tan_v = math.tan(math.radians(35.0) / 2)
    return cfg, scene, cam, tan_h, tan_v


def test_samples_mode_matches_single_chip_average(mesh, setup):
    """psum-mean over chips == the mean of the same per-chip chunks
    computed on one device (bitwise-same estimator, tight tolerance)."""
    cfg, scene, cam, tan_h, tan_v = setup
    key = jax.random.PRNGKey(7)

    sharded = shard.render_frame_sharded(
        mesh, scene, cfg, cam, key, tan_h, tan_v
    )

    spp_chip = cfg.samples_per_frame // NDEV
    chunks = [
        shard._render_chunk(
            scene, cfg, cam, jax.random.fold_in(key, i), tan_h, tan_v,
            spp_chip,
        )
        for i in range(NDEV)
    ]
    expected = jnp.mean(jnp.stack(chunks), axis=0)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(expected), rtol=1e-5, atol=1e-6
    )


def test_tiles_mode_stitches_exactly(mesh, setup):
    """Each chip's slab equals the same slab computed standalone."""
    cfg, scene, cam, tan_h, tan_v = setup
    cfg = cfg.replace(shard_mode="tiles")
    key = jax.random.PRNGKey(11)

    sharded = np.asarray(
        shard.render_frame_sharded(mesh, scene, cfg, cam, key, tan_h, tan_v)
    )
    assert sharded.shape == (cfg.height, cfg.width, 3)

    rows = cfg.height // NDEV
    tile_cfg = shard._slab_config(cfg, rows)
    from cuda_raytracer_tpu.ops import filters as F
    from cuda_raytracer_tpu.ops import shade as S
    from cuda_raytracer_tpu.render.bounce import (
        make_stage_fns, run_bounce_loop,
    )

    for idx in (0, 3, NDEV - 1):
        chip_key = jax.random.fold_in(key, idx)
        pix_order, inv_order, sample_major = shard._order_arrays(tile_cfg)
        o, d = S.generate_camera_rays(
            jax.random.fold_in(chip_key, 0), cfg.width, rows,
            cfg.samples_per_frame, cam[0], cam[1], tan_h, tan_v,
            pix_order=pix_order, row_offset=idx * rows,
            full_height=cfg.height,
        )
        light, _ = run_bounce_loop(
            make_stage_fns(tile_cfg), tile_cfg, scene, o, d, chip_key
        )
        slab = np.asarray(
            F.reconstruct(light, cfg.width, rows, cfg.samples_per_frame,
                          inv_order=inv_order, sample_major=sample_major)
        )
        np.testing.assert_allclose(
            sharded[idx * rows:(idx + 1) * rows], slab,
            rtol=1e-5, atol=1e-6,
        )


def test_chip_rng_streams_disjoint(setup):
    """Different chips must trace different sample sequences."""
    cfg, scene, cam, tan_h, tan_v = setup
    key = jax.random.PRNGKey(3)
    imgs = [
        np.asarray(shard._render_chunk(
            scene, cfg, cam, jax.random.fold_in(key, i), tan_h, tan_v, 1
        ))
        for i in range(3)
    ]
    assert not np.array_equal(imgs[0], imgs[1])
    assert not np.array_equal(imgs[1], imgs[2])
    # but the estimator agrees in expectation (MC tolerance)
    means = [im.mean() for im in imgs]
    assert max(means) < 3 * min(means) + 1e-3


def test_sharded_renderer_accumulates(mesh, setup, tmp_path):
    """The productized ShardedRenderer (VERDICT r3 task 7): engine-
    parity accumulate / reset-on-move / checkpoint loop, both modes."""
    from cuda_raytracer_tpu.models.cornell import cornell_box_scene
    from cuda_raytracer_tpu.parallel.shard import ShardedRenderer

    for mode in ("samples", "tiles"):
        cfg = RenderConfig(
            width=32, height=16, samples_per_frame=NDEV,
            total_samples=2 * NDEV, max_depth=2,
            nee_schedule=((1, 1.0), (1, 1.0)), shard_mode=mode,
        )
        sr = ShardedRenderer(cfg, mesh, camera_mode="canonical")
        sr.load_static_scene(cornell_box_scene(with_spheres=True))
        sr.set_viewpoint([0.0, 0.75, 2.5], [0.0, 0.75, 0.0])
        sr.render()
        assert sr.image_samples == NDEV
        first = sr.get_raw_image().copy()
        ckpt = str(tmp_path / f"ck_{mode}.npz")
        sr.save_checkpoint(ckpt)
        sr.render()
        assert sr.image_samples == 2 * NDEV
        second = sr.get_raw_image().copy()
        assert not np.array_equal(first, second)  # new samples folded in
        img = sr.get_image()
        assert img.shape == (16, 32, 3) and np.isfinite(img).all()

        # resume from the checkpoint reproduces frame 2 exactly (same
        # frame_index -> same RNG stream)
        sr2 = ShardedRenderer(cfg, mesh, camera_mode="canonical")
        sr2.load_static_scene(cornell_box_scene(with_spheres=True))
        sr2.set_viewpoint([0.0, 0.75, 2.5], [0.0, 0.75, 0.0])
        sr2.load_checkpoint(ckpt)
        np.testing.assert_array_equal(sr2.get_raw_image(), first)
        sr2.render()
        np.testing.assert_array_equal(sr2.get_raw_image(), second)

        # reset-on-move clears accumulation
        sr.set_viewpoint([0.0, 0.8, 2.4], [0.0, 0.7, 0.0])
        assert sr.image_samples == 0


def test_sharded_renderer_honors_sample_order(mesh):
    """samples mode reproduces the engine's tiles32s swizzle: the
    sharded frame must equal the per-chip-average of chunks rendered
    with the same order (the raygen/reconstruct pair must invert)."""
    from cuda_raytracer_tpu.models.cornell import cornell_box_scene
    from cuda_raytracer_tpu.parallel import shard
    from cuda_raytracer_tpu.render.flatscene import flatten_scene

    cfg = RenderConfig(
        width=32, height=16, samples_per_frame=NDEV, max_depth=2,
        nee_schedule=((1, 1.0), (1, 1.0)), sample_order="tiles32s",
        rng_granule=128,
    )
    scene, _ = flatten_scene(cornell_box_scene(with_spheres=True))
    cam = (
        jnp.asarray([0.0, 0.75, 2.5], jnp.float32),
        jnp.eye(3, dtype=jnp.float32),
    )
    tan_h = math.tan(math.radians(50.0) / 2)
    tan_v = math.tan(math.radians(35.0) / 2)
    key = jax.random.PRNGKey(13)
    sharded = shard.render_frame_sharded(
        mesh, scene, cfg, cam, key, tan_h, tan_v
    )
    chunks = [
        shard._render_chunk(
            scene, cfg, cam, jax.random.fold_in(key, i), tan_h, tan_v, 1
        )
        for i in range(NDEV)
    ]
    expected = jnp.mean(jnp.stack(chunks), axis=0)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(expected), rtol=1e-5, atol=1e-6
    )
    assert np.isfinite(np.asarray(sharded)).all()


def test_sharded_matches_engine_estimator(mesh, setup):
    """Sharded accumulation agrees with the single-chip engine within
    Monte Carlo noise (same physics, different RNG partition)."""
    cfg, scene, cam, tan_h, tan_v = setup
    key = jax.random.PRNGKey(5)
    sharded = np.asarray(
        shard.render_frame_sharded(mesh, scene, cfg, cam, key, tan_h, tan_v)
    )
    single = np.asarray(
        shard._render_chunk(
            scene, cfg, cam, jax.random.fold_in(key, 99), tan_h, tan_v,
            cfg.samples_per_frame,
        )
    )
    assert abs(sharded.mean() - single.mean()) < 0.25 * max(
        sharded.mean(), single.mean()
    )


def test_tiles_mode_honors_tiles32s_warning_free(mesh):
    """The bench-winning tiles32s + shared-u granule config survives
    tile sharding (VERDICT r4 weak 5): each slab renders in tiles32s
    sample-major order (exact stitch against a standalone slab with
    the same swizzle), and no warning fires on the way."""
    import warnings

    from cuda_raytracer_tpu.ops import filters as F
    from cuda_raytracer_tpu.ops import shade as S
    from cuda_raytracer_tpu.render.bounce import (
        make_stage_fns, run_bounce_loop,
    )

    cfg = RenderConfig(
        width=32, height=16, samples_per_frame=NDEV, max_depth=2,
        nee_schedule=((1, 1.0), (1, 1.0)), shard_mode="tiles",
        sample_order="tiles32s", rng_granule=128,
    )
    scene, _ = flatten_scene(cornell_box_scene(with_spheres=True))
    cam = (
        jnp.asarray([0.0, 0.75, 2.5], jnp.float32),
        jnp.eye(3, dtype=jnp.float32),
    )
    tan_h = math.tan(math.radians(50.0) / 2)
    tan_v = math.tan(math.radians(35.0) / 2)
    key = jax.random.PRNGKey(29)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        sharded = np.asarray(shard.render_frame_sharded(
            mesh, scene, cfg, cam, key, tan_h, tan_v
        ))
    dropped = [w for w in caught if "sample_order" in str(w.message)]
    assert not dropped, f"slab order dropped: {dropped[0].message}"
    assert np.isfinite(sharded).all()

    rows = cfg.height // NDEV
    tile_cfg = shard._slab_config(cfg, rows)
    assert tile_cfg.sample_order == "tiles32s"  # honored, not dropped
    for idx in (0, NDEV - 1):
        chip_key = jax.random.fold_in(key, idx)
        pix_order, inv_order, sample_major = shard._order_arrays(tile_cfg)
        assert sample_major
        o, d = S.generate_camera_rays(
            jax.random.fold_in(chip_key, 0), cfg.width, rows,
            cfg.samples_per_frame, cam[0], cam[1], tan_h, tan_v,
            pix_order=pix_order, row_offset=idx * rows,
            full_height=cfg.height,
        )
        light, _ = run_bounce_loop(
            make_stage_fns(tile_cfg), tile_cfg, scene, o, d, chip_key
        )
        slab = np.asarray(
            F.reconstruct(light, cfg.width, rows, cfg.samples_per_frame,
                          inv_order=inv_order, sample_major=sample_major)
        )
        np.testing.assert_allclose(
            sharded[idx * rows:(idx + 1) * rows], slab,
            rtol=1e-5, atol=1e-6,
        )

"""Packet-correlated secondary sampling (cfg.rng_granule) and the
sample-major tiles32s layout.

* tiles32s rank arithmetic must be a bijection pixel <-> slot, with
  the closed-form inverse in ops/shade._pix_from_slot matching the
  numpy forward map — including a partial last tile row (height % 32
  != 0, the 800x600 bench case).
* tiles32s rendering must reconstruct the same image as raster order
  (same per-pixel estimator, different slot layout).
* rng_granule > 1 must leave the estimator mean unchanged within MC
  tolerance (shared draws across pixels, still independent per sample
  index), and per-pixel variance must actually shrink with spp.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.ops import shade as S
from cuda_raytracer_tpu.render.engine import WavefrontRenderer
from cuda_raytracer_tpu.models.cornell import cornell_box_scene


@pytest.mark.parametrize("wh", [(64, 64), (64, 40), (96, 24), (32, 50)])
def test_tiles32s_rank_bijection(wh):
    w, h = wh
    rank = S.tiles32s_rank(w, h)
    assert sorted(rank.tolist()) == list(range(w * h))
    # closed-form inverse agrees with the numpy forward map
    q = jnp.arange(w * h, dtype=jnp.int32)
    pix = np.asarray(S._pix_from_slot(q, w, h, "tiles32s"))
    inv = np.empty(w * h, np.int64)
    inv[rank] = np.arange(w * h)
    np.testing.assert_array_equal(pix, inv)


def test_tiles32s_packets_are_single_sample_tiles():
    """A 1024-slot window under tiles32s holds exactly one sample index
    of one 32x32 tile (the property rng_granule relies on)."""
    w, h, spp = 64, 64, 4
    wh = w * h
    i = np.arange(wh * spp)
    pslot = i % wh
    s = i // wh
    pix = np.asarray(
        S._pix_from_slot(jnp.asarray(pslot, jnp.int32), w, h, "tiles32s")
    )
    for p0 in range(0, wh * spp, 1024):
        win = slice(p0, p0 + 1024)
        assert len(set(s[win])) == 1
        tx = set((pix[win] % w) // 32)
        ty = set((pix[win] // w) // 32)
        assert len(tx) == 1 and len(ty) == 1


def _render(order, granule, spp=8, seed=0, fold=True):
    cfg = RenderConfig(
        width=64, height=40, samples_per_frame=spp, total_samples=spp,
        max_depth=2, nee_schedule=((1, 1.0), (1, 1.0)),
        sample_order=order, rng_granule=granule, seed=seed,
        rng_fold_dirs=fold,
        traversal="xla", fuse_frame="no",
    )
    r = WavefrontRenderer(cfg)
    r.load_static_scene(cornell_box_scene(with_spheres=True))
    r.set_viewpoint([0, 0.75, 2.5], [0, 0.75, 0])
    r.render()
    return np.asarray(r.get_raw_image())


def test_tiles32s_matches_raster_mean():
    a = _render("raster", 1, spp=16)
    b = _render("tiles32s", 1, spp=16)
    # same estimator, different sample slots: means agree to MC noise
    assert abs(a.mean() - b.mean()) < 0.02
    assert np.mean(np.abs(a - b)) < 0.25


def test_rng_granule_unbiased():
    """Shared-u rendering converges to the same image: average several
    independent low-spp frames of each mode and compare."""
    ind, sh = [], []
    for s in range(4):
        ind.append(_render("tiles32s", 1, spp=8, seed=s))
        sh.append(_render("tiles32s", 128, spp=8, seed=s, fold=False))
    a = np.mean(ind, axis=0)
    b = np.mean(sh, axis=0)
    assert abs(a.mean() - b.mean()) < 0.02
    assert np.mean(np.abs(a - b)) < 0.25


def test_rng_fold_dirs_unbiased():
    """The antithetic-fold mode (one shared sphere direction per
    granule, folded per lane) must converge to the same image as
    independent per-ray draws."""
    ind, fo = [], []
    for s in range(4):
        ind.append(_render("tiles32s", 1, spp=8, seed=s))
        fo.append(_render("tiles32s", 128, spp=8, seed=s, fold=True))
    a = np.mean(ind, axis=0)
    b = np.mean(fo, axis=0)
    assert abs(a.mean() - b.mean()) < 0.02
    assert np.mean(np.abs(a - b)) < 0.25


def test_folded_direction_distribution():
    """d = sign(dot(w, n)) * w with w uniform on the sphere must be
    uniform on the hemisphere around each lane's n: cos = dot(d, n)
    is then Uniform[0, 1] (E=1/2, E[cos^2]=1/3), for every normal."""
    import jax

    k = jax.random.PRNGKey(3)
    m = 200_000
    u = jax.random.uniform(k, (m, 2), dtype=jnp.float32)
    from cuda_raytracer_tpu.ops.shade import _spherical_sample

    w = _spherical_sample(u)
    n = np.asarray(
        _spherical_sample(
            jax.random.uniform(jax.random.PRNGKey(4), (m, 2),
                               dtype=jnp.float32)
        )
    )
    d = np.asarray(w) * np.where(
        (np.asarray(w) * n).sum(-1) >= 0, 1.0, -1.0
    )[:, None]
    cos = (d * n).sum(-1)
    assert cos.min() >= 0
    assert abs(cos.mean() - 0.5) < 0.005
    assert abs((cos ** 2).mean() - 1.0 / 3.0) < 0.005
    # and the azimuthal part stays uniform: mean direction ~ n/2
    resid = d - cos[:, None] * n
    assert np.abs(resid.mean(axis=0)).max() < 0.01


def test_rng_granule_per_pixel_variance_shrinks():
    """A pixel's spp samples must use DISTINCT draws under shared-u:
    doubling spp must reduce frame-to-frame variance (it would not if
    a pixel's samples were correlated within a granule)."""
    lo = np.stack([_render("tiles32s", 128, spp=4, seed=s)
                   for s in range(4)])
    hi = np.stack([_render("tiles32s", 128, spp=16, seed=s)
                   for s in range(4)])
    v_lo = lo.var(axis=0).mean()
    v_hi = hi.var(axis=0).mean()
    assert v_hi < v_lo * 0.6, (v_lo, v_hi)


def test_rng_granule_requires_sample_major():
    with pytest.raises(ValueError, match="tiles32s"):
        RenderConfig(width=64, height=64, sample_order="tiles8",
                     rng_granule=128)
    with pytest.raises(ValueError, match="multiple of 32"):
        RenderConfig(width=40, height=64, sample_order="tiles32s")

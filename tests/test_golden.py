"""Golden-image regression vs media/pathtracer/reference_results.

The goldens were rendered by the pre-fork course CPU solution with an
unrecorded camera, so pixel-exact comparison is not attainable; what IS
stable — and what these tests pin — is the radiometry and structure:
whole-frame tonemapped brightness (catches estimator-scale and NEE
regressions), wall-color lateralization (catches channel swaps and
mirrored framing), and the emissive ceiling panel (catches emission
accounting).  Skipped when the reference media is absent.
"""

import os

import numpy as np
import pytest

from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.render.engine import WavefrontRenderer

GOLDEN = "/root/reference/media/pathtracer/reference_results"
SCENES = "/root/reference/media/pathtracer"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN), reason="reference media unavailable"
)


def _tonemap(raw: np.ndarray) -> np.ndarray:
    """Scotty3D display transform (s * sqrt(2))^(1/2.2)."""
    return np.clip(raw * np.sqrt(2.0), 0.0, None) ** (1.0 / 2.2)


def _load_golden(name: str) -> np.ndarray:
    from PIL import Image

    img = np.asarray(
        Image.open(os.path.join(GOLDEN, name)).convert("RGB"), np.float64
    ) / 255.0
    # some goldens are letterboxed (e.g. sky/CBbunny.png): crop to the
    # non-black content bounding box
    lit = img.sum(-1) > 0.02
    ys, xs = np.nonzero(lit)
    return img[ys.min(): ys.max() + 1, xs.min(): xs.max() + 1]


def _render(dae: str, spp: int = 32, depth: int = 6, w: int = 96, h: int = 72):
    r = WavefrontRenderer(
        RenderConfig(width=w, height=h, samples_per_frame=8, max_depth=depth,
                     hemisphere_sampling='uniform')
    )
    r.camera_mode = "cutracer"
    r.load_scene(os.path.join(SCENES, dae))
    for _ in range(spp // 8):
        r.render()
    return _tonemap(np.asarray(r.get_raw_image()))


@pytest.fixture(scope="module")
def cbspheres_render():
    return _render("advanced/CBspheres_lambertian.dae", spp=16, w=80, h=60)


def test_golden_cbspheres_brightness(cbspheres_render):
    """Tonemapped mean within 25% of the 6400SPP golden — pins the
    estimator scale (NEE weights, emission, bounce throughput)."""
    golden = _load_golden("sky/6400SPP_lambertian.png")
    ratio = cbspheres_render.mean() / golden.mean()
    assert 0.75 < ratio < 1.25, f"brightness ratio {ratio:.3f}"


def test_golden_cbspheres_wall_colors(cbspheres_render):
    """Red wall on the left, blue on the right, like the golden."""
    img = cbspheres_render
    w = img.shape[1]
    left, right = img[:, : w // 4], img[:, -w // 4:]
    assert left[..., 0].mean() > left[..., 2].mean() * 1.1
    assert right[..., 2].mean() > right[..., 0].mean() * 1.1
    golden = _load_golden("sky/6400SPP_lambertian.png")
    gl, gr = golden[:, : golden.shape[1] // 4], golden[:, -golden.shape[1] // 4:]
    assert gl[..., 0].mean() > gl[..., 2].mean()  # sanity on the golden
    assert gr[..., 2].mean() > gr[..., 0].mean()


def test_golden_cbspheres_ceiling_panel(cbspheres_render):
    """The emissive panel is the brightest region and sits top-center."""
    img = cbspheres_render.mean(-1)
    thresh = np.quantile(img, 0.99)
    ys, xs = np.nonzero(img >= thresh)
    cy, cx = ys.mean() / img.shape[0], xs.mean() / img.shape[1]
    assert cy < 0.35, f"brightest region not near the top (cy={cy:.2f})"
    assert 0.25 < cx < 0.75, f"panel not centered (cx={cx:.2f})"


def test_golden_cbbunny_brightness():
    """CBbunny end-to-end (28.5k tris): brightness against the golden."""
    img = _render("advanced/CBbunny.dae", spp=8, w=48, h=36)
    golden = _load_golden("sky/CBbunny.png")
    ratio = img.mean() / golden.mean()
    assert 0.6 < ratio < 1.4, f"brightness ratio {ratio:.3f}"
    assert np.all(np.isfinite(img))

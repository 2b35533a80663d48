"""Film reconstruction, accumulation, and post-process filters (jnp).

Equivalents of kernelUpdateSSImage / kernelReconstructImage /
kernelAccumulate / kernelClearAccumulate / kernelMedianFilter
(src/cudaRenderer.cu:666-842).
"""

from __future__ import annotations

import jax.numpy as jnp


def reconstruct(sample_light: jnp.ndarray, width: int, height: int, spp: int,
                inv_order=None, sample_major: bool = False):
    """Box-filter the per-sample radiance into an image
    (kernelReconstructImage, src/cudaRenderer.cu:705-718).

    sample_light: [W*H*spp, 3] with each pixel's spp samples
    consecutive (or, with ``sample_major=True``, all pixels of sample
    0 first — the tiles32s layout).  With the default raster order,
    sample slot p covers pixel p; with a swizzled sample order pass
    ``inv_order`` ([H*W] i32, inv_order[pixel] = slot) to un-swizzle.
    Returns [H, W, 3].
    """
    if sample_major:
        means = sample_light.reshape(spp, -1, 3).mean(axis=0)
    else:
        means = sample_light.reshape(-1, spp, 3).mean(axis=1)
    if inv_order is not None:
        means = means[inv_order]
    return means.reshape(height, width, 3)


def accumulate(final_img, new_img, old_weight, new_weight):
    """Running average across frames (kernelAccumulate,
    src/cudaRenderer.cu:739-742)."""
    return (final_img * old_weight + new_img * new_weight) / (
        old_weight + new_weight
    )


def median_filter_3x3(img: jnp.ndarray, reference_compat: bool = False):
    """Per-channel 3x3 median (kernelMedianFilter,
    src/cudaRenderer.cu:773-842 — the "4th largest per channel").

    ``reference_compat=True`` pads out-of-bounds neighbors with white
    (the reference's border behavior, cu:805-811); the default clamps to
    the edge, which avoids the reference's bright-border artifact.
    Applied while accumulated spp < POST_PROCESS_THRESHOLD.
    """
    h, w, _ = img.shape
    if reference_compat:
        pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), constant_values=1.0)
    else:
        pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    # gather the 9 shifted views: [H, W, 9, 3]
    views = jnp.stack(
        [pad[dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)],
        axis=2,
    )
    # true median of 9 = index 4 ascending; the reference's "4th largest"
    # (BLUR_MEDIAN_INDEX=4, cu:826-838) is index 5 ascending — slightly
    # brighter than the median
    idx = 5 if reference_compat else 4
    return jnp.sort(views, axis=2)[:, :, idx, :]


def tonemap(img: jnp.ndarray, gamma: float = 2.2, exposure: float = 1.0):
    """HDR -> display mapping (HDRImageBuffer::tonemap, src/image.h)."""
    img = 1.0 - jnp.exp(-img * exposure)
    return jnp.clip(img, 0.0, 1.0) ** (1.0 / gamma)

"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding tests
work without TPU hardware (SURVEY.md section 4: mesh emulation via
xla_force_host_platform_device_count).  Must be set before jax imports.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may export axon/tpu
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize registers an `axon` TPU backend in
# every interpreter and force-selects it via jax.config, ignoring
# JAX_PLATFORMS — which would make every CPU test claim (and fight
# over) the single TPU tunnel session.  Re-pin the platform selection
# to cpu before any computation runs.  (Run pytest with
# PALLAS_AXON_POOL_IPS= to skip the TPU registration entirely.)
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import pytest  # noqa: E402

REFERENCE_MEDIA = "/root/reference/media/pathtracer"


def media_path(rel: str) -> str:
    return os.path.join(REFERENCE_MEDIA, rel)


@pytest.fixture
def cbspheres_scene():
    """CBspheres_lambertian static scene (skips without reference media)."""
    path = media_path("advanced/CBspheres_lambertian.dae")
    if not os.path.exists(path):
        pytest.skip("reference media not available")
    from cuda_raytracer_tpu.scene.collada import load_scene_info
    from cuda_raytracer_tpu.scene.dynamic_scene import load_from_scene_info

    scene, cam_info, cam_xf, cut = load_from_scene_info(load_scene_info(path))
    return scene.get_static_scene(), cam_info, cam_xf

"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding tests
work without TPU hardware (SURVEY.md section 4: mesh emulation via
xla_force_host_platform_device_count).  Must be set before jax imports.
"""

import os
import sys

#: RUN_TPU_TESTS=1 keeps the real TPU visible so `pytest -m tpu` can
#: run the on-hardware parity suite (test_tpu_parity.py); everything
#: else runs on the forced-CPU virtual mesh.
RUN_TPU = bool(os.environ.get("RUN_TPU_TESTS"))
if not RUN_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"  # the shell may export axon/tpu
flags = os.environ.get("XLA_FLAGS", "")
if not RUN_TPU and "xla_force_host_platform_device_count" not in flags:
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

if not RUN_TPU:
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: on-hardware kernel parity tests (need RUN_TPU_TESTS=1 "
        "and a real TPU; run `RUN_TPU_TESTS=1 pytest -m tpu`)",
    )


def pytest_collection_modifyitems(config, items):
    if RUN_TPU:
        # TPU session: run ONLY the tpu-marked tests (the rest of the
        # suite assumes the 8-device CPU mesh)
        skip = pytest.mark.skip(reason="non-TPU test in TPU session")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="needs RUN_TPU_TESTS=1 and TPU hardware"
        )
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)

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

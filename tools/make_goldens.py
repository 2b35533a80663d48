"""(Re)generate the pixel-exact self-goldens (tests/test_golden_exact).

Run on CPU for the cpu/ set and on the TPU (normal env) for the tpu/
set; the backend subdirectory is picked from jax.default_backend().
Regenerating is the deliberate "the image is supposed to change" act —
commit the resulting diff together with the change that caused it.

Usage: python tools/make_goldens.py [name ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests"),
)

if os.environ.get("GOLDEN_CPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if os.environ.get("GOLDEN_CPU"):
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

from PIL import Image  # noqa: E402

from golden_exact_spec import SCENES, golden_path, render_golden  # noqa: E402


def main():
    names = sys.argv[1:] or sorted(SCENES)
    backend = jax.default_backend()
    backend = {"cpu": "cpu", "tpu": "tpu"}.get(backend, backend)
    for name in names:
        img = render_golden(name)
        if img is None:
            print(f"{name}: SKIP (media unavailable)")
            continue
        path = golden_path(backend, name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(img, mode="RGB").save(path)
        print(f"{name}: wrote {path} mean={img.mean():.2f}")


if __name__ == "__main__":
    main()

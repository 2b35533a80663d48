"""Device-side rendering: flat scene, wavefront engine, CPU oracle, film."""

from .flatscene import FlatScene, FlatBVH, flatten_scene  # noqa: F401

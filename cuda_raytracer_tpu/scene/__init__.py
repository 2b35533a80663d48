"""Scene layer: COLLADA I/O, scene graph, camera, BSDFs.

Mirrors the Scotty3D scene API surface of the reference
(src/collada/, src/dynamic_scene/, src/static_scene/, src/camera.*,
src/bsdf.*) with numpy-backed host types.
"""

from .collada_info import (  # noqa: F401
    CameraInfo,
    Instance,
    LightInfo,
    LightType,
    MaterialInfo,
    Node,
    PolymeshInfo,
    Polygon,
    SceneInfo,
    SphereInfo,
)
from .collada import ColladaParser, load_scene_info  # noqa: F401
from .bsdf import (  # noqa: F401
    BSDF,
    DiffuseBSDF,
    EmissionBSDF,
    GlassBSDF,
    MirrorBSDF,
    RefractionBSDF,
)
from .camera import Camera  # noqa: F401
from . import static_scene  # noqa: F401
from . import dynamic_scene  # noqa: F401

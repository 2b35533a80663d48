"""Cost split of the jitted wavefront2 trace via static debug knobs."""
import math, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.render.engine import WavefrontRenderer
from cuda_raytracer_tpu.ops import shade as S
from cuda_raytracer_tpu.ops.pallas.wavefront2 import trace_closest_wavefront

SCENE = "/root/reference/media/pathtracer/advanced/CBbunny.dae"
cfg = RenderConfig(width=800, height=600, samples_per_frame=2)
r = WavefrontRenderer(cfg, camera_mode="collada"); r.load_scene(SCENE)
scene = r.scene
key = jax.random.PRNGKey(0)
o, d = S.generate_camera_rays(key, cfg.width, cfg.height, 2,
    jnp.asarray(r.camera.pos, jnp.float32), jnp.asarray(r.camera.c2w, jnp.float32),
    math.tan(math.radians(r.camera.hFov)/2), math.tan(math.radians(r.camera.vFov)/2))
valid = jnp.ones((o.shape[0],), bool)

def timed(f, reps=3):
    out = f(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(); jax.block_until_ready(out)
    return (time.perf_counter()-t0)/reps

import functools
variants = [("full", dict())]
variants += [(f"L{k}", dict(debug_levels=k)) for k in (1,2,3,4,5,6)]
variants += [("noleaf", dict(debug_no_leaf=True))]
prev = 0.0
for name, kw in variants:
    f = jax.jit(functools.partial(trace_closest_wavefront, **kw))
    dt = timed(lambda: f(scene, o, d, valid))
    print(f"{name:7s}: {dt*1e3:8.2f} ms")

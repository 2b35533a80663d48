"""Raw cost of the ops/seeds.py sweep at bench scale, by K."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.render.engine import WavefrontRenderer
from cuda_raytracer_tpu.ops.seeds import seed_hits

print("loading scene", flush=True)
r = WavefrontRenderer(RenderConfig(width=64, height=64, tree_width=4,
                                   max_leaf_size=32), camera_mode="collada")
r.load_scene("/root/reference/media/pathtracer/advanced/CBbunny.dae")
scene = r.scene
print("scene loaded", flush=True)
N = 15_360_000
rng = np.random.default_rng(0)
o = jnp.asarray(rng.random((N, 3), np.float32))
d = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
valid = jnp.ones((N,), bool)
print("rays ready", flush=True)
for k in (32, 16, 8):
    f = jax.jit(lambda s, o, d, v, k=k: seed_hits(s, o, d, v, k=k))
    sd = f(scene, o, d, valid); jax.block_until_ready(sd.t)
    print(f"K={k} compiled", flush=True)
    ts = []
    for rep in range(4):
        oi = o + (rep + 1) * 1e-6
        t0 = time.perf_counter()
        sd = f(scene, oi, d, valid)
        float(jnp.sum(sd.t))
        ts.append(time.perf_counter() - t0)
    print(f"K={k}: min {min(ts)*1e3:.1f} ms  all {[f'{t*1e3:.0f}' for t in ts]}",
          flush=True)

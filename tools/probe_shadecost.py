"""Cost of the compute_hits wide-row gather INSIDE the fused per-depth
programs: A/B the engine with the real shade_packed[prim] gather vs a
stubbed constant-index gather (row 0).  The stub renders garbage — this
is a timing probe only.

Caveat (advisor r3): the stub's garbage normals/BSDFs change scatter
directions, RR survival, and traversal coherence at later depths, so
only the depth-0 (and shadow-pass) real-vs-stub deltas isolate the
gather cost; depth>=1 deltas mix in distribution shift.  (clip(prim,
-1, 0) also wrap-indexes row -1 into the LAST table row rather than
masking — harmless for timing, wrong for values.)

Usage: python tools/probe_shadecost.py [real|stub]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["CRT_TIME_DEPTHS"] = "1"

variant = sys.argv[1] if len(sys.argv) > 1 else "real"

import jax.numpy as jnp
from cuda_raytracer_tpu.ops import shade as S

if variant == "stub":
    _orig = S.compute_hits

    def stub(scene, o, d, t, prim, origin_eps=1e-3):
        return _orig(scene, o, d, t, jnp.clip(prim, -1, 0), origin_eps)

    S.compute_hits = stub

from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.render.engine import WavefrontRenderer

cfg = RenderConfig(width=800, height=600, samples_per_frame=32,
                   total_samples=64, max_depth=4,
                   nee_schedule=((1, 1.0),) * 4,
                   tree_width=4, max_leaf_size=32,
                   sample_order="tiles32s", rng_granule=1024,
                   rr_start_depth=2,
                   traversal="dfs", traversal_secondary="dfs",
                   traversal_rr="pallas")
r = WavefrontRenderer(cfg, camera_mode="collada")
r.load_scene("/root/reference/media/pathtracer/advanced/CBbunny.dae")
while r.image_samples < 64:
    r.render()
r._reset_accumulation()
for rep in range(3):
    r.render()
    ts = {k: v for k, v in r.stage_times.items() if k.startswith("depth")}
    print(f"{variant} rep{rep}: " + " ".join(
        f"{k}={v*1e3:.0f}ms" for k, v in sorted(ts.items()))
        + f" frame={r.stage_times['frame']:.2f}s", flush=True)

"""Per-depth wall time of the fused engine at the bench operating
point, seeded vs unseeded (CRT_TIME_DEPTHS instrumentation)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["CRT_TIME_DEPTHS"] = "1"
from cuda_raytracer_tpu.config import RenderConfig
from cuda_raytracer_tpu.render.engine import WavefrontRenderer

variant = sys.argv[1] if len(sys.argv) > 1 else "seeded"
kw = {"seeded": {}, "noseed": {"seed_k": 0},
      "sec": {"seed_primary": False}}[variant]
cfg = RenderConfig(width=800, height=600, samples_per_frame=32,
                   total_samples=64, max_depth=4,
                   nee_schedule=((1,1.0),)*4, sample_order="tiles8",
                   rr_start_depth=2, tree_width=4, max_leaf_size=32,
                   traversal="dfs", traversal_secondary="pallas", **kw)
r = WavefrontRenderer(cfg, camera_mode="collada")
r.load_scene("/root/reference/media/pathtracer/advanced/CBbunny.dae")
r.render()  # compile + warm
for rep in range(3):
    r.render()
    ts = {k: v for k, v in r.stage_times.items() if k.startswith("depth")}
    tot = r.stage_times.get("frame")
    print(f"{variant} rep{rep}: " + " ".join(
        f"{k}={v*1e3:.0f}ms" for k, v in sorted(ts.items()))
        + f" frame={tot:.2f}s", flush=True)

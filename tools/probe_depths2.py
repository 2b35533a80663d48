"""Per-depth wall time of the fused engine at the CURRENT bench
defaults (shared-u tiles32s, folded dirs, DFS secondary, compacted
wavefront2 on RR depths) — r3 late-round profile."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["CRT_TIME_DEPTHS"] = "1"
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
    r.render()  # compile + warm the full accumulation cycle
r._reset_accumulation()
for rep in range(3):
    r.render()
    ts = {k: v for k, v in r.stage_times.items() if k.startswith("depth")}
    tot = r.stage_times.get("frame")
    print(f"rep{rep}: " + " ".join(
        f"{k}={v*1e3:.0f}ms" for k, v in sorted(ts.items()))
        + f" frame={tot:.2f}s", flush=True)

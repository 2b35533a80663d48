"""Hyperparameter sweep harness (VERDICT round-1 item 7; echoes the
reference's published tree-width / rays-per-block sweeps,
/root/reference/README.md:35-37, knobs src/cudaRenderer.h:58-83).

Sweeps tree shape x traversal backend x sample order over one scene,
timing a full accumulation at a reduced spp, and emits a JSON-lines
log plus a markdown table.

    python tools/sweep.py [--scene PATH] [--spp 16] [--out sweep.md]
    python tools/sweep.py --grid small     # quick 3-config smoke
"""

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENE = "/root/reference/media/pathtracer/advanced/CBbunny.dae"


def run_config(scene_path, width, height, spp_frame, total_spp, tw, ml,
               traversal, sample_order):
    import jax
    from cuda_raytracer_tpu.config import RenderConfig
    from cuda_raytracer_tpu.render.engine import WavefrontRenderer

    cfg = RenderConfig(
        width=width, height=height, samples_per_frame=spp_frame,
        total_samples=total_spp, max_depth=4,
        nee_schedule=((1, 1.0),) * 4, tree_width=tw, max_leaf_size=ml,
        traversal=traversal, sample_order=sample_order,
        rr_start_depth=2,
    )
    r = WavefrontRenderer(cfg, camera_mode="collada")
    r.load_scene(scene_path)
    r.render()  # compile
    r._reset_accumulation()
    t0 = time.perf_counter()
    frames = 0
    while r.image_samples < total_spp:
        r.render()
        frames += 1
    import jax.numpy as jnp

    float(jnp.sum(r._final_image))  # true sync
    dt = time.perf_counter() - t0
    rays = r.mrays_per_frame * 1e6 * frames
    return {
        "tree_width": tw, "max_leaf": ml, "traversal": traversal,
        "sample_order": sample_order, "spp_frame": spp_frame,
        "wall_s": round(dt, 3), "mrays_s": round(rays / dt / 1e6, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=SCENE)
    ap.add_argument("--size", default="800x600")
    ap.add_argument("--spp", type=int, default=16,
                    help="total spp per config")
    ap.add_argument("--grid", default="full", choices=["full", "small"])
    ap.add_argument("--out", default="/tmp/sweep.md")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))

    if args.grid == "small":
        configs = [
            (4, 32, "dfs", "tiles8"),
            (8, 16, "dfs", "tiles8"),
            (4, 32, "dfs", "raster"),
        ]
    else:
        configs = [
            (tw, ml, tr, so)
            for (tw, ml), tr, so in itertools.product(
                [(4, 32), (4, 16), (8, 16), (8, 32), (16, 16)],
                ["dfs", "pallas"],
                ["tiles8", "raster"],
            )
        ]

    spp_frame = min(16, args.spp)
    rows = []
    for tw, ml, tr, so in configs:
        try:
            row = run_config(args.scene, w, h, spp_frame, args.spp,
                             tw, ml, tr, so)
        except Exception as e:  # record failures, keep sweeping
            row = {
                "tree_width": tw, "max_leaf": ml, "traversal": tr,
                "sample_order": so, "error": str(e)[:200],
            }
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        f.write("| W | leaf | traversal | order | wall s | Mrays/s |\n")
        f.write("|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(
                f"| {r['tree_width']} | {r['max_leaf']} | "
                f"{r['traversal']} | {r['sample_order']} | "
                f"{r.get('wall_s', '-')} | "
                f"{r.get('mrays_s', r.get('error', '-'))} |\n"
            )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

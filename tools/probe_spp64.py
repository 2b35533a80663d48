"""Identify which per-frame executable blows HBM at spp=64 single-frame
(VERDICT r4 weak 3 / task 4).  AOT-lowers raygen / each depth / film at
the bench operating point with samples_per_frame=64 and prints each
program's memory analysis instead of letting the first failure mask
the rest.

Usage: python tools/probe_spp64.py [--spp 64]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SCENE = "/root/reference/media/pathtracer/advanced/CBbunny.dae"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=64)
    args = ap.parse_args()

    os.environ["BENCH_SPP"] = str(args.spp)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    cfg = bench.bench_config()

    from cuda_raytracer_tpu.render.engine import WavefrontRenderer

    r = WavefrontRenderer(cfg, camera_mode="collada")
    r.load_scene(SCENE)
    r.setup()

    cam = r._camera_arrays()
    key = jax.random.PRNGKey(0)

    def report(name, lowered):
        try:
            compiled = lowered.compile()
            ma = compiled.memory_analysis()
            peak = getattr(ma, "temp_size_in_bytes", None)
            print(f"{name:10s}: OK  temp={peak/2**30 if peak else -1:.2f}G "
                  f"args={ma.argument_size_in_bytes/2**30:.2f}G "
                  f"out={ma.output_size_in_bytes/2**30:.2f}G",
                  flush=True)
            return compiled
        except Exception as e:
            msg = str(e)
            cut = msg.find("Largest program allocations")
            print(f"{name:10s}: FAIL {msg[:200]}", flush=True)
            if cut >= 0:
                print(msg[cut:cut + 600], flush=True)
            return None

    lowered = r._raygen_frame_jit.lower(cam, key)
    report("raygen", lowered)
    carry_aval = jax.eval_shape(r._raygen_frame_jit, cam, key)
    for i, dj in enumerate(r._depth_jits):
        l = dj.lower(r.scene, carry_aval, key)
        out_aval = jax.eval_shape(dj, r.scene, carry_aval, key)
        report(f"depth{i}", l)
        carry_aval = out_aval
    light_aval = carry_aval[4]
    final = jax.ShapeDtypeStruct((cfg.height, cfg.width, 3), jnp.float32)
    report("film", r._film_jit.lower(light_aval, final, jnp.int32(0),
                                     False))


if __name__ == "__main__":
    main()

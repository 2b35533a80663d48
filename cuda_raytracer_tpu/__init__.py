"""cuda_raytracer_tpu — a TPU-native wavefront path-tracing framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the
reference CUDA wavefront path tracer (saipraveenb25/cuda-raytracer, a
Scotty3D fork).  The compute path (ray generation, wide-BVH
breadth-first traversal with deterministic scan compaction, triangle /
sphere intersection, segmented-min closest-hit resolution, NEE + BSDF
shading, film accumulation and median-filter denoise) is expressed as
jit-compiled JAX programs and Pallas TPU kernels; the host side (COLLADA
scene I/O, scene graph, SAH BVH build and wide-tree flattening) runs in
numpy / native code.

Layout:
  scene/     COLLADA I/O, halfedge + dynamic/static scene graph, camera, BSDFs
  accel/     SAH BVH builder + wide-tree compaction/flattening (host)
  ops/       device ops: intersection, traversal, compaction, shading, filters
  render/    flat device scene, ray buffers, the wavefront engine, CPU oracle
  parallel/  multi-chip sharding (mesh construction, sharded render steps)
  models/    procedural scene "model zoo" used by tests and benches
  utils/     timing, image I/O, logging
  apps/      CLI renderer and preview loops
"""

__version__ = "0.1.0"

"""The one bounce loop.

The reference's frame schedule (renderFrame, src/cudaRenderer.cu:
2460-2558: closest-hit traversal -> per-depth NEE shadow passes ->
BSDF scatter -> next traversal) exists in exactly one place here and is
shared by the single-chip engine (render/engine.py), the sample-sharded
multi-chip path, and the tile-sharded multi-chip path
(parallel/shard.py) — so the three can't drift.

``run_bounce_loop`` takes a mapping of stage callables; the engine
passes per-stage ``jax.jit`` executables (one compiled trace reused by
all traversals of a frame), the sharded paths pass the plain functions
(the whole per-chip frame is one jit under shard_map).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..ops import shade as S
from ..ops.traverse import trace_closest
from ..render.flatscene import FlatScene


from .backends import make_trace_fn  # noqa: E402 — see backends.py


def make_stage_fns(cfg: RenderConfig):
    """The per-frame stage functions (pure; jit them or not)."""
    trace = make_trace_fn(cfg)
    same_secondary = (
        (cfg.traversal_secondary in ("", cfg.traversal))
        and not cfg.packet_size_secondary
    )
    trace_secondary = trace if same_secondary else make_trace_fn(
        cfg, secondary=True
    )
    trace_secondary_compact = make_trace_fn(
        cfg, secondary=True, compact=True
    ) if cfg.compact_secondary else trace_secondary

    def draw_u2(key, n):
        """[n, 2] uniforms for a secondary sampling decision.  With
        rng_granule > 1 the draw is shared by every ray slot in a
        granule (one draw per traversal packet under the tiles32s
        layout — packets leaving a flat surface then share an exact
        direction, making secondary passes coherent by construction;
        see cfg.rng_granule).  Per-pixel stratification is preserved:
        a pixel's spp samples sit in spp different granules."""
        g = cfg.rng_granule
        if g > 1 and n % g == 0:
            u = jax.random.uniform(key, (n // g, 2), dtype=jnp.float32)
            return jnp.repeat(u, g, axis=0)
        if g > 1:
            # the fallback is correct but silently loses the shared-u
            # packet coherence the bench relies on (VERDICT r3 weak 7:
            # e.g. tile-sharded multi-chip changing per-chip n) — warn
            # once per trace so the degradation is visible
            import warnings

            warnings.warn(
                f"rng_granule={g} does not divide the {n}-lane "
                f"population; falling back to per-ray draws (packet "
                f"coherence lost)",
                stacklevel=2,
            )
        return jax.random.uniform(key, (n, 2), dtype=jnp.float32)

    def shade_hit(scene, o, d, t, prim, valid, importance, light,
                  count_emission):
        hit = S.compute_hits(scene, o, d, t, prim, cfg.origin_eps)
        if not cfg.reference_compat:
            light = light + S.emission_at_hits(
                scene, hit, importance, count_emission
            )
            if scene.has_env:
                # escaped counted paths pick up the environment
                miss = valid & (prim < 0)
                light = light + S.env_miss_radiance(
                    scene, d, importance, miss, count_emission
                )
        return hit, light

    def nee_prep(scene, hit, importance, key, li, weight):
        u = draw_u2(key, hit.t.shape[0])
        return S.nee_shadow_rays(
            scene, hit, importance, li, u, weight,
            compat_two_sided=cfg.reference_compat,
        )

    def nee_accum(light, t_s, prim_s, max_t, li_imp, ok):
        passes = t_s > max_t - cfg.shadow_eps
        if cfg.reference_compat:
            passes = passes & (prim_s >= 0)
        return light + jnp.where((ok & passes)[:, None], li_imp, 0.0)

    def scatter(scene, hit, importance, key):
        u = w = None
        if cfg.rng_granule > 1:
            u = draw_u2(jax.random.fold_in(key, 17), hit.t.shape[0])
            if cfg.rng_fold_dirs and cfg.hemisphere_sampling == "uniform":
                # antithetic fold (see S.scatter w_shared): one uniform
                # SPHERE direction per granule; each lane folds it into
                # its own hemisphere, so a packet emits at most two
                # (antipodal) directions even across curved geometry
                u, w = None, S._spherical_sample(u)
        return S.scatter(scene, hit, importance, key,
                         cfg.origin_eps, cfg.hemisphere_sampling,
                         u=u, w_shared=w)

    return {
        "trace": trace,
        "trace_secondary": trace_secondary,
        "trace_secondary_compact": trace_secondary_compact,
        "trace_rr_dense": make_trace_fn(cfg, secondary=True,
                                        rr_dense=True),
        "shade_hit": shade_hit,
        "nee_prep": nee_prep,
        "nee_accum": nee_accum,
        "scatter": scatter,
    }


def _secondary_sort_key(o, d, valid):
    """u32 sort key for secondary rays: dead rays last, live rays by
    direction octant then Morton cell of the origin.  Unused in the
    frame loop for now: on TPU v5e an XLA argsort of 7.7M keys costs
    0.5 s and each [N,3] gather 150 ms, which outweighs the ~30%
    packet-union shrink it buys.  Kept for a future in-kernel
    (DMA-based) reorder."""
    lo = jnp.min(jnp.where(valid[:, None], o, 1e30), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], o, -1e30), axis=0)
    q = jnp.clip(
        ((o - lo) / jnp.maximum(hi - lo, 1e-6) * 32).astype(jnp.int32),
        0, 31,
    )
    morton = jnp.zeros(o.shape[0], jnp.int32)
    for b in range(5):
        for a in range(3):
            morton = morton | (
                ((q[:, a] >> b) & 1) << (3 * b + a)
            )
    octant = (
        (d[:, 0] > 0).astype(jnp.int32) * 4
        + (d[:, 1] > 0).astype(jnp.int32) * 2
        + (d[:, 2] > 0).astype(jnp.int32)
    )
    key = octant * (1 << 15) + morton
    return jnp.where(valid, key, 1 << 24)


def run_bounce_loop(J, cfg: RenderConfig, scene: FlatScene, o, d, key,
                    valid=None):
    """Trace and shade the given camera/primary rays through the full
    depth/NEE schedule.  Returns (light [N, 3], dropped).

    J is a stage mapping from make_stage_fns (optionally per-stage
    jitted).  NEE RNG streams are derived by nested fold_in over
    (depth, sample, light) so they never alias regardless of the light
    count or NEE sample count.

    """
    n = o.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    importance = jnp.ones((n, 3), dtype=jnp.float32)
    light = jnp.zeros((n, 3), dtype=jnp.float32)
    count_emission = jnp.ones((n,), dtype=bool)
    dropped = jnp.int32(0)

    carry = (o, d, valid, importance, light, count_emission, dropped)
    for depth in range(cfg.max_depth):
        carry = run_depth(J, cfg, scene, carry, key, depth)
    return carry[4], carry[6]


def run_depth(J, cfg: RenderConfig, scene: FlatScene, carry, key, depth):
    """One depth of the bounce loop: closest-hit trace, emission, NEE
    shadow passes, and (below max depth) BSDF scatter + optional
    Russian roulette.  ``carry`` is (o, d, valid, importance, light,
    count_emission, dropped).  Separated out so the engine can compile
    one executable per depth — a whole-frame program is long enough
    that XLA's rematerializer spills 40x-padded [N,3] copies."""
    (o, d, valid, importance, light, count_emission, dropped) = carry
    schedule = list(cfg.nee_schedule)
    # depth 0 traces camera rays and camera-hit shadow rays (coherent);
    # every depth>0 pass traces scattered rays (incoherent) and may use
    # a different backend / packet size (cfg.traversal_secondary).
    # Past rr_start_depth the population is RR-thinned (25%/11% live at
    # depths 2/3), where the live-lane compaction sweep pays for itself
    if depth == 0:
        tr = J["trace"]
    elif cfg.rr_start_depth and depth >= cfg.rr_start_depth:
        tr = J.get(
            "trace_secondary_compact",
            J.get("trace_secondary", J["trace"]),
        )
    else:
        tr = J.get("trace_secondary", J["trace"])
    res = tr(scene, o, d, valid)
    dropped = dropped + res.dropped
    hit, light = J["shade_hit"](
        scene, o, d, res.t, res.prim, valid, importance, light,
        count_emission,
    )
    num_nee, weight = (
        schedule[depth] if depth < len(schedule) else (0, 0.0)
    )
    k_d = jax.random.fold_in(key, 1000 + depth)
    for s in range(num_nee):
        k_s = jax.random.fold_in(k_d, s)
        for li in range(scene.num_lights):
            k_u = jax.random.fold_in(k_s, li)
            o_s, d_s, max_t, li_imp, ok = J["nee_prep"](
                scene, hit, importance, k_u, li, float(weight)
            )
            res_s = tr(scene, o_s, d_s, ok, max_t)
            dropped = dropped + res_s.dropped
            light = J["nee_accum"](
                light, res_s.t, res_s.prim, max_t, li_imp, ok
            )
    if depth + 1 < cfg.max_depth:
        k_b = jax.random.fold_in(key, 2000 + depth)
        o, d, importance, valid, count_emission = J["scatter"](
            scene, hit, importance, k_b
        )
        if cfg.rr_start_depth and depth + 1 >= cfg.rr_start_depth:
            # Russian roulette: survive with p = max(importance),
            # reweight by 1/p (unbiased); dead lanes stop widening
            # the traversal packet unions
            p = jnp.clip(jnp.max(importance, axis=-1), 0.05, 1.0)
            u_rr = jax.random.uniform(
                jax.random.fold_in(key, 3000 + depth), p.shape
            )
            survive = u_rr < p
            valid = valid & survive
            importance = importance / p[:, None]
    return (o, d, valid, importance, light, count_emission, dropped)


# ---------------------------------------------------------------------------
# whole-depth compaction (cfg.compact_depths — VERDICT r3 task 2)
#
# At RR-thinned depths the traversal was already compacted (partition +
# dynamically-bounded wavefront sweeps), but compute_hits / NEE / BSDF
# scatter still ran full-size XLA sweeps over 75-89% dead lanes —
# measured 0.6-0.8 s of the 2.57 s bench frame.  XLA cannot bound a
# sweep by a device scalar, so the engine closes the loop through the
# HOST: partition the whole per-lane path state, read back the live
# count (4 bytes), round it up to a capacity bucket, and dispatch a
# depth executable compiled for that static capacity.  Liveness per
# depth is stable across frames, so after warmup this is one cached
# executable per RR depth.  The reference's analog is compaction-not-
# masking (src/exclusiveScan.cu_inl:73-110) — here extended from the
# traversal queues to the entire shading pipeline.
# ---------------------------------------------------------------------------

#: per-lane path-state payload rows (liveness in row 7, the partition
#: kernel's convention; ray ids ride as biased int32 bit patterns —
#: wavefront2.rid_encode — so they survive selects/rolls/DMA exactly
#: and can never be flushed as denormals)
STATE_ROWS = 16


def pack_state(o, d, valid, importance, count_emission, ray_id):
    """Pack per-lane path state into a [16, N'] payload for
    ops/pallas/partition.compact_live_payload (N' = N padded to the
    1024-lane partition block).  Rows: o.xyz, d.xyz, ray id
    (rid_encode bit pattern — moves through the partition's
    selects/rolls untouched), live flag, importance.xyz,
    count_emission, 4 pad rows."""
    n = o.shape[0]
    from ..ops.pallas.wavefront2 import rid_encode

    idf = rid_encode(ray_id)
    rows = jnp.stack(
        [
            o[:, 0], o[:, 1], o[:, 2],
            d[:, 0], d[:, 1], d[:, 2],
            idf,
            jnp.where(valid, 1.0, -1.0),
            importance[:, 0], importance[:, 1], importance[:, 2],
            count_emission.astype(jnp.float32),
        ],
        axis=0,
    ).astype(jnp.float32)
    pad_rows = jnp.zeros((STATE_ROWS - rows.shape[0], n), jnp.float32)
    payload = jnp.concatenate([rows, pad_rows], axis=0)
    npad = (-n) % 1024
    if npad:
        tailcols = jnp.zeros((STATE_ROWS, npad), jnp.float32)
        tailcols = tailcols.at[7, :].set(-1.0)
        payload = jnp.concatenate([payload, tailcols], axis=1)
    return payload


def unpack_state(packed, n_live):
    """Inverse of pack_state over a live prefix: lanes at or past
    n_live are dead (the partition marks row 7, but bucket slack past
    the last written chunk is unwritten garbage — the lane bound
    handles it)."""
    from ..ops.pallas.wavefront2 import rid_decode

    m = packed.shape[1]
    lane = jnp.arange(m, dtype=jnp.int32)
    alive = (lane < n_live) & (packed[7] >= 0.0)
    o = packed[0:3].T
    d = packed[3:6].T
    ids = rid_decode(packed[6])
    imp = packed[8:11].T
    ce = packed[11] > 0.5
    return o, d, alive, imp, ce, ids


def run_depth_compacted(J, cfg: RenderConfig, scene: FlatScene,
                        packed, n_live, light, key, depth, m):
    """One RR depth over the compacted live prefix packed[:, :m]
    (m >= n_live, static).  Radiance earned this depth scatters back
    into the full-size ``light`` by ray id — stable compaction keeps
    ids sorted and they are unique, so the scatter takes XLA's fast
    path.  Returns (packed' [16, m], light', dropped)."""
    sl = packed[:, :m]
    o, d, alive, importance, ce, ids = unpack_state(sl, n_live)
    # rr_dense = wavefront2 without its internal partition; measured a
    # tie with the internally-partitioning variant on the compacted
    # prefix (BENCHNOTES r4 wf2c row), so keep the simpler one
    tr = J["trace_rr_dense"]
    res = tr(scene, o, d, alive)
    dropped = res.dropped
    light_m = jnp.zeros((m, 3), jnp.float32)
    hit, light_m = J["shade_hit"](
        scene, o, d, res.t, res.prim, alive, importance, light_m, ce
    )
    schedule = list(cfg.nee_schedule)
    num_nee, weight = (
        schedule[depth] if depth < len(schedule) else (0, 0.0)
    )
    k_d = jax.random.fold_in(key, 1000 + depth)
    for s in range(num_nee):
        k_s = jax.random.fold_in(k_d, s)
        for li in range(scene.num_lights):
            k_u = jax.random.fold_in(k_s, li)
            o_s, d_s, max_t, li_imp, ok = J["nee_prep"](
                scene, hit, importance, k_u, li, float(weight)
            )
            res_s = tr(scene, o_s, d_s, ok, max_t)
            dropped = dropped + res_s.dropped
            light_m = J["nee_accum"](
                light_m, res_s.t, res_s.prim, max_t, li_imp, ok
            )
    if depth + 1 < cfg.max_depth:
        k_b = jax.random.fold_in(key, 2000 + depth)
        o, d, importance, valid, ce = J["scatter"](
            scene, hit, importance, k_b
        )
        valid = valid & alive
        if cfg.rr_start_depth and depth + 1 >= cfg.rr_start_depth:
            p = jnp.clip(jnp.max(importance, axis=-1), 0.05, 1.0)
            u_rr = jax.random.uniform(
                jax.random.fold_in(key, 3000 + depth), p.shape
            )
            valid = valid & (u_rr < p)
            importance = importance / p[:, None]
        packed_new = pack_state(o, d, valid, importance, ce, ids)
    else:
        packed_new = sl
    # dead lanes scatter out of bounds and drop; live ids are unique
    # and (stable compaction) sorted, so XLA takes its fast scatter path
    n_full = light.shape[0]
    ids_safe = jnp.where(alive, ids, n_full)
    light = light.at[ids_safe].add(
        jnp.where(alive[:, None], light_m, 0.0),
        indices_are_sorted=True,
        unique_indices=True,
        mode="drop",
    )
    return packed_new, light, dropped

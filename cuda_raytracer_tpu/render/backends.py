"""Traversal-backend factory for the bounce loop.

Lives in its own module (not render/bounce.py) deliberately: the axon
remote-compile path in this environment deterministically produced a
faulting executable (INVALID_ARGUMENT on the 2nd invocation of any
per-depth program) when the seeded trace closure was defined in
bounce.py, while byte-equivalent programs built from a closure defined
in any other module compile and run correctly — see BENCHNOTES.md
(axon quirks).  The lowered HLO is identical either way; only the
embedded closure metadata differs.  Keep the factory here.
"""

from __future__ import annotations

import jax

from ..config import RenderConfig
from ..ops.seeds import seed_hits
from ..ops.pallas.packet_dfs import trace_closest_packets
from ..ops.pallas.wavefront2 import trace_closest_wavefront
from ..ops.pallas import partition as _partition  # noqa: F401 — pre-import:
# partition must import AFTER wavefront2 (circular) but BEFORE any jit
# trace reaches wavefront2's in-function import (see docstring below)
from ..ops.traverse import trace_closest


def make_trace_fn(cfg: RenderConfig, secondary: bool = False,
                  compact: bool = False, rr_dense: bool = False):
    """Traversal backend selected by cfg.traversal (or, for bounce and
    depth>0 shadow passes, cfg.traversal_secondary when set):

    * ``dfs``     — packet-DFS Pallas kernel (fastest on coherent
      passes; the default on TPU)
    * ``pallas``  — fused segment-major Pallas kernels (wavefront2;
      coherence-insensitive — wins on incoherent secondary passes)
    * ``xla``     — pure-XLA scan traversal
    * ``auto``    — dfs on TPU, xla elsewhere

    All backend modules are imported at module top DELIBERATELY: a
    lazy import inside the traced closure made the first import of
    ops.seeds happen during jit tracing, so its module-level jnp
    constants were created inside the trace context and the compiled
    executable referenced constant buffers that died after the first
    invocation — every 2nd call then failed with INVALID_ARGUMENT on
    the axon runtime.  Keep imports out of traced code.
    """
    if compact or rr_dense:
        # RR-thinned depths get their own backend choice: compacted
        # wavefront2 beats packet-DFS there even when shared-u
        # sampling has made the live lanes coherent (the partition
        # packs them densely; tools/probe_shared_u2.py).  rr_dense is
        # the whole-depth-compaction variant (cfg.compact_depths):
        # the POPULATION arrives pre-compacted, so the wavefront runs
        # plain (no internal partition) over the dense live prefix.
        kind = (cfg.traversal_rr or cfg.traversal_secondary
                or cfg.traversal)
    elif secondary:
        kind = cfg.traversal_secondary or cfg.traversal
    else:
        kind = cfg.traversal
    auto = kind == "auto"
    if auto:
        kind = "dfs" if jax.default_backend() == "tpu" else "xla"

    def seeds_for(scene, o, d, valid, backend="pallas"):
        """Conservative per-ray upper bounds from the K largest prims
        (ops/seeds.py) — pruning + merge-shrinking for the wavefront
        backend; (None, None) when disabled or the scene has no seed
        rows.  Compacted (RR-thinned) passes skip seeding: the dense
        sweep runs over the FULL ray population while the savings
        scale with the live fraction — measured a net loss at
        0.11-0.26 live (tools/ab_interleave.py seedcompact rows).
        The packet-DFS backend skips seeding entirely unless
        cfg.seed_primary forces it: its packets carry evolving
        per-lane bounds that tighten on the first wall hit, so the
        96 ms sweep buys nothing (measured losses on primary, on
        shadow-d0 — tools/probe_shadow0.py — and on shared-u
        secondary passes)."""
        use = (cfg.seed_k and scene.seed_rows is not None
               and not compact and not rr_dense)
        if use and backend == "dfs" and not cfg.seed_primary:
            use = False
        if use and not secondary and not cfg.seed_primary:
            use = False
        if use:
            sd = seed_hits(scene, o, d, valid, k=cfg.seed_k)
            return sd.t, sd.prim
        return None, None

    if kind == "dfs":
        psize = (cfg.packet_size_secondary or cfg.packet_size) \
            if secondary else cfg.packet_size

        fallback = None

        def trace_dfs(scene, o, d, valid, t_limit=None):
            tl = None if cfg.reference_compat else t_limit
            if auto and scene.bvh.width > 8:
                # trees wider than one 8-row node block: route to the
                # queue-based backend instead of erroring (static per
                # scene shape — one trace each)
                nonlocal fallback
                if fallback is None:
                    fallback = make_trace_fn(
                        cfg.replace(
                            traversal="pallas", traversal_secondary=""
                        ),
                        secondary=secondary,
                    )
                return fallback(scene, o, d, valid, t_limit)
            st, sp = seeds_for(scene, o, d, valid, backend="dfs")
            # large scenes: tables stay HBM-resident (auto inside);
            # explicit traversal='dfs' keeps the same behavior
            return trace_closest_packets(
                scene, o, d, valid, tl, kill_eps=cfg.shadow_eps,
                packet_size=psize, slab_bf16=cfg.slab_bf16,
                seed_t=st, seed_prim=sp,
            )

        trace = trace_dfs

    elif kind == "pallas":
        # the partition sweep costs ~40 ns per live lane, so compaction
        # only pays on RR-thinned populations — the caller passes
        # compact=True for depths past rr_start_depth.  rr_dense
        # populations are pre-compacted, so no internal partition.
        do_compact = compact and cfg.compact_secondary and not rr_dense

        def trace_wf2(scene, o, d, valid, t_limit=None):
            # reference-compat shadow semantics need hits beyond maxT,
            # so only prune/kill by t_limit in the default mode
            tl = None if cfg.reference_compat else t_limit
            st, sp = seeds_for(scene, o, d, valid)
            return trace_closest_wavefront(
                scene, o, d, valid, tl, cfg.queue_multiplier,
                kill_eps=cfg.shadow_eps, compact=do_compact,
                box_bf16=cfg.slab_bf16,
                # shadow passes only consume the t > maxT - eps
                # comparison (nee_accum), so skip the prim merge —
                # 1 linear scatter pass instead of 3
                want_prim=tl is None,
                seed_t=st, seed_prim=sp,
            )

        trace = trace_wf2

    elif kind == "xla":

        def trace(scene, o, d, valid, t_limit=None):
            return trace_closest(scene, o, d, valid, cfg.queue_multiplier)

    else:
        raise ValueError(f"unknown traversal backend {cfg.traversal!r}")

    return trace



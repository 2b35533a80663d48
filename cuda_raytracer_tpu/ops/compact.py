"""Deterministic stream compaction (scan + scatter).

The TPU replacement for the reference's shared-memory exclusive scan +
atomicAdd queue-slot grabbing (src/exclusiveScan.cu_inl:73-110 and the
scatter at src/cudaRenderer.cu:1025-1057): a single exclusive cumsum
over the keep-mask assigns every surviving element a unique output slot,
and a scatter writes it there.  No atomics, bit-for-bit deterministic,
and the natural fit for XLA's fused scan/scatter lowering.

Overflow policy: elements whose assigned slot exceeds the static
capacity are dropped (and counted) — the analog of the reference's
fixed ``queueSize = numRays*TREE_WIDTH*4`` sizing rule
(src/cudaRenderer.cu:1919-1920), made observable instead of UB.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def compact(
    mask: jnp.ndarray,
    arrays: Sequence[jnp.ndarray],
    capacity: int,
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray, jnp.ndarray]:
    """Scatter ``arrays[i][mask]`` to the front of fresh buffers.

    Parameters
    ----------
    mask : [M] bool keep-mask.
    arrays : sequence of [M, ...] arrays to compact together.
    capacity : static output length.

    Returns
    -------
    (outs, count, dropped): outs[i] is [capacity, ...] with the kept
    elements in order (tail untouched/zero); count is the number of
    valid leading elements (<= capacity); dropped counts overflowed
    elements.
    """
    mask = mask.astype(jnp.int32)
    pos = jnp.cumsum(mask) - mask  # exclusive scan
    total = pos[-1] + mask[-1] if mask.shape[0] else jnp.int32(0)
    keep = (mask > 0) & (pos < capacity)
    # dump dropped/invalid elements into the scratch slot `capacity`
    idx = jnp.where(keep, pos, capacity)
    outs = []
    for a in arrays:
        buf = jnp.zeros((capacity + 1,) + a.shape[1:], dtype=a.dtype)
        outs.append(buf.at[idx].set(a, mode="drop")[:capacity])
    count = jnp.minimum(total, capacity)
    dropped = total - count
    return tuple(outs), count, dropped

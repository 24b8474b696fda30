"""Segmented reductions/scans over sorted runs — kernel bedrock #2.

Together with multi-word sort (ops/sort.py) and searchsorted join
(ops/join.py) these replace every hash table and per-group loop in the
reference's kmer engine (ref: src/kmers/naif_kmer/NaifKmerizer.cc kernels,
src/kmers/kmer_parcels/). All shapes static; "number of segments" is an
upper bound and unused tail segments are zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def segment_sum(values: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_sum(values, seg_ids, num_segments=num_segments,
                               indices_are_sorted=True)


def segment_max(values: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_max(values, seg_ids, num_segments=num_segments,
                               indices_are_sorted=True)


def segment_min(values: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_min(values, seg_ids, num_segments=num_segments,
                               indices_are_sorted=True)


def _start_positions(starts: jnp.ndarray) -> jnp.ndarray:
    """For each i: index of the start of the run containing i."""
    idx = jnp.arange(starts.shape[0], dtype=jnp.int32)
    return lax.cummax(jnp.where(starts, idx, 0), axis=0)


def run_lengths(starts: jnp.ndarray) -> jnp.ndarray:
    """Given run-start flags (sorted order), return, at each run start, the
    run length (0 elsewhere). starts[0] must be True.
    """
    T = starts.shape[0]
    idx = jnp.arange(T, dtype=jnp.int32)
    # position of the next run start at-or-after i, scanning from the right
    nxt = lax.cummin(jnp.where(starts, idx, T)[::-1], axis=0)[::-1]
    next_start = jnp.concatenate([nxt[1:], jnp.full((1,), T, jnp.int32)])
    return jnp.where(starts, next_start - idx, 0).astype(jnp.int32)


def segment_cumsum(values: jnp.ndarray, starts: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative sum restarting at each run start (sorted order)."""
    total = jnp.cumsum(values)
    start_pos = _start_positions(starts)
    before = jnp.where(start_pos > 0, total[jnp.maximum(start_pos - 1, 0)],
                       jnp.zeros_like(total[0]))
    return total - before


def position_in_run(starts: jnp.ndarray) -> jnp.ndarray:
    """0-based offset of each element within its run (sorted order)."""
    idx = jnp.arange(starts.shape[0], dtype=jnp.int32)
    return idx - _start_positions(starts)

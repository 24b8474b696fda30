"""Multi-word lexicographic sort-by-key — the framework's workhorse.

Replaces the reference's OpenMP `ParallelSort`/`SortSync` (ref:
src/ParallelVecUtilities.h) — the engine behind kmer counting, pathing and
link accumulation — with XLA's `lax.sort` over multiple uint32 key operands
(lexicographic) carrying arbitrary payload operands. K=96 keys are 6 uint32
words; sortedness then equals base-lexicographic order (see kmer/bits.py).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def sort_by_words(key_words: Sequence[jnp.ndarray], payloads: Sequence[jnp.ndarray] = ()):
    """Sort flat arrays lexicographically by uint32 key words.

    Returns (sorted_key_words, sorted_payloads)."""
    W = len(key_words)
    operands = list(key_words) + list(payloads)
    out = lax.sort(operands, num_keys=W, dimension=0, is_stable=True)
    if not isinstance(out, (list, tuple)):
        out = [out]
    return list(out[:W]), list(out[W:])


def run_starts(sorted_words: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """bool [T]: True at the first element of each run of equal keys."""
    first = jnp.zeros_like(sorted_words[0], dtype=bool).at[0].set(True)
    diff = jnp.zeros_like(first)
    for w in sorted_words:
        diff = diff | (w != jnp.roll(w, 1))
    return first | diff


def run_ids(starts: jnp.ndarray) -> jnp.ndarray:
    """int32 [T]: 0-based run index for each element."""
    return jnp.cumsum(starts.astype(jnp.int32)) - 1

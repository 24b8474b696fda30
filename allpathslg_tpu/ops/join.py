"""Searchsorted join over multi-word keys — kernel bedrock #3.

Every hash-map lookup in the reference (ref: src/kmers/naif_kmer/KmerMap.h
open-addressing maps; src/paths/KmerPathDatabase pathsdb queries) becomes a
vectorized branchless binary search into a sorted multi-word key table.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from jax import lax

from allpathslg_tpu.kmer import bits


def _gather_words(table_words, idx):
    return [w[idx] for w in table_words]


def searchsorted_words(table_words: Sequence[jnp.ndarray],
                       query_words: Sequence[jnp.ndarray],
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lower-bound binary search of queries in a lexicographically sorted
    multi-word table.

    Args:
      table_words: W arrays [M] uint32, sorted lexicographically.
      query_words: W arrays [Q] uint32.

    Returns:
      (idx, found): idx int32 [Q] lower-bound insertion index; found bool [Q]
      True iff table[idx] == query.
    """
    M = table_words[0].shape[0]
    Q = query_words[0].shape[0]
    lo = jnp.zeros(Q, dtype=jnp.int32)
    hi = jnp.full(Q, M, dtype=jnp.int32)
    n_iter = max(1, (M + 1).bit_length())

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1
        t = _gather_words(table_words, jnp.minimum(mid, M - 1))
        less = bits.lex_less(t, query_words)  # table[mid] < q
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
        return lo, hi

    lo, hi = lax.fori_loop(0, n_iter, body, (lo, hi))
    safe = jnp.minimum(lo, M - 1)
    at = _gather_words(table_words, safe)
    found = (lo < M) & bits.lex_eq(at, query_words)
    return lo, found


def lookup_payload(table_words, table_payload, query_words, default):
    """Join: for each query, payload of matching table row (or default)."""
    idx, found = searchsorted_words(table_words, query_words)
    safe = jnp.minimum(idx, table_words[0].shape[0] - 1)
    return jnp.where(found, table_payload[safe], default), found

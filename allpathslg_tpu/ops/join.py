"""Searchsorted join over multi-word keys — kernel bedrock #3.

Every hash-map lookup in the reference (ref: src/kmers/naif_kmer/KmerMap.h
open-addressing maps; src/paths/KmerPathDatabase pathsdb queries) becomes a
vectorized branchless binary search into a sorted multi-word key table.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import jax
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


# ---------------------------------------------------------------------------
# Hash-bucketed exact join (r5): the binary search above costs
# ~log2(M) x W random gathers per query — measured at ~100-150 M gathers/s
# on the chip, it dominates genome-scale EC (precorrect voting 25 s/batch,
# VERDICT r5 scale run). Bucketing rows by a 32-bit mixed hash (the
# align/lookup.py trick) cuts that to H_max + W + 1 gathers per query:
# direct bucket lookup, a short in-bucket hash scan sized to the MAX
# bucket occupancy (static, computed at build), then ONE exact multi-word
# verify at the matched slot. Exactness: the verify compares full key
# words, so a hash collision can only cause a missed lookup when a
# DIFFERENT key with the SAME 32-bit hash lands earlier in the same
# bucket — probability ~occupancy/2^32 ≈ 1e-10 per query.
# ---------------------------------------------------------------------------


def build_hashed(table_words, payloads=(), buckets_per_row: int = 4):
    """Host driver: hash-sort a (possibly sentinel-padded) key table and
    build the bucket directory.

    Returns (hash_fp, words_sorted, payloads_sorted, bucket_starts,
    shift, H) — hash_fp stacks the bucket hash and an INDEPENDENT second
    fingerprint (rows [2, M]): the in-bucket scan matches on both, so two
    distinct keys deflect the scan only on a ~2^-64 double collision (and
    even then the word verify turns it into a miss, never a wrong
    payload). shift and H are PYTHON ints (static jit args). Rows whose
    words are all-0xFFFFFFFF sentinels are excluded from buckets."""
    import numpy as np

    M = int(table_words[0].shape[0])
    sent_mask = bits.is_sentinel(table_words)
    h = jnp.minimum(bits.hash_words(list(table_words)),
                    jnp.uint32(0xFFFFFFFE))
    h = jnp.where(sent_mask, jnp.uint32(0xFFFFFFFF), h)
    fp = bits.hash_words(list(table_words), seed=0x51ED270)
    from allpathslg_tpu.ops import sort as ops_sort
    skeys, spay = ops_sort.sort_by_words(
        [h], [fp] + list(table_words) + list(payloads))
    hs = skeys[0]
    W = len(table_words)
    fps = spay[0]
    ws = spay[1:1 + W]
    ps = spay[1 + W:]
    n_valid = int(jnp.sum((~sent_mask).astype(jnp.int32)))
    nb_bits = max(10, min(26, int(np.ceil(np.log2(
        max(buckets_per_row * max(n_valid, 1), 2))))))
    shift = 32 - nb_bits
    NB = 1 << nb_bits
    bounds = (jnp.arange(NB, dtype=jnp.uint32) << shift)
    bucket_starts = jnp.concatenate([
        jnp.searchsorted(hs, bounds, side="left").astype(jnp.int32),
        jnp.full((1,), n_valid, jnp.int32)])
    # max bucket occupancy -> static scan depth (quantized pow2 for compile
    # stability across rounds)
    occ = bucket_starts[1:] - bucket_starts[:-1]
    H = max(1, int(jnp.max(occ)))
    H = 1 << (H - 1).bit_length()
    return jnp.stack([hs, fps]), ws, ps, bucket_starts, shift, H


def lookup_hashed(hash_fp, bucket_starts, words_sorted, query_words,
                  shift: int, H: int, payload=None, default=0):
    """Exact join against a build_hashed table.

    Returns (found bool [Q], payload-or-default [Q] when payload given,
    else row index)."""
    hash_sorted = hash_fp[0]
    fp_sorted = hash_fp[1]
    M = hash_sorted.shape[0]
    qh = jnp.minimum(bits.hash_words(list(query_words)),
                     jnp.uint32(0xFFFFFFFE))
    qfp = bits.hash_words(list(query_words), seed=0x51ED270)
    b = (qh >> shift).astype(jnp.int32)
    lo = bucket_starts[b]
    hi = bucket_starts[b + 1]
    found_at = jnp.full(qh.shape, -1, jnp.int32)
    for k in range(H):
        idx = lo + k
        ok = idx < hi
        safe_k = jnp.minimum(idx, M - 1)
        m = ok & (hash_sorted[safe_k] == qh) \
            & (fp_sorted[safe_k] == qfp) & (found_at < 0)
        found_at = jnp.where(m, idx, found_at)
    safe = jnp.clip(found_at, 0, M - 1)
    exact = found_at >= 0
    for w, q in zip(words_sorted, query_words):
        exact = exact & (w[safe] == q)
    if payload is None:
        return exact, jnp.where(exact, safe, -1)
    return exact, jnp.where(exact, payload[safe], default)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class HashedTable:
    """build_hashed output as a jit-friendly pytree: arrays are children,
    (shift, H) ride as STATIC aux data — pass a HashedTable straight into
    jitted functions and the scan depth stays compile-time."""
    hash_fp: Any            # uint32 [2, M]
    words: tuple            # W sorted-by-hash word arrays
    payloads: tuple         # payloads, hash-sorted alongside
    bucket_starts: Any      # int32 [NB + 1]
    shift: int
    H: int

    def tree_flatten(self):
        return ((self.hash_fp, self.words, self.payloads,
                 self.bucket_starts), (self.shift, self.H))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], children[3],
                   aux[0], aux[1])


def hash_table(table_words, payloads=(), buckets_per_row: int = 4
               ) -> HashedTable:
    """build_hashed packaged as a HashedTable."""
    hs, ws, ps, bs, shift, H = build_hashed(
        list(table_words), payloads=list(payloads),
        buckets_per_row=buckets_per_row)
    return HashedTable(hash_fp=hs, words=tuple(ws), payloads=tuple(ps),
                       bucket_starts=bs, shift=shift, H=H)


def member_hashed(ht: HashedTable, query_words):
    """bool [Q]: query key present in the hashed table."""
    found, _ = lookup_hashed(ht.hash_fp, ht.bucket_starts, list(ht.words),
                             list(query_words), ht.shift, ht.H)
    return found


def payload_hashed(ht: HashedTable, payload_i: int, query_words, default):
    """(payload-or-default [Q], found bool [Q]) from the i-th payload."""
    found, pay = lookup_hashed(ht.hash_fp, ht.bucket_starts, list(ht.words),
                               list(query_words), ht.shift, ht.H,
                               payload=ht.payloads[payload_i],
                               default=default)
    return pay, found

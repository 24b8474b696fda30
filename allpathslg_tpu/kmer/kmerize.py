"""K-mer extraction from read batches — vectorized sliding-window packing.

Replaces the reference's per-read kmerization loops (ref:
src/kmers/naif_kmer/NaifKmerizer.cc kmer extraction pass) with a fully
vectorized scheme: log-doubling shifted ORs build, for every position q of
every read, the uint32 packing of bases [q, q+16); k-mer words are then just
strided slices of that array. Reverse-complement windows are derived from
the SAME packed array by per-word 2-bit-group reversal + complement (an
rc word is always the group-reversed complement of some 16-base forward
window), so canonicalization is elementwise and the whole extraction is
O(N*L) fused VPU work — no gathers, no second packing pass, no reversed
slices, no data-dependent shapes.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from allpathslg_tpu.kmer import bits
from allpathslg_tpu.dtypes.reads import PAD_CODE

U32 = jnp.uint32


def _pack16_all_positions(codes_masked: jnp.ndarray) -> jnp.ndarray:
    """codes_masked: int32 [N, L+16] with values 0..3 (invalid already zeroed).
    Returns uint32 [N, L]: packed bases [q, q+16) big-endian at each q.

    Log-doubling: acc_{2s}[q] = acc_s[q] << 2s | acc_s[q+s] — 4 shifted-OR
    passes instead of 16."""
    Lp = codes_masked.shape[1]
    acc = codes_masked.astype(U32)  # bases [q, q+1)
    for s in (1, 2, 4, 8):
        hi = acc[:, : Lp - s] << U32(2 * s)
        acc = hi | acc[:, s:]
        Lp -= s
    return acc  # [N, L+1] — one extra column vs the 16-pad input


def _window_words(packed: jnp.ndarray, K: int, P: int):
    """Forward + reverse-complement window words from one packed array.

    packed: uint32 [N, >= P+K-16] (column q = bases [q, q+16)).
    fwd word w of window p  = packed[:, p + 16w] (last word masked).
    rc  word w of window p  = rev2(~packed[:, p + K - 16(w+1)]) when the
    source column exists, else (last word, K % 16 != 0) the partial form
    rev2(~packed[:, p]) << (32 - 2r) with r bases in the last word.
    """
    W = bits.n_words(K)
    lw_mask = U32(bits.last_word_mask(K))
    fwd = []
    for w in range(W):
        word = packed[:, 16 * w : 16 * w + P]
        if w == W - 1:
            word = word & lw_mask
        fwd.append(word)
    # rev2(~x) is elementwise, so compute it ONCE over the whole packed
    # array and slice per word (W slices of one pass instead of W full
    # bit-reversal passes — matters most at K=96 where W=6).
    rev2c = bits._rev2_word(~packed)
    rev = []
    for w in range(W):
        s = K - 16 * (w + 1)
        if s >= 0:
            word = rev2c[:, s : s + P]
        else:
            r = K - 16 * w  # bases in this (last) word, 1..15
            word = rev2c[:, 0:P] << U32(32 - 2 * r)
        if w == W - 1:
            word = word & lw_mask
        rev.append(word)
    return fwd, rev


def _packed_and_valid(codes: jnp.ndarray, K: int):
    N, L = codes.shape
    P = L - K + 1
    assert P >= 1, f"reads shorter than K={K}"
    invalid = codes >= PAD_CODE
    cm = jnp.where(invalid, 0, codes).astype(jnp.int32)
    packed = _pack16_all_positions(jnp.pad(cm, ((0, 0), (0, 16))))
    # validity: no invalid base in [p, p+K)
    cs = jnp.cumsum(invalid.astype(jnp.int32), axis=1)
    cs = jnp.pad(cs, ((0, 0), (1, 0)))  # cs[:, p] = # invalid in [0, p)
    valid = (cs[:, K:] - cs[:, :-K]) == 0  # [N, P]
    return packed, valid, P


def kmer_windows_fwd(codes: jnp.ndarray, K: int) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """Forward-strand (non-canonical) K-mer windows: (fwd_words, valid)."""
    packed, valid, P = _packed_and_valid(codes, K)
    W = bits.n_words(K)
    lw_mask = U32(bits.last_word_mask(K))
    fwd = []
    for w in range(W):
        word = packed[:, 16 * w : 16 * w + P]
        if w == W - 1:
            word = word & lw_mask
        fwd.append(word)
    return fwd, valid


def kmer_windows(codes: jnp.ndarray, K: int) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """All canonical K-mers of a read batch.

    Args:
      codes: uint8 [N, L] with PAD_CODE beyond read length / at Ns.
      K: kmer size (2..96+).

    Returns:
      (canon_words, valid): canon_words is a list of W uint32 [N, P] arrays
      (P = L-K+1), valid is bool [N, P] — window contains no invalid base.
    """
    packed, valid, P = _packed_and_valid(codes, K)
    fwd, rev = _window_words(packed, K, P)
    use_rc = bits.lex_less(rev, fwd)
    canon = bits.select_words(use_rc, rev, fwd)
    return canon, valid


def flatten_kmers(canon_words, valid, K: int):
    """[N, P] word arrays → flat [N*P] with sentinel keys at invalid slots."""
    flat = [w.reshape(-1) for w in canon_words]
    vmask = valid.reshape(-1)
    sent = jnp.uint32(0xFFFFFFFF)
    flat = [jnp.where(vmask, w, sent) for w in flat]
    return flat, vmask

"""K-mer extraction from read batches — vectorized sliding-window packing.

Replaces the reference's per-read kmerization loops (ref:
src/kmers/naif_kmer/NaifKmerizer.cc kmer extraction pass) with a fully
vectorized scheme: sixteen shifted ORs build, for every position q of every
read, the uint32 packing of bases [q, q+16); k-mer words are then just
strided slices of that array. Reverse-complement windows come from packing
the flipped complemented batch, so canonicalization is an elementwise
lexicographic min. O(N*L) work, no gathers, no data-dependent shapes.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from allpathslg_tpu.kmer import bits
from allpathslg_tpu.dtypes.reads import PAD_CODE

U32 = jnp.uint32


def _pack16_all_positions(codes_masked: jnp.ndarray) -> jnp.ndarray:
    """codes_masked: int32 [N, L+16] with values 0..3 (invalid already zeroed).
    Returns uint32 [N, L]: packed bases [q, q+16) big-endian at each q."""
    L = codes_masked.shape[1] - 16
    acc = jnp.zeros((codes_masked.shape[0], L), dtype=U32)
    for j in range(16):
        acc = (acc << U32(2)) | codes_masked[:, j : j + L].astype(U32)
    return acc


def kmer_windows_fwd(codes: jnp.ndarray, K: int) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """Forward-strand (non-canonical) K-mer windows: (fwd_words, valid)."""
    N, L = codes.shape
    P = L - K + 1
    assert P >= 1, f"reads shorter than K={K}"
    W = bits.n_words(K)
    invalid = codes >= PAD_CODE
    cm = jnp.where(invalid, 0, codes).astype(jnp.int32)
    packed = _pack16_all_positions(jnp.pad(cm, ((0, 0), (0, 16))))
    cs = jnp.cumsum(invalid.astype(jnp.int32), axis=1)
    cs = jnp.pad(cs, ((0, 0), (1, 0)))
    valid = (cs[:, K:] - cs[:, :-K]) == 0
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
    N, L = codes.shape
    P = L - K + 1
    assert P >= 1, f"reads shorter than K={K}"
    W = bits.n_words(K)

    invalid = codes >= PAD_CODE
    cm = jnp.where(invalid, 0, codes).astype(jnp.int32)
    cm_pad = jnp.pad(cm, ((0, 0), (0, 16)))
    packed = _pack16_all_positions(cm_pad)  # [N, L]

    # validity: no invalid base in [p, p+K)
    cs = jnp.cumsum(invalid.astype(jnp.int32), axis=1)
    cs = jnp.pad(cs, ((0, 0), (1, 0)))  # cs[:, p] = # invalid in [0, p)
    valid = (cs[:, K:] - cs[:, :-K]) == 0  # [N, P]

    lw_mask = U32(bits.last_word_mask(K))
    fwd = []
    for w in range(W):
        word = packed[:, 16 * w : 16 * w + P]
        if w == W - 1:
            word = word & lw_mask
        fwd.append(word)

    # reverse-complement windows: pack the flipped complemented batch;
    # rc-kmer at fwd position p = fwd-kmer of flipped batch at L-K-p.
    rcodes = jnp.where(invalid[:, ::-1], 0, 3 - cm[:, ::-1]).astype(jnp.int32)
    rcodes_pad = jnp.pad(rcodes, ((0, 0), (0, 16)))
    rpacked = _pack16_all_positions(rcodes_pad)
    rev = []
    for w in range(W):
        word = rpacked[:, 16 * w : 16 * w + P][:, ::-1]
        if w == W - 1:
            word = word & lw_mask
        rev.append(word)

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

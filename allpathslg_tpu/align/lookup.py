"""Seed-and-verify read-to-contig alignment producing alignlets.

Behavior contract (ref: src/lookup/ lookup_table + QueryLookupTable +
ImperfectLookup, and src/paths/AlignPairsToHyper* — SURVEY.md §2.2, §3.5):
build a kmer seed index of the contig set, find candidate placements for
each read by seed vote, verify gap-free with a mismatch count, and keep
unique placements as compact alignlets (read, contig, pos, rc, mismatches).
This is the "aligned read-pairs/s" metric path; gapped rescue goes through
the banded-DP kernel later.

TPU shape: the index is a sorted (canonical kmer → contig, pos, orient)
table over the *flat* concatenated contig bases (windows crossing contig
boundaries masked out); queries batch-join via searchsorted; votes resolve
by one sort + run-length; verification is a gather + compare.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from allpathslg_tpu.dtypes.reads import PAD_CODE
from allpathslg_tpu.kmer import bits, kmerize
from allpathslg_tpu.ops import join, sort as ops_sort, segmented


@dataclasses.dataclass
class SeedIndex:
    """Sorted canonical-kmer seed index of a contig set (host handles)."""
    K: int
    words: List[jnp.ndarray]     # W × uint32 [T] sorted
    contig: jnp.ndarray          # int32 [T]
    pos: jnp.ndarray             # int32 [T] position within contig
    is_rc: jnp.ndarray           # bool [T] canonical form is rc of contig fwd
    offsets: jnp.ndarray         # int32 [n_contigs + 1]
    contig_lens: np.ndarray      # int32 [n_contigs] (host)


@dataclasses.dataclass(frozen=True)
class AlignConfig:
    K: int = 24
    seed_stride: int = 8        # query seed every `stride` windows
    max_hits_per_seed: int = 8  # repeat guard
    max_mismatch_frac: float = 0.06
    require_unique: bool = True


def build_index(bases: np.ndarray, offsets: np.ndarray, K: int) -> SeedIndex:
    """bases: uint8 flat contig bases; offsets: int [n+1]."""
    total = int(offsets[-1])
    flat = jnp.asarray(bases, dtype=jnp.uint8).reshape(1, -1)
    off32 = jnp.asarray(np.asarray(offsets, np.int64).astype(np.int32))
    canon, valid = kmerize.kmer_windows(flat, K)
    fwd, _ = kmerize.kmer_windows_fwd(flat, K)
    P = total - K + 1
    gpos = jnp.arange(P, dtype=jnp.int32)
    contig = jnp.searchsorted(off32, gpos, side="right").astype(jnp.int32) - 1
    # window must not cross its contig's end
    end = off32[contig + 1]
    inside = (gpos + K) <= end
    valid = valid.reshape(-1) & inside
    is_rc = ~bits.lex_eq(canon, fwd)
    pos = gpos - off32[contig]

    sent = jnp.uint32(0xFFFFFFFF)
    keys = [jnp.where(valid, w.reshape(-1), sent) for w in canon]
    skeys, spay = ops_sort.sort_by_words(
        keys, [contig, pos, is_rc.reshape(-1).astype(jnp.int32)])
    n_valid = int(jnp.sum(valid.astype(jnp.int32)))
    return SeedIndex(
        K=K,
        words=[w[:n_valid] for w in skeys],
        contig=spay[0][:n_valid],
        pos=spay[1][:n_valid],
        is_rc=spay[2][:n_valid].astype(bool),
        offsets=off32,
        contig_lens=np.diff(np.asarray(offsets)).astype(np.int32),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _candidates(index_words, index_contig, index_pos, index_rc,
                codes, lengths, cfg: AlignConfig):
    """Seed lookups → candidate (contig, diag, orient) votes per read."""
    K = cfg.K
    N, L = codes.shape
    P = L - K + 1
    canon, valid = kmerize.kmer_windows(codes, K)
    fwd, _ = kmerize.kmer_windows_fwd(codes, K)
    q_rc = ~bits.lex_eq(canon, fwd)  # read window stored as rc of read-fwd

    # seeds: every stride-th window
    seed_pos = jnp.arange(0, P, cfg.seed_stride, dtype=jnp.int32)
    S = seed_pos.shape[0]
    sw = [w[:, seed_pos] for w in canon]
    sval = valid[:, seed_pos]
    sqrc = q_rc[:, seed_pos]

    flat = [w.reshape(-1) for w in sw]
    lo, found = join.searchsorted_words(index_words, flat)
    H = cfg.max_hits_per_seed
    T = index_contig.shape[0]

    # expand each seed to up to H consecutive index hits
    hit_idx = lo[:, None] + jnp.arange(H, dtype=jnp.int32)[None, :]
    ok = found[:, None] & (hit_idx < T)
    hit_clip = jnp.minimum(hit_idx, T - 1)
    same = jnp.ones_like(ok)
    for w, qw in zip(index_words, flat):
        same = same & (w[hit_clip] == qw[:, None])
    ok = ok & same
    c = index_contig[hit_clip]
    p = index_pos[hit_clip]
    t_rc = index_rc[hit_clip]

    # orientation: read-fwd maps to contig-fwd iff (q_rc == t_rc)
    qrc_f = sqrc.reshape(-1)[:, None]
    orient_rc = qrc_f ^ t_rc  # True: read maps reverse-complemented
    qpos = jnp.broadcast_to(seed_pos[None, :, None], (N, S, H)).reshape(-1, H)
    # seed-invariant anchors: fwd placements use A with read j ↔ A + j
    # (A = p - qpos); rc placements use A with read j ↔ A - j
    # (A = p + qpos + K - 1)
    diag = jnp.where(orient_rc, p + qpos + (K - 1), p - qpos)
    read_id = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[:, None, None], (N, S, H)).reshape(-1, H)
    ok = ok & sval.reshape(-1)[:, None]
    return (read_id.reshape(-1), c.reshape(-1), diag.reshape(-1),
            orient_rc.reshape(-1), ok.reshape(-1))


@functools.partial(jax.jit, static_argnames=("cfg",))
def _vote_and_verify(read_id, contig, diag, orient, ok,
                     flat_bases, offsets, codes, lengths, cfg: AlignConfig):
    """Modal placement per read, then gap-free verification."""
    N, L = codes.shape
    BIG = jnp.int32(0x7FFFFFFF)
    # sort candidate votes by (read, contig, orient, diag)
    key_r = jnp.where(ok, read_id, BIG).astype(jnp.uint32)
    key_c = jnp.where(ok, contig, 0).astype(jnp.uint32)
    key_o = jnp.where(ok, orient.astype(jnp.int32), 0).astype(jnp.uint32)
    key_d = jnp.where(ok, diag + 2 * L, 0).astype(jnp.uint32)  # bias ≥ 0
    skeys, _ = ops_sort.sort_by_words([key_r, key_c, key_o, key_d], [])
    starts = ops_sort.run_starts(skeys)
    votes = segmented.run_lengths(starts)

    # best (most-voted) placement per read: sort (read, -votes) at starts
    vkey_r = jnp.where(starts, skeys[0], jnp.uint32(0xFFFFFFFF))
    vkey_v = jnp.where(starts, jnp.uint32(1 << 20) - votes.astype(jnp.uint32), 0)
    vk, vpay = ops_sort.sort_by_words(
        [vkey_r, vkey_v],
        [skeys[1].astype(jnp.int32), skeys[2].astype(jnp.int32),
         skeys[3].astype(jnp.int32), votes])
    # first row per read = winning placement
    rstarts = ops_sort.run_starts([vk[0]])
    ridx = jnp.arange(vk[0].shape[0], dtype=jnp.int32)
    first_of_read = rstarts & (vk[0] != jnp.uint32(0xFFFFFFFF))
    second = jnp.roll(first_of_read, 1) & (vk[0] == jnp.roll(vk[0], 1))

    # scatter winners to [N]
    r = vk[0].astype(jnp.int32)
    win_contig = jnp.full(N, -1, jnp.int32)
    win_diag = jnp.full(N, 0, jnp.int32)
    win_orient = jnp.zeros(N, jnp.int32)
    win_votes = jnp.zeros(N, jnp.int32)
    run_votes = jnp.where(first_of_read, vpay[3], 0)
    rr = jnp.where(first_of_read, r, N)
    win_contig = win_contig.at[rr].set(jnp.where(first_of_read, vpay[0], -1), mode="drop")
    win_diag = win_diag.at[rr].set(vpay[2] - 2 * L, mode="drop")
    win_orient = win_orient.at[rr].set(vpay[1], mode="drop")
    win_votes = win_votes.at[rr].set(run_votes, mode="drop")
    # runner-up votes (to test uniqueness)
    rr2 = jnp.where(second, r, N)
    run2 = jnp.zeros(N, jnp.int32).at[rr2].set(jnp.where(second, vpay[3], 0),
                                               mode="drop")

    # verification: compare read to contig segment
    total = flat_bases.shape[0]
    gstart = offsets[jnp.maximum(win_contig, 0)]
    # fwd: read j ↔ flat[gstart + diag + j]
    # rc:  read j ↔ rc(flat[gstart + diag + (len-1) - j])
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    lenv = lengths[:, None]
    tpos_f = win_diag[:, None] + j
    tpos_r = win_diag[:, None] - j
    tpos = jnp.where(win_orient[:, None] == 1, tpos_r, tpos_f) + gstart[:, None]
    # clip to this contig's bounds
    cend = offsets[jnp.maximum(win_contig, 0) + 1]
    inb = (tpos >= gstart[:, None]) & (tpos < cend[:, None]) & (j < lenv)
    tb = flat_bases[jnp.clip(tpos, 0, total - 1)]
    tb = jnp.where(win_orient[:, None] == 1, 3 - tb.astype(jnp.int32),
                   tb.astype(jnp.int32))
    mm = ((codes.astype(jnp.int32) != tb) & inb & (codes < 4)).sum(1)
    n_in = (inb & (codes < 4)).sum(1)

    max_mm = (cfg.max_mismatch_frac * lengths.astype(jnp.float32)).astype(jnp.int32)
    aligned = (win_contig >= 0) & (n_in >= (lengths * 9) // 10) & (mm <= max_mm)
    if cfg.require_unique:
        aligned = aligned & (run2 * 2 < win_votes)
    return win_contig, win_diag, win_orient.astype(bool), mm, aligned


def align_reads(index: SeedIndex, codes, lengths, cfg: AlignConfig,
                flat_bases: np.ndarray):
    """Full alignment: returns host alignlet arrays
    (contig, pos, rc, mismatches, aligned)."""
    codes = jnp.asarray(codes)
    lengths = jnp.asarray(lengths)
    rid, c, d, o, ok = _candidates(index.words, index.contig, index.pos,
                                   index.is_rc, codes, lengths, cfg)
    win_c, win_d, win_o, mm, aligned = _vote_and_verify(
        rid, c, d, o, ok, jnp.asarray(flat_bases), index.offsets,
        codes, lengths, cfg)
    return (np.asarray(win_c), np.asarray(win_d), np.asarray(win_o),
            np.asarray(mm), np.asarray(aligned))

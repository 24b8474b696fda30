"""Long-read (PacBio) gap patching.

Behavior contract (ref: src/paths/LongReadPostPatcher.cc + src/paths/long/
consensus machinery (MultipleAligner, ConsensusScoreModel) — SURVEY.md §2.5
long-read extensions; Ribeiro 2012 workflow): noisy long reads that anchor
on both flanks of a scaffold gap donate their crossing segment; segments
are reconciled into a consensus patch which must agree with the insert-size
expectation; accepted patches close the gap. Final base quality comes from
the subsequent short-read polish pass.

TPU shape: flank anchoring is a 12-mer seed vote with coarse diagonal bins
(exact kmers survive ~15% error often enough); segment reconciliation picks
the medoid under batched banded-DP cost (the band absorbing indel drift);
acceptance = both flank re-alignments of the medoid within an error budget.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from allpathslg_tpu.ops import banded


@dataclasses.dataclass(frozen=True)
class LongReadConfig:
    K: int = 12
    flank: int = 500           # contig flank used for anchoring
    diag_bin: int = 64
    min_votes: int = 4
    max_err: float = 0.35      # DP cost fraction accepted vs noisy reads
    band_frac: float = 0.25    # DP band as a fraction of segment length
    max_patch: int = 20000


def _kmer_positions(seq: np.ndarray, K: int):
    """dict kmer→[positions] for a short flank (host; flanks are tiny)."""
    table = {}
    s = np.asarray(seq)
    for p in range(len(s) - K + 1):
        w = s[p : p + K]
        if (w >= 4).any():
            continue
        key = w.tobytes()
        table.setdefault(key, []).append(p)
    return table


def _rc(seq):
    out = (3 - seq[::-1].astype(np.int32)) % 4
    return np.where(seq[::-1] > 3, 4, out).astype(np.uint8)


def _anchor(read: np.ndarray, flank_table, flank_len: int,
            cfg: LongReadConfig):
    """Best (votes, diag) of read vs flank, read in given orientation.
    diag = flank position - read position."""
    votes = {}
    K = cfg.K
    for p in range(0, len(read) - K + 1):
        w = read[p : p + K]
        if (w >= 4).any():
            continue
        hits = flank_table.get(w.tobytes())
        if not hits:
            continue
        for fp in hits:
            b = (fp - p) // cfg.diag_bin
            votes[b] = votes.get(b, 0) + 1
    if not votes:
        return 0, None
    b, v = max(votes.items(), key=lambda kv: kv[1])
    return v, b * cfg.diag_bin + cfg.diag_bin // 2


def find_gap_segments(long_reads: List[np.ndarray], s1_tail: np.ndarray,
                      s2_head: np.ndarray, cfg: LongReadConfig
                      ) -> List[np.ndarray]:
    """Crossing segments: for each long read (either orientation) anchored
    on both flanks in a consistent order, the subsequence between the end
    of flank1 and the start of flank2."""
    t1 = _kmer_positions(s1_tail, cfg.K)
    t2 = _kmer_positions(s2_head, cfg.K)
    f1 = len(s1_tail)
    segs = []
    for read0 in long_reads:
        for read in (read0, _rc(read0)):
            v1, d1 = _anchor(read, t1, f1, cfg)
            v2, d2 = _anchor(read, t2, len(s2_head), cfg)
            if d1 is None or d2 is None or v1 < cfg.min_votes or v2 < cfg.min_votes:
                continue
            # read position where flank1 ends / flank2 begins
            r1_end = f1 - d1          # read coord of s1_tail's end
            r2_start = -d2            # read coord of s2_head's start
            if r2_start <= r1_end - 200 or r2_start - r1_end > cfg.max_patch:
                continue
            a = max(0, min(len(read), r1_end))
            b = max(0, min(len(read), r2_start))
            if b < a:
                a, b = b, a  # tiny overlap from binning noise
            segs.append(read[a:b])
            break
    return segs


def consensus_patch(segs: List[np.ndarray], cfg: LongReadConfig
                    ) -> Optional[np.ndarray]:
    """Medoid segment under pairwise banded-DP cost (the batched analog of
    the reference's consensus scoring; short-read polish finishes the job)."""
    segs = [s for s in segs if len(s) <= cfg.max_patch]
    if not segs:
        return None
    if len(segs) == 1:
        return segs[0]
    lens = np.array([len(s) for s in segs])
    med = float(np.median(lens))
    keep = [s for s in segs if abs(len(s) - med) <= 0.3 * max(med, 50) + 80]
    if not keep:
        keep = segs
    if len(keep) <= 2:
        return keep[int(np.argmin([abs(len(s) - med) for s in keep]))]

    n = len(keep)
    Lq = max(max(len(s) for s in keep), 8)
    band = max(16, int(cfg.band_frac * med))  # r1 floor restored (ADVICE r2:
    # do not narrow the search window just to hit the bit-parallel kernel)
    band = min(band, 192)
    B = ((n * n + 127) // 128) * 128
    q = np.full((B, Lq), 4, np.uint8)
    t = np.full((B, Lq), 4, np.uint8)
    ql = np.zeros(B, np.int32)
    tl = np.zeros(B, np.int32)
    off = np.zeros(B, np.int32)
    k = 0
    for i in range(n):
        for j in range(n):
            q[k, : len(keep[i])] = keep[i]
            t[k, : len(keep[j])] = keep[j]
            ql[k], tl[k] = len(keep[i]), len(keep[j])
            k += 1
    cost, _ = banded.banded_align_auto(jnp.asarray(q), jnp.asarray(ql),
                                  jnp.asarray(t), jnp.asarray(tl),
                                  jnp.asarray(off), band=band)
    c = np.asarray(cost)[: n * n].reshape(n, n).astype(np.float64)
    c[c >= (1 << 20)] = np.nan
    total = np.nansum(c, axis=1)
    medoid = keep[int(np.nanargmin(total))]
    # iterative consensus refinement against the stack (ref:
    # ConsensusScoreModel / MultipleAligner, src/paths/long/)
    from allpathslg_tpu.long import consensus as lcons
    refined, _ = lcons.refine_consensus(medoid, keep, [0] * len(keep))
    return refined


def close_gap_with_long_reads(s1: np.ndarray, s2: np.ndarray, gap: int,
                              dev: int, long_reads: List[np.ndarray],
                              cfg: LongReadConfig = LongReadConfig()
                              ) -> Optional[np.ndarray]:
    """Returns the merged sequence s1+patch+s2, or None."""
    tail = s1[-cfg.flank:]
    head = s2[: cfg.flank]
    segs = find_gap_segments(long_reads, tail, head, cfg)
    if not segs:
        return None
    patch = consensus_patch(segs, cfg)
    if patch is None:
        return None
    # length sanity vs gap estimate (long reads have ~±12% length noise)
    if gap > 0 and abs(len(patch) - gap) > max(4 * dev, 0.35 * gap + 120):
        return None
    return np.concatenate([s1, patch, s2])

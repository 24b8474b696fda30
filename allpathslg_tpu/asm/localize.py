"""Repeat resolution by read threading — the localization core.

Behavior contract (ref: src/paths/LocalizeReadsLG.cc + MergeNeighborhoods*,
SURVEY.md §2.5 rows 13-14 and §3.4): the reference picks seed unipaths, does
thousands of per-seed local mini-assemblies (recruit reads via placements,
walk fragment inserts across repeats, pop bubbles) and glues the local
graphs back together. The *effect* is that read and insert evidence resolves
graph junctions that pure K-mer adjacency cannot.

TPU-first recast (SURVEY.md §7.2 step 7): instead of per-seed process
fan-out (a CPU-era memory workaround), run the same evidence globally and
batched:

  1. every (filled) read is pathed through the unipath graph on device
     (graph/pathsdb.py) — filled fragments span whole inserts, so their
     paths ARE the reference's "insert walks";
  2. adjacency edges never crossed by any read are deleted (the reference's
     local graphs simply never contain them);
  3. a repeat unipath whose read threads pair its in-edges to its out-edges
     one-to-one is replicated per pairing, splitting the junction — the
     global, vectorized equivalent of per-neighborhood repeat resolution.

The surviving simplified graph then merges into contigs via
graph/cleanup.py (the MergeNeighborhoods analog).
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np

from allpathslg_tpu.graph.pathsdb import ReadPaths, pack_edges
from allpathslg_tpu.graph.unipath import UniGraph, Unipaths


@dataclasses.dataclass(frozen=True)
class LocalizeConfig:
    min_edge_support: int = 1      # reads that must cross an edge to keep it
    min_thread_support: int = 2    # threads to accept an (in,out) pairing
    max_rounds: int = 8            # threading rounds (each may expose more)
    max_repeat_kmers: int = 400    # only thread repeats shorter than a read/insert


def edge_support(g: UniGraph, rp: ReadPaths) -> np.ndarray:
    """# reads crossing each adjacency edge (rc-canonicalized).

    Vectorized: sorted searchsorted join of the graph's canonical edge keys
    against the observed transition table (no per-edge Python)."""
    from allpathslg_tpu.graph import pathsdb as pdb
    edges, counts = pdb.transitions(rp)
    tkey = pack_edges(edges[:, 0], edges[:, 1].astype(bool),
                      edges[:, 2], edges[:, 3].astype(bool))
    order = np.argsort(tkey)
    tkey = tkey[order]
    tcnt = counts[order]
    kf = pack_edges(g.a, g.fa, g.b, g.fb)
    kr = pack_edges(g.b, ~g.fb, g.a, ~g.fa)
    kc = np.minimum(kf, kr)
    pos = np.searchsorted(tkey, kc)
    hit = (pos < len(tkey))
    safe = np.minimum(pos, max(len(tkey) - 1, 0))
    hit &= (tkey[safe] == kc) if len(tkey) else False
    out = np.zeros(len(kc), np.int32)
    out[hit] = tcnt[safe[hit]]
    return out


def filter_unsupported_edges(g: UniGraph, support: np.ndarray,
                             cfg: LocalizeConfig) -> Tuple[UniGraph, int]:
    """Drop adjacency edges no read crosses — but never disconnect a node:
    an unsupported edge is kept if it is the only out-edge of its source
    orientation or the only in-edge of its target orientation."""
    E = len(g.a)
    if E == 0:
        return g, 0
    out_cnt: Dict[Tuple[int, bool], int] = defaultdict(int)
    in_cnt: Dict[Tuple[int, bool], int] = defaultdict(int)
    for i in range(E):
        out_cnt[(int(g.a[i]), bool(g.fa[i]))] += 1
        in_cnt[(int(g.b[i]), bool(g.fb[i]))] += 1
    drop = np.zeros(E, bool)
    for i in range(E):
        if support[i] >= cfg.min_edge_support:
            continue
        if out_cnt[(int(g.a[i]), bool(g.fa[i]))] <= 1:
            continue
        if in_cnt[(int(g.b[i]), bool(g.fb[i]))] <= 1:
            continue
        drop[i] = True
        out_cnt[(int(g.a[i]), bool(g.fa[i]))] -= 1
        in_cnt[(int(g.b[i]), bool(g.fb[i]))] -= 1
    keep = ~drop
    return UniGraph(g.a[keep], g.fa[keep], g.b[keep], g.fb[keep]), int(drop.sum())


def _thread_counts(rp: ReadPaths):
    """Triples (prev, mid, next) with contiguous windows, keyed on the
    mid unipath; flags in UniGraph *flip* convention, mid normalized to
    flip=False (forward)."""
    off = rp.offsets
    T = len(rp.uid)
    votes: Dict[Tuple, int] = defaultdict(int)
    # vectorized triple extraction
    entry_read = np.repeat(np.arange(rp.n_reads), np.diff(off))
    if T < 3:
        return votes
    i = np.arange(T - 2)
    same = (entry_read[i] == entry_read[i + 2])
    contig = (rp.leave[i] + 1 == rp.enter[i + 1]) & \
             (rp.leave[i + 1] + 1 == rp.enter[i + 2])
    idx = i[same & contig]
    if len(idx) == 0:
        return votes
    # vectorized normalization (mid forced forward by rc'ing the triple)
    a, fa = rp.uid[idx], ~rp.fwd[idx]
    m, fm = rp.uid[idx + 1], ~rp.fwd[idx + 1]
    b, fb = rp.uid[idx + 2], ~rp.fwd[idx + 2]
    na = np.where(fm, b, a)
    nfa = np.where(fm, ~fb, fa)
    nb = np.where(fm, a, b)
    nfb = np.where(fm, ~fa, fb)
    rows = np.stack([m.astype(np.int64), na.astype(np.int64),
                     nfa.astype(np.int64), nb.astype(np.int64),
                     nfb.astype(np.int64)], axis=1)
    uniq, counts = np.unique(rows, axis=0, return_counts=True)
    for row, c in zip(uniq, counts):
        votes[(int(row[0]), int(row[1]), bool(row[2]),
               int(row[3]), bool(row[4]))] = int(c)
    return votes


def thread_repeats(ups: Unipaths, g: UniGraph, rp: ReadPaths,
                   cfg: LocalizeConfig = LocalizeConfig()):
    """Split repeat junctions whose in/out edges are paired one-to-one by
    read threads. Returns (ups', g', n_split).

    A repeat unipath m (indeg>1 and outdeg>1 in fwd orientation) splits when
    every in-edge and every out-edge participates in exactly one supported
    (in, out) thread pair; m is replicated once per pair, each copy wired to
    its (in, out). Unthreadable junctions are left intact (honest fallback:
    they stay contig breaks, as in the reference when insert walking fails).
    """
    votes = _thread_counts(rp)
    # per-mid pair support
    by_mid: Dict[int, Dict[Tuple, int]] = defaultdict(dict)
    for (m, a, fa, b, fb), c in votes.items():
        if c >= cfg.min_thread_support:
            by_mid[m][(a, fa, b, fb)] = c

    # adjacency keyed by oriented node (flip convention, rc-mirror closed);
    # sets — the UniGraph edge list may already contain mirror rows
    ins: Dict[Tuple[int, bool], set] = defaultdict(set)
    outs: Dict[Tuple[int, bool], set] = defaultdict(set)

    def add_edge(a, fa, b, fb):
        outs[(a, fa)].add((b, fb))
        ins[(b, fb)].add((a, fa))
        outs[(b, not fb)].add((a, not fa))
        ins[(a, not fa)].add((b, not fb))

    edges = sorted({(int(a), bool(fa), int(b), bool(fb))
                    for a, fa, b, fb in zip(g.a, g.fa, g.b, g.fb)})
    for e in edges:
        add_edge(*e)

    # removal index over the ORIGINAL edge list (appended split edges are
    # never removal candidates in the same round — split_touched guards
    # them): oriented endpoint -> edge indices
    by_src: Dict[Tuple[int, bool], List[int]] = defaultdict(list)
    by_dst: Dict[Tuple[int, bool], List[int]] = defaultdict(list)
    for i, (a, fa, b, fb) in enumerate(edges):
        by_src[(a, fa)].append(i)
        by_dst[(b, fb)].append(i)

    n = ups.n
    seqs = [ups.bases[ups.offsets[i]:ups.offsets[i + 1]] for i in range(n)]
    kcnt = list(ups.kmer_counts)
    mcov = list(ups.mean_cov) if ups.mean_cov is not None else None

    new_edges: List[Tuple[int, bool, int, bool]] = list(edges)
    removed = set()
    n_split = 0
    split_touched = set()  # unipaths whose edges changed this round
    for m, pairs in sorted(by_mid.items()):
        if kcnt[m] > cfg.max_repeat_kmers:
            continue
        if m in split_touched or any(
                a in split_touched or b in split_touched
                for (a, fa, b, fb) in pairs):
            continue  # neighbor already rewired; retry next round
        mfwd = (m, False)  # mid traversed forward (flip convention)
        m_ins = ins[mfwd]
        m_outs = outs[mfwd]
        if len(m_ins) < 2 or len(m_outs) < 2:
            continue
        in_set = {(a, fa) for (a, fa, b, fb) in pairs}
        out_set = {(b, fb) for (a, fa, b, fb) in pairs}
        # perfect pairing: every in/out edge used exactly once
        if len(pairs) != len(m_ins) or len(pairs) != len(m_outs):
            continue
        if in_set != m_ins or out_set != m_outs:
            continue
        if len(in_set) != len(pairs) or len(out_set) != len(pairs):
            continue
        # self-loop guard: m adjacent to itself
        if any(a == m or b == m for (a, fa, b, fb) in pairs):
            continue
        # split: one copy per pair
        for (a, fa, b, fb) in pairs:
            cid = len(seqs)
            seqs.append(seqs[m])
            kcnt.append(kcnt[m])
            if mcov is not None:
                mcov.append(mcov[m] / max(len(pairs), 1))
            new_edges.append((a, fa, cid, False))
            new_edges.append((cid, False, b, fb))
        # drop old edges touching m (either orientation form) — indexed
        for i in by_dst.get(mfwd, ()):
            if (edges[i][0], edges[i][1]) in m_ins:
                removed.add(i)
        for i in by_src.get(mfwd, ()):
            if (edges[i][2], edges[i][3]) in m_outs:
                removed.add(i)
        # rc-mirrored forms: (x)->(m,True) mirrors (m,False)->(x^rc)
        for i in by_src.get((m, True), ()):
            if (edges[i][2], not edges[i][3]) in m_ins:
                removed.add(i)
        for i in by_dst.get((m, True), ()):
            if (edges[i][0], not edges[i][1]) in m_outs:
                removed.add(i)
        split_touched.add(m)
        for (a, fa, b, fb) in pairs:
            split_touched.add(a)
            split_touched.add(b)
        n_split += 1

    kept = [e for i, e in enumerate(new_edges) if i not in removed]
    offsets = np.zeros(len(seqs) + 1, np.int64)
    np.cumsum([len(s) for s in seqs], out=offsets[1:])
    ups2 = Unipaths(
        bases=np.concatenate(seqs) if seqs else np.zeros(0, np.uint8),
        offsets=offsets,
        kmer_counts=np.asarray(kcnt, np.int32),
        mean_cov=np.asarray(mcov, np.float32) if mcov is not None else None)
    if kept:
        ea, efa, eb, efb = zip(*kept)
    else:
        ea = efa = eb = efb = ()
    g2 = UniGraph(np.asarray(ea, np.int32), np.asarray(efa, bool),
                  np.asarray(eb, np.int32), np.asarray(efb, bool))
    return ups2, g2, n_split


def localize_resolve(ups: Unipaths, g: UniGraph, rp: ReadPaths,
                     cfg: LocalizeConfig = LocalizeConfig()):
    """Full localization pass: edge-support filter, then iterated
    read-thread junction splitting. Returns (ups', g', metrics)."""
    support = edge_support(g, rp)
    g, n_dropped = filter_unsupported_edges(g, support, cfg)
    total_split = 0
    for _ in range(cfg.max_rounds):
        ups, g, n_split = thread_repeats(ups, g, rp, cfg)
        total_split += n_split
        if n_split == 0:
            break
    return ups, g, {"n_edges_dropped": n_dropped,
                    "n_repeats_split": total_split}

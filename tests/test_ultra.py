"""Ultra: high-error (PacBio CLR ~15%) long-read consensus + partial
pull-aparts (ref: src/paths/long/ultra/ consensus machinery and
SupportedHyperBasevector::PullApart — VERDICT r2 Next #9).

Oracle strategy: simulated genomes with known truth (SURVEY.md §4); error
level measured as the fraction of clean read 24-mers (present in the truth
genome k-mer set) — a direct, alignment-free proxy for per-base error.
"""

import numpy as np
import pytest

from allpathslg_tpu.asm import localize
from allpathslg_tpu.eval import sim
from allpathslg_tpu.graph.pathsdb import ReadPaths
from allpathslg_tpu.graph.unipath import UniGraph, Unipaths
from allpathslg_tpu.long import longproto, supported, ultra


def _genome_kmer_set(g: np.ndarray, K: int):
    out = set()
    for i in range(len(g) - K + 1):
        w = g[i : i + K]
        out.add(w.tobytes())
        out.add((3 - w[::-1]).astype(np.uint8).tobytes())
    return out


def _clean_frac(reads, gset, K=24, stride=7):
    tot = hit = 0
    for r in reads:
        for i in range(0, len(r) - K + 1, stride):
            tot += 1
            hit += r[i : i + K].tobytes() in gset
    return hit / max(tot, 1)


def test_banded_votes_device_matches_host_oracle():
    """The device (lax.scan) vote DP replays the host oracle exactly:
    identical event multisets per problem (VERDICT r3 Next #6)."""
    from collections import Counter

    rng = np.random.default_rng(5)
    B, Lt, Lq, band = 37, 64, 96, 16
    win = rng.integers(0, 4, (B, Lt)).astype(np.uint8)
    frag = np.full((B, Lq), 4, np.uint8)
    flen = np.zeros(B, np.int64)
    wlen = np.full(B, Lt, np.int64)
    for b in range(B):
        out = []
        for x in win[b].tolist():
            r = rng.random()
            if r < 0.08:
                continue                                  # deletion
            out.append(int(rng.integers(0, 4)) if r < 0.16 else x)
            if rng.random() < 0.08:
                out.append(int(rng.integers(0, 4)))        # insertion
        out = ([int(rng.integers(0, 4))] * band + out)[:Lq]
        frag[b, : len(out)] = out
        flen[b] = len(out)
    wlen[3] = 0          # padded problem: must emit nothing
    flen[5] = 0

    def agg(ev):
        i, k, bse, p = ev
        return Counter(zip(p.tolist(), i.tolist(), k.tolist(), bse.tolist()))

    h = agg(ultra._banded_votes_host(win, frag, flen, wlen, band, 3, 2))
    d = agg(ultra._banded_votes(win, frag, flen, wlen, band, 3, 2,
                                chunk=16))  # force multi-chunk path
    assert sum(((h - d) + (d - h)).values()) == 0


def test_ultra_corrects_15pct_cLR_reads():
    G = 20_000
    g = sim.random_genome(G, seed=3)
    reads, _, _ = sim.simulate_long_reads(g, coverage=15, mean_len=4000,
                                          error_rate=0.15, seed=7)
    gset = _genome_kmer_set(g, 24)
    before = _clean_frac(reads, gset)
    assert before < 0.10          # CLR-class input: ~(0.85)^24
    cor, m = ultra.correct_long_reads(reads, ultra.UltraConfig(rounds=2))
    after = _clean_frac(cor, gset)
    # 15% error -> ~0.4% measured in dev; generous floor for seed drift
    assert after > 0.70, (before, after, m)
    # length roughly preserved (indel balance)
    lb = sum(len(r) for r in reads)
    la = sum(len(r) for r in cor)
    assert 0.9 < la / lb < 1.1


def test_ultra_e2e_reconstructs_60kb_genome():
    """The VERDICT r2 done-criterion: error_rate=0.15, 60 kb genome,
    correction + LongProto assembly reconstructs the genome."""
    G = 60_000
    g = sim.random_genome(G, seed=13)
    reads, _, _ = sim.simulate_long_reads(g, coverage=15, mean_len=5000,
                                          error_rate=0.15, seed=17)
    cor, _ = ultra.correct_long_reads(reads, ultra.UltraConfig(rounds=3))
    gset = _genome_kmer_set(g, 24)
    assert _clean_frac(cor, gset) > 0.70

    # assemble corrected reads: 250 bp tiles through LongProto
    tiles = []
    for r in cor:
        for s in range(0, max(len(r) - 250 + 1, 1), 200):
            t = r[s : s + 250]
            if len(t) >= 100:
                tiles.append(t)
    codes = np.full((len(tiles), 250), 4, np.uint8)
    for i, t in enumerate(tiles):
        codes[i, : len(t)] = t
    res = longproto.long_proto(
        codes, longproto.LongProtoConfig(min_kmer_count=3,
                                         correction_rounds=0))
    lens = sorted((len(s) for s in res.contigs.seqs), reverse=True)
    total = sum(lens)
    assert 0.7 * G < total < 1.5 * G, lens[:10]

    # genome coverage: sampled true 100-mers must appear in the contigs
    K2 = 100
    cset = set()
    for s in res.contigs.seqs:
        s = np.asarray(s, np.uint8)
        for i in range(len(s) - K2 + 1):
            cset.add(s[i : i + K2].tobytes())
            cset.add((3 - s[i : i + K2][::-1]).astype(np.uint8).tobytes())
    probes = range(0, G - K2 + 1, 200)
    cov = sum(g[i : i + K2].tobytes() in cset for i in probes) / len(list(probes))
    assert cov > 0.80, (cov, lens[:10])


def _mk_junction():
    """in1(0), in2(1) -> m(2) -> out1(3), out2(4); 30 bp nodes."""
    n = 5
    bases = np.tile(np.arange(30, dtype=np.uint8) % 4, n)
    offsets = np.arange(n + 1, dtype=np.int64) * 30
    ups = Unipaths(bases=bases, offsets=offsets,
                   kmer_counts=np.full(n, 10, np.int32))
    F = False
    g = UniGraph(a=np.array([0, 1, 2, 2], np.int32),
                 fa=np.array([F, F, F, F], bool),
                 b=np.array([2, 2, 3, 4], np.int32),
                 fb=np.array([F, F, F, F], bool))
    return ups, g


def _mk_paths(threads):
    """threads: list of (in, mid, out, count) - build single-window runs."""
    uid, fwd, enter, leave, pos, offsets = [], [], [], [], [], [0]
    for a, m, b, c in threads:
        for _ in range(c):
            uid += [a, m, b]
            fwd += [True, True, True]
            enter += [0, 1, 2]
            leave += [0, 1, 2]
            pos += [0, 0, 0]
            offsets.append(len(uid))
    return ReadPaths(offsets=np.asarray(offsets, np.int64),
                     uid=np.asarray(uid, np.int32),
                     fwd=np.asarray(fwd, bool),
                     enter=np.asarray(enter, np.int32),
                     leave=np.asarray(leave, np.int32),
                     pos=np.asarray(pos, np.int32))


def test_partial_pull_apart_splits_dominant_pairing():
    ups, g = _mk_junction()
    # in1->m->out1 heavily supported; in2->m->out2 below min support
    rp = _mk_paths([(0, 2, 3, 6), (1, 2, 4, 1)])
    cfg = localize.LocalizeConfig(min_thread_support=2)

    # the PERFECT matcher must leave this junction intact
    _, g1, n1 = localize.thread_repeats(ups, g, rp, cfg)
    assert n1 == 0

    ups2, g2, n2 = localize.thread_repeats_partial(ups, g, rp, cfg,
                                                   margin=3.0)
    assert n2 == 1
    assert ups2.n == 6                      # one copy of m appended
    edges = set(zip(ups2 and g2.a.tolist(), g2.fa.tolist(),
                    g2.b.tolist(), g2.fb.tolist()))
    # copy 5 wired in1 -> copy -> out1
    assert (0, False, 5, False) in edges
    assert (5, False, 3, False) in edges
    # consumed edges gone from the original mid
    assert (0, False, 2, False) not in edges
    assert (2, False, 3, False) not in edges
    # ambiguous residue intact
    assert (1, False, 2, False) in edges
    assert (2, False, 4, False) in edges
    # copy carries m's sequence
    s, e = ups2.offsets[5], ups2.offsets[6]
    m0, m1 = ups2.offsets[2], ups2.offsets[3]
    assert np.array_equal(ups2.bases[s:e], ups2.bases[m0:m1])


def test_partial_pull_apart_respects_margin():
    ups, g = _mk_junction()
    # contested: in1 pairs with BOTH outs at comparable support
    rp = _mk_paths([(0, 2, 3, 5), (0, 2, 4, 4), (1, 2, 4, 2)])
    cfg = localize.LocalizeConfig(min_thread_support=2)
    _, _, n = localize.thread_repeats_partial(ups, g, rp, cfg, margin=3.0)
    # 5 vs 4 on the shared in-edge: not dominant; (1,2,4) has competitor 4
    # on its out-edge: not dominant either
    assert n == 0


def test_pull_apart_partial_via_supported_graph():
    ups, g = _mk_junction()
    rp = _mk_paths([(0, 2, 3, 6), (1, 2, 4, 1)])
    sg = supported.build_supported(ups, g, rp)
    sg2, n, _ = supported.pull_apart(sg, rp, min_thread_support=2)
    assert n == 1
    assert sg2.ups.n == 6

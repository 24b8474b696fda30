"""LongProto family: friends, friend-stack correction, supported graph.

Oracle strategy (SURVEY.md §4 implications): simulated genomes with known
truth; friendship checked against the simulator's read placements; the
end-to-end long_proto run must reconstruct the genome.
"""

import numpy as np
import pytest

from allpathslg_tpu.eval import sim
from allpathslg_tpu.long import friends as fr
from allpathslg_tpu.long import longproto, supported


def _sim_batch(G=4000, coverage=25, read_len=250, error_rate=0.0, seed=5):
    g = sim.random_genome(G, seed=seed)
    batch, pairs, truth = sim.simulate_paired_reads(
        g, coverage=coverage, read_len=read_len,
        insert_mean=2 * read_len + 50, insert_sd=20,
        error_rate=error_rate, seed=seed + 1)
    return g, np.asarray(batch.codes), truth


def test_friends_match_simulator_truth():
    g, codes, truth = _sim_batch(G=2000, coverage=15, error_rate=0.0)
    f = fr.find_friends(codes, K=16, min_shared=4)
    assert len(f.a) > 0
    starts = truth.read_starts.astype(np.int64)
    rc = truth.read_rc
    lens = (codes < 4).sum(axis=1).astype(np.int64)
    n_checked = 0
    for i in range(len(f.a)):
        a, b = int(f.a[i]), int(f.b[i])
        # genomic overlap must exist
        ov = min(starts[a] + lens[a], starts[b] + lens[b]) - \
            max(starts[a], starts[b])
        assert ov >= 16, (a, b, ov)
        # orientation: record rc iff strands differ
        assert bool(f.rc[i]) == bool(rc[a] != rc[b])
        # offset check in a's fwd coords (error-free, exact)
        if not rc[a] and not rc[b] and not f.rc[i]:
            assert int(f.offset[i]) == starts[b] - starts[a]
            n_checked += 1
        if rc[a] and rc[b] and not f.rc[i]:
            # both rc: a's fwd coords run backward along genome
            assert int(f.offset[i]) == (starts[a] + lens[a]) - \
                (starts[b] + lens[b])
            n_checked += 1
    assert n_checked > 0


def test_friend_correction_fixes_errors():
    g, codes, truth = _sim_batch(G=2000, coverage=30, error_rate=0.01,
                                 seed=11)
    # reconstruct true reads from the simulator for comparison
    true_codes = np.where(truth.error_mask,
                          255, codes)  # mark error sites
    f = fr.find_friends(codes, K=16, min_shared=4)
    corrected, n_fixed = fr.correct_with_friends(codes, f)
    assert n_fixed > 0
    before = int(truth.error_mask.sum())
    # count remaining mismatches vs truth at simulated-error sites
    fixed_right = int(((corrected != codes) & truth.error_mask).sum())
    broke = int(((corrected != codes) & ~truth.error_mask).sum())
    assert fixed_right > 0.5 * before, (fixed_right, before)
    assert broke <= max(2, fixed_right // 10), (broke, fixed_right)


def test_long_proto_reconstructs_genome():
    g, codes, truth = _sim_batch(G=3000, coverage=30, error_rate=0.004,
                                 seed=7)
    res = longproto.long_proto(codes, longproto.LongProtoConfig(
        K=48, ploidy=1))
    assert res.metrics["n_bases_corrected"] > 0
    seqs = res.contigs.seqs
    assert len(seqs) >= 1
    # the longest contig should cover nearly the whole genome
    best = max(seqs, key=len)
    gs = "".join("ACGT"[c] for c in g)
    bs = "".join("ACGT"[c] for c in best)
    brc = "".join("ACGT"[3 - c] for c in best[::-1])
    assert len(best) > 0.9 * len(g), (len(best), len(g))
    assert bs in gs or brc in gs


def test_supported_graph_pull_apart_resolves_repeat():
    # genome with an exact interior repeat longer than K but shorter than
    # a read: unipath condensation leaves a junction; read threads split it
    rng = np.random.default_rng(3)
    K = 32
    u1, rep, u2, u3, u4 = (rng.integers(0, 4, n).astype(np.uint8)
                           for n in (400, 60, 400, 400, 400))
    genome = np.concatenate([u1, rep, u2, u3, rep, u4])
    batch, _, _ = sim.simulate_paired_reads(
        genome, coverage=40, read_len=200, insert_mean=450, insert_sd=20,
        error_rate=0.0, seed=4)
    codes = np.asarray(batch.codes)
    res = longproto.long_proto(codes, longproto.LongProtoConfig(
        K=K, correction_rounds=0, ploidy=1, min_kmer_count=2))
    # with the repeat resolved, one contig spans (nearly) the genome
    best = max(res.contigs.seqs, key=len)
    assert len(best) > 0.85 * len(genome), (len(best), len(genome))


def test_three_way_pull_apart_with_path_revision():
    """A repeat with THREE copies (distinct flanks) resolves only through
    the iterated loop: partial pull-apart -> path revision -> chain
    condensation -> next-round perfect pull-apart (VERDICT r4 Next 7;
    ref: SupportedHyperBasevector multi-way PullApart + re-pathing).
    Without iteration the graph stalls at 3 contigs (measured r4)."""
    rng = np.random.default_rng(3)
    K = 32
    parts = [rng.integers(0, 4, n).astype(np.uint8)
             for n in (400, 60, 400, 400, 400, 400, 400)]
    u1, rep, u2, u3, u4, u5, u6 = parts
    genome = np.concatenate([u1, rep, u2, u3, rep, u4, u5, rep, u6])
    batch, _, _ = sim.simulate_paired_reads(
        genome, coverage=40, read_len=200, insert_mean=450, insert_sd=20,
        error_rate=0.0, seed=4)
    res = longproto.long_proto(
        np.asarray(batch.codes),
        longproto.LongProtoConfig(K=K, correction_rounds=0, ploidy=1,
                                  min_kmer_count=2))
    assert res.metrics["n_pulled_apart"] >= 2
    assert res.metrics["n_chain_nodes_merged"] > 0
    best = max(res.contigs.seqs, key=len)
    assert len(best) > 0.95 * len(genome), (len(best), len(genome))
    gs = "".join("ACGT"[c] for c in genome)
    bs = "".join("ACGT"[c] for c in best)
    brc = "".join("ACGT"[3 - c] for c in best[::-1])
    assert bs in gs or brc in gs   # exact reconstruction


def test_path_supported_bubble_resolution():
    """An error branch dominated >=3:1 by path support dies; a balanced
    (het) bubble survives at ploidy 2."""
    from allpathslg_tpu.graph.unipath import Unipaths, UniGraph
    from allpathslg_tpu.long import supported as sup

    # nodes: 0 -> {1 weak, 2 strong} -> 3 and 0 -> {4, 5 balanced} -> 3
    def mk_graph():
        bases = np.zeros(60, np.uint8)
        offsets = np.arange(0, 70, 10, np.int64)
        ups = Unipaths(bases=bases, offsets=offsets,
                       kmer_counts=np.full(6, 5, np.int32))
        a = np.array([0, 0, 1, 2], np.int32)
        b = np.array([1, 2, 3, 3], np.int32)
        fa = np.ones(4, bool)
        fb = np.ones(4, bool)
        return ups, UniGraph(a=a, fa=fa, b=b, fb=fb)

    ups, g = mk_graph()
    # edge_support order matches edge rows: 0->1 weak(1), 0->2 strong(9),
    # 1->3 weak(1), 2->3 strong(9)
    es = np.array([1, 9, 1, 9], np.int32)
    sg = sup.SupportedGraph(ups=ups, g=g, edge_support=es,
                            node_cov=np.ones(6, np.int32))
    rp = None  # unused by resolve_bubbles_by_paths
    sg2, n = sup.resolve_bubbles_by_paths(sg, rp, min_ratio=3.0, ploidy=1)
    assert n == 1
    assert 1 not in set(sg2.g.a.tolist()) | set(sg2.g.b.tolist())

    # balanced het bubble at ploidy 2 survives
    ups, g = mk_graph()
    es = np.array([5, 6, 5, 6], np.int32)
    sg = sup.SupportedGraph(ups=ups, g=g, edge_support=es,
                            node_cov=np.ones(6, np.int32))
    sg2, n = sup.resolve_bubbles_by_paths(sg, rp, min_ratio=3.0, ploidy=2)
    assert n == 0
    assert len(sg2.g.a) == 4

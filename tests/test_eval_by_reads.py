"""EvalByReads analog: read-support scoring of an assembly graph
(ref: src/paths/long/EvalByReads — the LongProto subtree's truth-free
oracle; SURVEY.md §2.5 LongProto row)."""

import numpy as np

from allpathslg_tpu.eval import sim
from allpathslg_tpu.graph import unipath as gup
from allpathslg_tpu.graph.unipath import UniGraph
from allpathslg_tpu.kmer import count as kcount
from allpathslg_tpu.long import eval_by_reads as ebr


def _assemble(codes, K=32):
    import jax.numpy as jnp

    ck = kcount.trim_to_host(kcount.count_reads_streaming(codes, K))
    ups, g, placement = gup.build_unipaths(
        [jnp.asarray(w) for w in ck.words], K, min_count=2,
        counts=np.asarray(ck.counts), with_graph=True, with_placement=True)
    return ups, g, placement


def test_clean_reads_are_coherent():
    g0 = sim.random_genome(12_000, seed=31)
    rb, _, _ = sim.simulate_paired_reads(g0, coverage=25, error_rate=0.0,
                                         seed=32)
    codes = np.asarray(rb.codes)
    ups, g, placement = _assemble(codes)
    s = ebr.eval_by_reads(codes, ups, g, placement)
    assert s["placed_frac"] > 0.95, s
    assert s["coherent_frac"] > 0.95, s
    assert s["n_unsupported_transitions"] == 0, s


def test_broken_graph_detected():
    """Deleting graph edges makes reads that cross them incoherent."""
    g0 = sim.random_genome(12_000, seed=31)
    rb, _, _ = sim.simulate_paired_reads(g0, coverage=25, error_rate=0.0,
                                         seed=32)
    codes = np.asarray(rb.codes)
    ups, g, placement = _assemble(codes)
    if len(g.a) == 0:
        return  # single-unipath assembly: nothing to break
    g2 = UniGraph(a=g.a[:0], fa=g.fa[:0], b=g.b[:0], fb=g.fb[:0])
    s2 = ebr.eval_by_reads(codes, ups, g2, placement)
    s1 = ebr.eval_by_reads(codes, ups, g, placement)
    assert s2["n_unsupported_transitions"] > 0
    assert s2["coherent_frac"] < s1["coherent_frac"]

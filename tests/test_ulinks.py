"""Unipath link graph from simulated jump pairs."""

import numpy as np

from allpathslg_tpu.dtypes.reads import batch_from_codes
from allpathslg_tpu.kmer import count
from allpathslg_tpu.graph import unipath, pathsdb, ulinks
from allpathslg_tpu.eval import sim

K = 24


def _build_from_genome(genome, L=60, step=7):
    starts = np.arange(0, len(genome) - L + 1, step)
    if starts[-1] != len(genome) - L:
        starts = np.append(starts, len(genome) - L)
    reads = np.stack([genome[s:s + L] for s in starts])
    batch = batch_from_codes(reads, np.full(len(reads), L, np.int32))
    ck = count.trim_to_host(count.count_reads(batch.codes, K))
    return unipath.build_unipaths(ck.words, K, min_count=1,
                                  counts=ck.counts, with_graph=True,
                                  with_placement=True)


def test_link_graph_connects_adjacent_unipaths_with_right_sep():
    # genome of two unique arms joined by a short repeat => >=3 unipaths;
    # jump pairs spanning the repeat must link the arm unipaths
    rng = np.random.default_rng(0)
    arm1 = sim.random_genome(2500, seed=1)
    arm2 = sim.random_genome(2500, seed=2)
    rep = sim.random_genome(150, seed=3)
    g = np.concatenate([arm1, rep, arm2, rep, sim.random_genome(2500, seed=4)])
    ups, graph, pl = _build_from_genome(g)

    insert, sd, L = 900, 10, 80
    batch, pairs, truth = sim.simulate_paired_reads(
        g, coverage=30, read_len=L, insert_mean=insert, insert_sd=sd,
        error_rate=0.0, seed=5)
    rp = pathsdb.path_reads(pl, np.asarray(batch.codes))
    lg = ulinks.build_ulink_graph(rp, np.asarray(pairs.pairs), ups.kmer_counts,
                                  K, insert, sd)
    assert lg.n_edges >= 1
    # links must connect distinct unipaths with plausible separations
    assert (lg.a != lg.b).all()
    assert (lg.n_pairs >= 2).all()
    assert (lg.sep < insert).all()
    # separations should be consistent with insert geometry: no link can
    # exceed the insert, and deviations stay bounded
    assert (lg.dev < 10 * sd + 50).all()


def test_link_graph_empty_without_cross_pairs():
    g = sim.random_genome(4000, seed=9)
    ups, graph, pl = _build_from_genome(g)
    assert ups.n == 1  # no repeats: single unipath
    batch, pairs, _ = sim.simulate_paired_reads(g, coverage=20, read_len=70,
                                                insert_mean=300, insert_sd=20,
                                                error_rate=0.0, seed=10)
    rp = pathsdb.path_reads(pl, np.asarray(batch.codes))
    lg = ulinks.build_ulink_graph(rp, np.asarray(pairs.pairs),
                                  ups.kmer_counts, K, 300, 20)
    assert lg.n_edges == 0


def test_neighborhoods_recruit_linked_unipaths():
    arm1 = sim.random_genome(1500, seed=21)
    rep = sim.random_genome(200, seed=22)
    arm2 = sim.random_genome(1500, seed=23)
    g = np.concatenate([arm1, rep, arm2, rep,
                        sim.random_genome(1500, seed=24)])
    ups, graph, pl = _build_from_genome(g)
    batch, pairs, _ = sim.simulate_paired_reads(
        g, coverage=40, read_len=80, insert_mean=700, insert_sd=15,
        error_rate=0.0, seed=25)
    rp = pathsdb.path_reads(pl, np.asarray(batch.codes))
    lg = ulinks.build_ulink_graph(rp, np.asarray(pairs.pairs),
                                  ups.kmer_counts, K, 700, 15)
    if lg.n_edges == 0:
        return  # geometry produced no cross links; nothing to recruit
    seeds = np.asarray([int(lg.a[0])])
    nh = ulinks.neighborhoods(lg, seeds, max_sep=5000)
    assert len(nh) == 1
    assert int(lg.a[0]) in nh[0]
    assert len(nh[0]) >= 2

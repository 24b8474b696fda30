"""Scaffolding: jump links reconstruct contig order/orientation/gaps."""

import numpy as np
import jax.numpy as jnp
import pytest

from allpathslg_tpu.align import lookup
from allpathslg_tpu.ec import jump as jec
from allpathslg_tpu.eval import sim
from allpathslg_tpu.scaffold import links as slinks
from allpathslg_tpu.scaffold import scaffolder, superb


@pytest.fixture(scope="module")
def scaffold_setup():
    """Genome cut into 5 'contigs' with gaps; jump pairs across gaps."""
    rng = np.random.default_rng(50)
    G = 60_000
    genome = sim.random_genome(G, seed=51)
    # contigs: [0,10k) [10.5k,22k) [22.4k,35k) [35.3k,48k) [48.6k,60k)
    cuts = [(0, 10_000), (10_500, 22_000), (22_400, 35_000),
            (35_300, 48_000), (48_600, 60_000)]
    contigs = [genome[s:e] for s, e in cuts]
    bases = np.concatenate(contigs)
    offsets = np.zeros(len(contigs) + 1, np.int64)
    np.cumsum([len(c) for c in contigs], out=offsets[1:])
    index = lookup.build_index(bases, offsets, K=24)

    jumps, jpairs, jtruth = sim.simulate_paired_reads(
        genome, coverage=20, error_rate=0.003, insert_mean=3000,
        insert_sd=200, outward=False, seed=52)  # already innies for the test
    return genome, cuts, contigs, bases, offsets, index, jumps, jpairs


def test_links_and_scaffold_order(scaffold_setup):
    genome, cuts, contigs, bases, offsets, index, jumps, jpairs = scaffold_setup
    cfg = lookup.AlignConfig()
    c, d, o, mm, ok = lookup.align_reads(index, jumps.codes, jumps.lengths,
                                         cfg, bases)
    assert ok.mean() > 0.8
    clens = np.diff(offsets)
    read_lens = np.asarray(jumps.lengths)
    lg = slinks.pair_links(c, d, o, ok, read_lens, np.asarray(jpairs.pairs),
                           clens, insert=3000, insert_sd=200)
    assert lg.n_edges >= 4  # at least the 4 adjacencies

    scaffolds = scaffolder.make_scaffolds(lg, len(contigs))
    scaffolds = scaffolder.remodel_gaps(scaffolds, lg)
    # expect a single scaffold covering all 5 contigs in order
    big = max(scaffolds, key=lambda s: s.n_contigs)
    assert big.n_contigs == 5
    ids = big.contig_ids
    if ids[0] > ids[-1]:
        ids = ids[::-1]
        flips = [not f for f in big.rc[::-1]]
        gaps = big.gaps[::-1]
    else:
        flips = big.rc
        gaps = big.gaps
    assert ids == [0, 1, 2, 3, 4]
    # all same orientation
    assert len(set(flips)) == 1
    # gap estimates close to truth
    true_gaps = [cuts[i + 1][0] - cuts[i][1] for i in range(4)]
    for g, tg in zip(gaps, true_gaps):
        assert abs(g - tg) < 150, (g, tg)


def test_superb_roundtrip_and_agp(tmp_path, scaffold_setup):
    genome, cuts, contigs, bases, offsets, index, jumps, jpairs = scaffold_setup
    sb = superb.Superb([0, 2, 1], [False, True, False], [100, -5], [10, 12])
    p = str(tmp_path / "x.superb")
    superb.write_superb(p, [sb])
    back = superb.read_superb(p)
    assert back[0].contig_ids == sb.contig_ids
    assert back[0].rc == sb.rc
    assert back[0].gaps == sb.gaps

    clens = [len(c) for c in contigs]
    agp = str(tmp_path / "x.agp")
    superb.write_agp(agp, [sb], clens)
    txt = open(agp).read()
    assert "agp-version" in txt and "paired-ends" in txt

    seq = superb.scaffold_sequence(sb, contigs)
    # contains contig 0 fwd then Ns then rc(contig 2)
    assert (seq[: clens[0]] == contigs[0]).all()
    assert (seq[clens[0] : clens[0] + 100] == 4).all()
    rc2 = (3 - contigs[2])[::-1]
    assert (seq[clens[0] + 100 : clens[0] + 100 + clens[2]] == rc2).all()

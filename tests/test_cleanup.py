"""Diploid bubble popping + chain merging on simulated het genomes."""

import numpy as np
import pytest

from allpathslg_tpu.dtypes.reads import batch_from_codes
from allpathslg_tpu.eval import sim, stats
from allpathslg_tpu.graph import cleanup, unipath
from allpathslg_tpu.kmer import count


def _diploid_reads(G=30_000, snp_rate=0.003, cov=30, seed=80):
    h1 = sim.random_genome(G, seed=seed)
    h2 = sim.mutate_genome(h1, snp_rate=snp_rate, seed=seed + 1)
    b1, _, _ = sim.simulate_paired_reads(h1, coverage=cov, error_rate=0.002,
                                         seed=seed + 2)
    b2, _, _ = sim.simulate_paired_reads(h2, coverage=cov, error_rate=0.002,
                                         seed=seed + 3)
    codes = np.concatenate([np.asarray(b1.codes), np.asarray(b2.codes)])
    lengths = np.concatenate([np.asarray(b1.lengths), np.asarray(b2.lengths)])
    return h1, h2, batch_from_codes(codes, lengths)


@pytest.fixture(scope="module")
def diploid(tmp_path_factory):
    K = 48
    h1, h2, batch = _diploid_reads()
    ck = count.trim_to_host(count.count_reads(batch.codes, K))
    ups, g = unipath.build_unipaths(ck.words, K, min_count=3,
                                    counts=ck.counts, with_graph=True)
    return K, h1, h2, ups, g


def test_bubbles_fragment_without_popping(diploid):
    K, h1, h2, ups, g = diploid
    st = stats.assembly_stats(ups.lengths(), min_len=K)
    # het SNPs every ~330bp fragment the raw unipaths
    assert ups.n > 50
    assert st["n50"] < 3000


def test_popping_restores_contiguity_and_records_ambiguities(diploid):
    K, h1, h2, ups, g = diploid
    contigs, m = cleanup.simplify(ups, g, K, ploidy=2)
    lens = [len(s) for s in contigs.seqs]
    st = stats.assembly_stats(lens, min_len=2 * K)
    assert m["n_bubbles_popped"] > 20, m
    assert st["n50"] > 8000, (st, m)
    # most ambiguity segments are single-base (SNP bubbles)
    snplike = sum(1 for a in contigs.ambiguities for (off, klen, alt) in a
                  if klen == 1 and len(alt) == 1)
    assert snplike > 0.6 * m["n_ambiguities"], (snplike, m)
    # contigs (first allele) should align to haplotype 1 or 2
    gs1 = "".join(map(str, h1))
    gs2 = "".join(map(str, h2))
    big = contigs.seqs[int(np.argmax(lens))]
    # check a 500bp window appears in either haplotype (allele mixing means
    # exact full-contig match is not expected)
    probe = "".join(map(str, big[:200]))
    rc = (3 - big[:200])[::-1]
    probe_rc = "".join(map(str, rc))
    assert (probe in gs1 or probe in gs2 or probe_rc in gs1 or probe_rc in gs2)


def test_haploid_mode_no_ambiguities(diploid):
    """Haploid mode still POPS bubbles (an error branch would otherwise
    break the chain and duplicate its interior) but deletes the weaker
    branch outright instead of recording an EFASTA ambiguity (the
    reference's HAPLOIDIFY collapse)."""
    K, h1, h2, ups, g = diploid
    contigs, m = cleanup.simplify(ups, g, K, ploidy=1)
    assert m["n_bubbles_popped"] > 0
    assert m["n_ambiguities"] == 0
    # collapsing the het bubbles must join chains, not fragment them:
    # the longest contig spans most of the haplotype
    lens = [len(s) for s in contigs.seqs]
    assert max(lens) > 2000, sorted(lens)[-5:]

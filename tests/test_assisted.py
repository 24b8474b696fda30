"""Assisted assembly (ref: src/paths/assisted/ AssistedPatcher behavior):
a related genome orders/orients contigs and proposes gap patches; read
evidence must confirm spliced sequence."""

import numpy as np
import pytest

from allpathslg_tpu.asm import assisted
from allpathslg_tpu.eval import sim
from allpathslg_tpu.kmer import count as kcount


def _rc(seq):
    return (3 - seq)[::-1].astype(np.uint8)


@pytest.fixture(scope="module")
def genome():
    return sim.random_genome(24_000, seed=11)


@pytest.fixture(scope="module")
def relative(genome):
    # a related strain: ~0.3% SNPs
    return sim.mutate_genome(genome, 0.003, seed=12)


def test_place_contigs_coords_and_orientation(genome, relative):
    c0 = genome[1_000:6_000]
    c1 = _rc(genome[8_000:13_000])
    c2 = genome[15_000:20_000]
    junk = sim.random_genome(3_000, seed=99)  # not in the relative
    pl = assisted.place_contigs([c0, c1, c2, junk], relative)
    assert pl[3] is None
    assert pl[0] is not None and not pl[0].rc
    assert pl[1] is not None and pl[1].rc
    assert pl[2] is not None and not pl[2].rc
    assert abs(pl[0].ref_start - 1_000) <= 50
    assert abs(pl[1].ref_start - 8_000) <= 50
    assert abs(pl[1].ref_end - 13_000) <= 50
    assert abs(pl[2].ref_end - 20_000) <= 50


def test_assist_scaffold_orders_and_orients(genome, relative):
    # contigs given out of order, middle one flipped
    contigs = [genome[15_000:20_000], _rc(genome[8_000:13_000]),
               genome[1_000:6_000], sim.random_genome(2_500, seed=98)]
    pl = assisted.place_contigs(contigs, relative)
    sbs = assisted.assist_scaffold(pl, len(contigs))
    # one chained scaffold (2,1,0) + singleton for the unplaced contig
    chains = [s for s in sbs if s.n_contigs > 1]
    assert len(chains) == 1
    sb = chains[0]
    assert sb.contig_ids == [2, 1, 0]
    assert sb.rc == [False, True, False]
    assert all(abs(g - 2_000) <= 100 for g in sb.gaps)
    singles = [s for s in sbs if s.n_contigs == 1]
    assert {s.contig_ids[0] for s in singles} == {3}


def _read_kmers(genome, K=24, coverage=30.0, seed=5):
    reads, pairs, truth = sim.simulate_paired_reads(
        genome, coverage=coverage, read_len=100, error_rate=0.0, seed=seed)
    import jax.numpy as jnp
    ck = kcount.count_reads(jnp.asarray(reads.codes), K)
    return kcount.trim_to_host(ck)


def test_assisted_patch_closes_supported_gap(genome, relative):
    contigs = [genome[500:9_000], genome[9_600:19_500]]
    ck = _read_kmers(genome)
    contigs2, sbs, m = assisted.assist_assembly(contigs, relative,
                                                read_kmers=ck)
    assert m["n_contigs_placed"] == 2
    assert m["n_patches_closed"] == 1
    # the chained scaffold now holds one merged contig
    sb = max(sbs, key=lambda s: s.n_contigs == 1 and len(contigs2[s.contig_ids[0]]))
    merged = contigs2[sb.contig_ids[0]]
    truth = genome[500:19_500]
    assert abs(len(merged) - len(truth)) <= 20
    # patch came from the relative: identical to truth except its SNPs
    L = min(len(merged), len(truth))
    ident = (merged[:L] == truth[:L]).mean()
    assert ident > 0.99


def test_assisted_patch_rejects_without_read_support(genome, relative):
    contigs = [genome[500:9_000], genome[9_600:19_500]]
    # reads from an unrelated genome: patch kmers unsupported
    other = sim.random_genome(24_000, seed=77)
    ck = _read_kmers(other, seed=6)
    contigs2, sbs, m = assisted.assist_assembly(contigs, relative,
                                                read_kmers=ck)
    assert m["n_patches_closed"] == 0
    assert m["n_patches_rejected"] >= 1
    # scaffold still chains the two contigs with a gap estimate
    chains = [s for s in sbs if s.n_contigs > 1]
    assert len(chains) == 1
    assert abs(chains[0].gaps[0] - 600) <= 100


def test_assisted_pipeline_stage(tmp_path_factory):
    """E2E: a 1.5 kb exact repeat breaks the frag-only assembly (inserts
    are ~180 bp, jumps absent); the assisting relative must chain the
    unique contigs across the repeat and patch the junctions with
    read-confirmed repeat sequence."""
    from allpathslg_tpu.io import fasta as iofa
    from allpathslg_tpu.pipeline.run import main
    from allpathslg_tpu.pipeline.rundir import RunDir
    from allpathslg_tpu.eval import sim as esim
    import numpy as np

    d = tmp_path_factory.mktemp("assisted_e2e")
    rep_seq = sim.random_genome(1_500, seed=23)
    a = sim.random_genome(12_000, seed=24)
    b = sim.random_genome(12_000, seed=25)
    c = sim.random_genome(12_000, seed=26)
    genome = np.concatenate([a, rep_seq, b, rep_seq, c])
    relative = sim.mutate_genome(genome, 0.002, seed=22)
    ref_path = str(d / "relative.fasta")
    iofa.write_fasta(ref_path, [("rel", relative)])

    # hand-prepared inputs so the sim genome is OUR repeat genome
    rd_path = str(d / "run")
    rd = RunDir(rd_path)
    reads, pairs, truth = esim.simulate_paired_reads(
        genome, coverage=45, read_len=100, error_rate=0.004, seed=21)
    rd.save_arrays("frag_reads_orig", codes=np.asarray(reads.codes),
                   quals=np.asarray(reads.quals),
                   lengths=np.asarray(reads.lengths),
                   pairs=np.asarray(pairs.pairs))
    rd.save_arrays("genome_truth", genome=genome)
    rc = main(["--run-dir", rd_path, "batch_reads=16384",
               f"assist_ref={ref_path}"])
    assert rc == 0
    rd = RunDir(rd_path)  # re-open: manifest was rewritten by the run
    m = rd.metrics("assisted")
    assert m["n_contigs_placed"] >= 3
    assert m["n_assisted_joins"] >= 2
    assert m["n_patches_closed"] >= 2, m
    rep = rd.metrics("report")
    assert rep["n50"] > 35_000, (m, rep)

"""E2E: a long exact repeat breaks contigs; jump pairs scaffold across it;
long reads close what short-read patching cannot."""

import numpy as np
import pytest

from allpathslg_tpu.eval import sim
from allpathslg_tpu.pipeline.config import AssemblyConfig
from allpathslg_tpu.pipeline.rundir import RunDir
from allpathslg_tpu.pipeline.stages import Pipeline


@pytest.fixture(scope="module")
def repeat_run(tmp_path_factory):
    rng = np.random.default_rng(70)
    g = sim.random_genome(60_000, seed=71)
    g[40_000:42_500] = g[10_000:12_500]  # 2.5kb exact repeat, two loci

    rd = RunDir(str(tmp_path_factory.mktemp("repeat")))
    batch, pairs, truth = sim.simulate_paired_reads(
        g, coverage=50, error_rate=0.004, seed=72)
    rd.save_arrays("frag_reads_orig", codes=np.asarray(batch.codes),
                   lengths=np.asarray(batch.lengths),
                   quals=np.asarray(batch.quals),
                   pairs=np.asarray(pairs.pairs))
    jb, jp, _ = sim.simulate_paired_reads(
        g, coverage=15, error_rate=0.004, insert_mean=4000, insert_sd=350,
        outward=True, seed=73)
    rd.save_arrays("jump_reads_orig", codes=np.asarray(jb.codes),
                   lengths=np.asarray(jb.lengths),
                   quals=np.asarray(jb.quals), pairs=np.asarray(jp.pairs),
                   lib_sep=np.array([4000], np.int32),
                   lib_sd=np.array([350], np.int32))
    lr, _, _ = sim.simulate_long_reads(g, coverage=12, mean_len=8000, seed=74)
    flat = np.concatenate(lr)
    offs = np.zeros(len(lr) + 1, np.int64)
    np.cumsum([len(r) for r in lr], out=offs[1:])
    rd.save_arrays("long_reads_orig", bases=flat, offsets=offs)
    rd.save_arrays("genome_truth", genome=g)

    cfg = AssemblyConfig.from_overrides(batch_reads=16384)
    pipe = Pipeline(rd, cfg, log=lambda *a: None)
    pipe.run_full()
    return rd, g


def test_repeat_breaks_then_longread_closes(repeat_run):
    rd, g = repeat_run
    # the repeat must have broken short-read-only contigs
    um = rd.metrics("unipaths")
    assert um["n_unipaths"] >= 4
    lm = rd.metrics("long_read_patch")
    cm = rd.metrics("report")
    em = rd.metrics("evaluate")
    # long reads should have closed at least one repeat junction
    assert lm.get("n_gaps_closed", 0) >= 1, lm
    # final contig N50 spans beyond the repeat structure
    assert cm["n50"] > 25_000, cm
    assert em["misassembly_breaks"] <= 1, em
    assert em["genome_covered_frac"] > 0.9, em


def test_polish_cleans_longread_patch(repeat_run):
    rd, g = repeat_run
    pm = rd.metrics("polish")
    # the noisy PacBio patch must have been polished by short reads
    assert pm["n_bases_fixed"] >= 0  # present; exact count data-dependent
    u = rd.load_arrays("contigs_final")
    # final contigs anchor-accurate vs genome. NOTE: substitution-only
    # polish leaves long-read INDELS in patched spans (~the patch region's
    # anchors); indel-aware polish (banded-DP traceback) is tracked for the
    # next round and will push this to ~1.0.
    em = rd.metrics("evaluate")
    assert em["anchor_place_rate"] > 0.85

"""End-to-end minimum slice: sim genome → contigs, accuracy vs truth
(SURVEY.md §7.3 oracle)."""

import os

import numpy as np
import pytest

from allpathslg_tpu.eval import oracle, stats
from allpathslg_tpu.pipeline.config import AssemblyConfig
from allpathslg_tpu.pipeline.rundir import RunDir
from allpathslg_tpu.pipeline.run import main, prepare_sim_inputs


@pytest.fixture(scope="module")
def e2e_run(tmp_path_factory):
    rd_path = str(tmp_path_factory.mktemp("e2e"))
    rc = main(["--run-dir", rd_path, "--sim-genome", "40000",
               "--coverage", "50", "--error-rate", "0.005",
               "batch_reads=16384"])
    assert rc == 0
    return RunDir(rd_path)


def test_contigs_cover_genome_accurately(e2e_run):
    rd = e2e_run
    K = 96
    u = rd.load_arrays("unibases")
    g = rd.load_arrays("genome_truth")["genome"]
    offs = u["offsets"]
    lens = np.diff(offs)
    st = stats.assembly_stats(lens, min_len=2 * K)
    assert st["total_bases"] > 0.95 * len(g)
    assert st["n50"] > 5000, st

    genome_kmers = set(oracle.count_kmers([g], K).keys())
    contig_kmers = set()
    n_bad = 0
    for i in range(len(lens)):
        if lens[i] < 2 * K:
            continue
        seq = u["bases"][offs[i]:offs[i + 1]]
        ck = set(oracle.count_kmers([seq], K).keys())
        n_bad += len(ck - genome_kmers)
        contig_kmers |= ck
    # accuracy: contig kmers are genome kmers (no misassembly/chimera)
    assert n_bad <= 0.002 * len(contig_kmers), n_bad
    # completeness: most genome kmers present
    assert len(contig_kmers & genome_kmers) > 0.95 * len(genome_kmers)


def test_report_and_artifacts_exist(e2e_run):
    rd = e2e_run
    assert os.path.exists(rd.file_path("assembly.report"))
    assert os.path.exists(rd.file_path("unibases.fasta"))
    with open(rd.file_path("assembly.report")) as f:
        txt = f.read()
    assert "contig N50" in txt


def test_full_pipeline_with_jumps(tmp_path_factory):
    """Fragments + jump library → scaffolds joining the contigs."""
    rd_path = str(tmp_path_factory.mktemp("e2e_jump"))
    rc = main(["--run-dir", rd_path, "--sim-genome", "60000",
               "--coverage", "50", "--error-rate", "0.004",
               "--jump-coverage", "15", "batch_reads=16384"])
    assert rc == 0
    rd = RunDir(rd_path)
    sm = rd.metrics("make_scaffolds")
    cm = rd.metrics("report")
    # scaffolding must not lose sequence and should join contigs
    assert sm["scaffold_total"] >= 0.95 * 60000
    assert sm["scaffold_n50"] >= cm["n50"]
    assert os.path.exists(rd.file_path("final.assembly.fasta"))
    assert os.path.exists(rd.file_path("assembly.agp"))
    # patching should push contig N50 to scaffold scale and contigs must be
    # exact genome substrings (base accuracy oracle)
    assert cm["n50"] >= 0.8 * sm["scaffold_n50"], (cm, sm)
    u = rd.load_arrays("contigs_final")
    g = rd.load_arrays("genome_truth")["genome"]
    gs = "".join(map(str, g))
    offs = u["offsets"]
    lens = np.diff(offs)
    big = int(np.argmax(lens))
    c = u["bases"][offs[big]:offs[big + 1]]
    cs = "".join(map(str, c))
    rcs = "".join(map(str, (3 - c)[::-1]))
    assert gs.find(cs) >= 0 or gs.find(rcs) >= 0, "largest contig inexact"


def test_resume_skips_completed_stages(e2e_run, capsys):
    rd = e2e_run
    # rerun: everything up to date → no stage re-executes
    rc = main(["--run-dir", rd.path, "--sim-genome", "40000",
               "--coverage", "50", "--error-rate", "0.005",
               "batch_reads=16384"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("up to date, skipping") >= 7

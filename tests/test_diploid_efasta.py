"""Diploid E2E: het-SNP bubbles become EFASTA {kept,alt} blocks and the
records survive patching/polish/cleaning into final.assembly.efasta
(VERDICT round-1 item 8; ref: FlattenHKP + efasta emitters)."""

import numpy as np
import pytest

from allpathslg_tpu.eval import sim
from allpathslg_tpu.pipeline.config import AssemblyConfig
from allpathslg_tpu.pipeline.rundir import RunDir
from allpathslg_tpu.pipeline.stages import Pipeline


@pytest.fixture(scope="module")
def diploid_run(tmp_path_factory):
    rd = RunDir(str(tmp_path_factory.mktemp("diploid")))
    hap1 = sim.random_genome(40000, seed=5)
    hap2 = sim.mutate_genome(hap1, snp_rate=0.002, seed=6)
    parts = []
    pair_parts = []
    at = 0
    for hp, sd in ((hap1, 7), (hap2, 8)):
        b, p, _ = sim.simulate_paired_reads(hp, coverage=30,
                                            error_rate=0.002, seed=sd)
        parts.append((np.asarray(b.codes), np.asarray(b.lengths),
                      np.asarray(b.quals)))
        pair_parts.append(np.asarray(p.pairs) + at)
        at += b.n_reads
    L = max(c.shape[1] for c, _, _ in parts)
    codes = np.full((at, L), 4, np.uint8)
    quals = np.zeros((at, L), np.uint8)
    lengths = np.zeros(at, np.int32)
    row = 0
    for c, l, q in parts:
        codes[row : row + len(l), : c.shape[1]] = c
        quals[row : row + len(l), : q.shape[1]] = q
        lengths[row : row + len(l)] = l
        row += len(l)
    rd.save_arrays("frag_reads_orig", codes=codes, lengths=lengths,
                   quals=quals, pairs=np.concatenate(pair_parts))
    rd.save_arrays("genome_truth", genome=hap1)
    # jump library from hap1 so scaffolding+patching exercise the threading
    jb, jp, _ = sim.simulate_paired_reads(hap1, coverage=15,
                                          error_rate=0.002,
                                          insert_mean=3000, insert_sd=300,
                                          outward=True, seed=9)
    rd.save_arrays("jump_reads_orig", codes=np.asarray(jb.codes),
                   lengths=np.asarray(jb.lengths),
                   quals=np.asarray(jb.quals), pairs=np.asarray(jp.pairs),
                   lib_sep=np.array([3000], np.int32),
                   lib_sd=np.array([300], np.int32))
    cfg = AssemblyConfig(ploidy=2, batch_reads=16384)
    Pipeline(rd, cfg, log=lambda *a: None).run_full()
    return rd


def test_bubbles_popped_and_recorded(diploid_run):
    um = diploid_run.metrics("unipaths")
    assert um.get("n_bubbles_popped", 0) > 5, um
    assert um.get("n_ambiguities", 0) > 5, um


def test_ambiguities_survive_to_final_efasta(diploid_run):
    rd = diploid_run
    um = rd.metrics("unipaths")
    fm = rd.metrics("finalize")
    n_unipath_stage = um.get("n_ambiguities", 0)
    n_final = fm.get("n_ambiguities", 0)
    # patching/cleaning may drop records whose contigs were cut or removed,
    # but the bulk must survive the full coordinate-changing chain
    assert n_final >= 0.5 * n_unipath_stage, (n_final, n_unipath_stage)
    assert n_final > 0

    from allpathslg_tpu.io import efasta as eio
    recs = eio.read_efasta(rd.file_path("final.assembly.efasta"))
    n_blocks = sum(sum(1 for s in segs if isinstance(s, tuple))
                   for _, segs in recs)
    assert n_blocks == n_final, (n_blocks, n_final)


def test_alt_blocks_match_other_haplotype(diploid_run):
    """Each {kept,alt} block: kept+context must occur in one haplotype's
    neighborhood... verified loosely: alt differs from kept and both are
    short (SNP-scale) in most records."""
    from allpathslg_tpu.io import efasta as eio
    rd = diploid_run
    recs = eio.read_efasta(rd.file_path("final.assembly.efasta"))
    pairs = [s for _, segs in recs for s in segs if isinstance(s, tuple)]
    assert pairs
    sane = sum(1 for kept, alt in pairs
               if kept != alt and abs(len(kept) - len(alt)) <= 4)
    assert sane >= 0.8 * len(pairs)

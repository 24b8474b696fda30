"""Marked-slow >=500 kb DIPLOID multi-library full-pipeline test.

VERDICT r4 Next #9: the heuristic-maturity risk lives in library
COMBINATIONS — before this test, diploid was only exercised at 40-60 kb
with one jump lib, and never together with long jumps + PacBio. Here:
ploidy=2 (het SNPs 1/1000), two jump libraries (3 kb + 6 kb), a 12 kb
long-jump library and 5x PacBio run through the FULL pipeline at 500 kb,
asserting scaffold contiguity, EFASTA ambiguity survival and base
accuracy against the two-haplotype truth (ref: SURVEY §2.5 rows 17-22 +
the ploidy contract of §5.6).

Run explicitly:  python -m pytest tests/test_scale_diploid_multilib.py -m slow -q
"""

import numpy as np
import pytest

from allpathslg_tpu.eval import sim
from allpathslg_tpu.pipeline.config import AssemblyConfig
from allpathslg_tpu.pipeline.rundir import RunDir
from allpathslg_tpu.pipeline.stages import Pipeline


def _mix_frag(haps, coverage_each, err, seeds):
    parts, pair_parts, at = [], [], 0
    for hp, sd in zip(haps, seeds):
        b, p, _ = sim.simulate_paired_reads(hp, coverage=coverage_each,
                                            error_rate=err, seed=sd)
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
        codes[row:row + len(l), :c.shape[1]] = c
        quals[row:row + len(l), :q.shape[1]] = q
        lengths[row:row + len(l)] = l
        row += len(l)
    return codes, lengths, quals, np.concatenate(pair_parts)


def _jump_libs(specs):
    """specs: [(hap, insert, sd, cov, seed), ...] -> artifact dict."""
    codes, lens, quals, prs, libids, at = [], [], [], [], [], 0
    for li, (hp, ins, sd, cov, seed) in enumerate(specs):
        jb, jp, _ = sim.simulate_paired_reads(
            hp, coverage=cov, error_rate=0.004, insert_mean=ins,
            insert_sd=sd, outward=True, seed=seed)
        c = np.asarray(jb.codes)
        codes.append(c)
        quals.append(np.asarray(jb.quals))
        lens.append(np.asarray(jb.lengths))
        prs.append(np.asarray(jp.pairs) + at)
        libids.append(np.full(len(jp.pairs), li, np.int32))
        at += jb.n_reads
    L = max(c.shape[1] for c in codes)
    codes = [np.pad(c, ((0, 0), (0, L - c.shape[1])), constant_values=4)
             for c in codes]
    quals = [np.pad(q, ((0, 0), (0, L - q.shape[1])))
             for q in quals]
    return dict(codes=np.concatenate(codes), lengths=np.concatenate(lens),
                quals=np.concatenate(quals), pairs=np.concatenate(prs),
                lib_id=np.concatenate(libids),
                lib_sep=np.array([s[1] for s in specs], np.int32),
                lib_sd=np.array([s[2] for s in specs], np.int32))


@pytest.mark.slow
def test_pipeline_diploid_multilib_500kb(tmp_path):
    G = 500_000
    rd = RunDir(str(tmp_path))
    hap1 = sim.random_genome(G, seed=21)
    hap2 = sim.mutate_genome(hap1, snp_rate=0.001, seed=22)

    codes, lengths, quals, pairs = _mix_frag(
        (hap1, hap2), coverage_each=30.0, err=0.004, seeds=(23, 24))
    rd.save_arrays("frag_reads_orig", codes=codes, lengths=lengths,
                   quals=quals, pairs=pairs)
    rd.save_arrays("genome_truth", genome=hap1)

    # two jump libraries (one per haplotype, different inserts)
    rd.save_arrays("jump_reads_orig", **_jump_libs(
        [(hap1, 3000, 300, 12.0, 25), (hap2, 6000, 600, 10.0, 26)]))
    # long-jump (Fosill-class) + PacBio, from hap1
    rd.save_arrays("long_jump_reads_orig", **_jump_libs(
        [(hap1, 12000, 1200, 6.0, 27)]))
    lr, _, _ = sim.simulate_long_reads(hap1, coverage=5.0, seed=28)
    flat = np.concatenate(lr)
    offs = np.zeros(len(lr) + 1, np.int64)
    np.cumsum([len(r) for r in lr], out=offs[1:])
    rd.save_arrays("long_reads_orig", bases=flat, offsets=offs)

    cfg = AssemblyConfig.from_overrides(ploidy=2)
    report = Pipeline(rd, cfg, log=lambda *a: None).run_full()

    assert report["total_bases"] > 0.9 * G, report
    assert report["total_bases"] < 1.15 * G, report
    assert report["n50"] > 100_000, report
    sm = rd.metrics("make_scaffolds")
    lm = rd.metrics("long_jump_scaffolds")
    assert lm["scaffold_n50"] >= sm["scaffold_n50"], (lm, sm)
    assert lm["scaffold_n50"] > 200_000, lm

    # het bubbles must survive to the final EFASTA as {kept,alt} blocks:
    # ~G * snp_rate = 500 het sites exist; demand a healthy fraction
    fm = rd.metrics("finalize")
    assert fm.get("n_ambiguities", 0) > 50, fm

    # base accuracy: 96-mers of big contigs must come from hap1 OR hap2
    from allpathslg_tpu.eval import oracle
    u = rd.load_arrays("unibases")
    K = 96
    lens = np.diff(u["offsets"])
    big = [u["bases"][u["offsets"][i]:u["offsets"][i + 1]]
           for i in range(len(lens)) if lens[i] >= 2 * K]
    gset = set(oracle.count_kmers([hap1], K).keys())
    gset |= set(oracle.count_kmers([hap2], K).keys())
    n_bad = n_tot = 0
    for seq in big:
        ck = oracle.count_kmers([seq], K)
        n_tot += len(ck)
        n_bad += sum(1 for k in ck if k not in gset)
    assert n_bad <= 0.005 * max(n_tot, 1), (n_bad, n_tot)

"""Input prep from library sheets + SAM import round-trips."""

import os

import numpy as np
import pytest

from allpathslg_tpu.dtypes.reads import string_from_codes
from allpathslg_tpu.eval import sim
from allpathslg_tpu.io import fasta as fio
from allpathslg_tpu.io import sam as samio
from allpathslg_tpu.pipeline.prepare import (Library, prepare_inputs,
                                             read_in_libs)
from allpathslg_tpu.pipeline.rundir import RunDir


def _write_fastq(path, codes, quals, lengths, names=None):
    recs = []
    for i in range(codes.shape[0]):
        l = int(lengths[i])
        recs.append((names[i] if names else f"r{i}",
                     codes[i, :l], quals[i, :l]))
    fio.write_fastq(path, recs)


def _simulate(tmpdir, n_pairs=60, L=70):
    g = sim.random_genome(4000, seed=1)
    batch, pairs, _ = sim.simulate_paired_reads(
        g, coverage=2 * n_pairs * L / 4000, read_len=L, error_rate=0.0,
        seed=2)
    codes = np.asarray(batch.codes)
    quals = np.asarray(batch.quals)
    lengths = np.asarray(batch.lengths)
    return g, codes, quals, lengths, np.asarray(pairs.pairs)


def test_sam_roundtrip(tmp_path):
    _, codes, quals, lengths, _ = _simulate(tmp_path)
    p = str(tmp_path / "reads.sam")
    samio.write_sam(p, codes, lengths, quals)
    c2, q2, l2, pairs, names = samio.read_sam(p)
    assert (l2 == lengths).all()
    assert (c2 == codes).all()
    assert (q2 == quals).all()
    assert len(pairs) == 0  # unpaired flags


def test_sam_paired_and_rc_flags(tmp_path):
    # hand-written SAM: one pair, second mate stored reverse-complemented
    seq1, seq2 = "ACGTACGTAA", "TTGGCCAATT"
    rc2 = "AATTGGCCAA"
    p = str(tmp_path / "p.sam")
    with open(p, "w") as f:
        f.write("@HD\tVN:1.6\n")
        f.write(f"q\t{0x1|0x40}\t*\t0\t0\t*\t*\t0\t0\t{seq1}\t" +
                "I" * 10 + "\n")
        f.write(f"q\t{0x1|0x80|0x10}\tref\t5\t60\t10M\t*\t0\t0\t{rc2}\t" +
                "I" * 10 + "\n")
        # a secondary alignment that must be skipped
        f.write(f"q\t{0x1|0x80|0x100}\tref\t9\t60\t10M\t*\t0\t0\t{rc2}\t*\n")
    c, q, l, pairs, names = samio.read_sam(p)
    assert c.shape[0] == 2
    assert string_from_codes(c[0, :10]) == seq1
    assert string_from_codes(c[1, :10]) == seq2  # flipped back
    assert pairs.tolist() == [[0, 1]]
    assert (q[0, :10] == ord("I") - 33).all()


def test_prepare_inputs_mate_files_and_sheets(tmp_path):
    g, codes, quals, lengths, pairs = _simulate(tmp_path)
    # split into mate files
    r1 = pairs[:, 0]
    r2 = pairs[:, 1]
    _write_fastq(str(tmp_path / "lib1_1.fastq"), codes[r1], quals[r1],
                 lengths[r1])
    _write_fastq(str(tmp_path / "lib1_2.fastq"), codes[r2], quals[r2],
                 lengths[r2])
    with open(tmp_path / "in_libs.csv", "w") as f:
        f.write("library_name,project_name,organism_name,type,paired,"
                "frag_size,frag_stddev,insert_size,insert_stddev,"
                "read_orientation\n")
        f.write("lib1,proj,org,fragment,1,180,18,,,inward\n")
    with open(tmp_path / "in_groups.csv", "w") as f:
        f.write("group_name,library_name,file_name\n")
        f.write("g1,lib1,lib1_?.fastq\n")
    rd = RunDir(str(tmp_path / "run"))
    counts = prepare_inputs(rd, str(tmp_path / "in_libs.csv"),
                            str(tmp_path / "in_groups.csv"), ploidy=2,
                            log=lambda *a: None)
    assert counts["frag_reads_orig"] == codes.shape[0]
    a = rd.load_arrays("frag_reads_orig")
    assert a["pairs"].shape == pairs.shape
    assert a["lib_sep"].tolist() == [180]
    assert a["lib_sd"].tolist() == [18]
    # mates re-pair to the same sequences
    for k in range(3):
        i, j = a["pairs"][k]
        assert (a["codes"][i][: lengths[r1[k]]] ==
                codes[r1[k]][: lengths[r1[k]]]).all()
        assert (a["codes"][j][: lengths[r2[k]]] ==
                codes[r2[k]][: lengths[r2[k]]]).all()
    with open(rd.file_path("ploidy")) as f:
        assert f.read().strip() == "2"


def test_prepare_classifies_jump_and_long(tmp_path):
    g, codes, quals, lengths, pairs = _simulate(tmp_path, n_pairs=20)
    _write_fastq(str(tmp_path / "jmp.fastq"), codes, quals, lengths)
    # long reads as fastq
    _write_fastq(str(tmp_path / "pb.fastq"), codes, quals, lengths)
    with open(tmp_path / "in_libs.csv", "w") as f:
        f.write("library_name,type,paired,frag_size,frag_stddev,"
                "insert_size,insert_stddev,read_orientation\n")
        f.write("jmp,jumping,1,,,3000,300,outward\n")
        f.write("pb,long,0,,,,,\n")
    with open(tmp_path / "in_groups.csv", "w") as f:
        f.write("group_name,library_name,file_name\n")
        f.write("gj,jmp,jmp.fastq\n")
        f.write("gp,pb,pb.fastq\n")
    rd = RunDir(str(tmp_path / "run"))
    counts = prepare_inputs(rd, str(tmp_path / "in_libs.csv"),
                            str(tmp_path / "in_groups.csv"),
                            log=lambda *a: None)
    assert counts["jump_reads_orig"] == codes.shape[0]
    assert counts["long_reads_orig"] == codes.shape[0]
    j = rd.load_arrays("jump_reads_orig")
    assert j["lib_sep"].tolist() == [3000]
    lr = rd.load_arrays("long_reads_orig")
    assert len(lr["offsets"]) == codes.shape[0] + 1


def test_in_libs_parsing(tmp_path):
    p = tmp_path / "l.csv"
    with open(p, "w") as f:
        f.write("library_name, type, paired, frag_size, frag_stddev\n")
        f.write("f1, fragment, 1, 200, 20\n")
    libs = read_in_libs(str(p))
    assert libs["f1"].sep == 200 and libs["f1"].sd == 20
    assert libs["f1"].is_fragment

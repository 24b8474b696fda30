"""IO: FASTA/FASTQ/EFASTA round-trips; native reader vs python parser."""

import numpy as np
import pytest

from allpathslg_tpu.io import fasta as fio
from allpathslg_tpu.io import efasta as eio
from allpathslg_tpu.io import native_fastq
from allpathslg_tpu.native import build as nbuild


def test_fasta_roundtrip(tmp_path):
    p = str(tmp_path / "x.fasta")
    recs = [("a", np.array([0, 1, 2, 3, 4, 0], np.uint8)),
            ("b", np.array([3, 3, 3], np.uint8))]
    fio.write_fasta(p, recs)
    back = fio.read_fasta(p)
    assert back[0][0] == "a"
    assert (back[0][1] == recs[0][1]).all()
    assert (back[1][1] == recs[1][1]).all()


def test_fastq_roundtrip_and_native(tmp_path):
    rng = np.random.default_rng(0)
    p = str(tmp_path / "x.fastq")
    n, L = 300, 120
    codes = rng.integers(0, 5, (n, L)).astype(np.uint8)
    quals = rng.integers(0, 42, (n, L)).astype(np.uint8)
    recs = [(f"r{i}", codes[i], quals[i]) for i in range(n)]
    fio.write_fastq(p, recs)

    c2, q2, l2 = native_fastq.read_fastq_arrays(p)
    assert (l2 == L).all()
    # pads beyond length are irrelevant here (full length reads)
    assert (c2 == codes).all()
    assert (q2 == quals).all()

    if nbuild.fastq_lib() is not None:
        # the native path was used; also verify python fallback agrees
        seqs, qs = fio.read_fastq(p)
        assert len(seqs) == n
        assert (np.stack(seqs) == codes).all()


def test_native_reader_builds():
    lib = nbuild.fastq_lib()
    # toolchain is baked into this image; the native lib must build
    assert lib is not None


def test_efasta_roundtrip(tmp_path):
    p = str(tmp_path / "x.efasta")
    recs = [("c0", ["ACGT", ("A", "T"), "GGC", ("AC", ""), "T"])]
    eio.write_efasta(p, recs)
    back = eio.read_efasta(p)
    assert back[0][0] == "c0"
    assert eio.render(back[0][1]) == "ACGT{A,T}GGC{AC,}T"
    assert eio.flatten_first(back[0][1]) == "ACGTAGGCACT"
    assert eio.ambiguities(back[0][1]) == 2

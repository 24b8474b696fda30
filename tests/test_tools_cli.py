"""Standalone tools CLI: convert and align subcommands."""

import io
import sys

import numpy as np
import pytest

from allpathslg_tpu import tools
from allpathslg_tpu.eval import sim
from allpathslg_tpu.io import fasta as fio


def _capture(fn, argv):
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        fn(argv)
    finally:
        sys.stdout = old
    return buf.getvalue()


def test_convert_roundtrip_fastq_npz(tmp_path):
    g = sim.random_genome(500, seed=1)
    reads = np.stack([g[i:i + 50] for i in range(0, 400, 20)])
    quals = np.full_like(reads, 35)
    fq = str(tmp_path / "r.fastq")
    fio.write_fastq(fq, [(f"r{i}", reads[i], quals[i])
                         for i in range(len(reads))])
    npz = str(tmp_path / "r.npz")
    _capture(tools.main, ["convert", fq, "--out", npz])
    z = np.load(npz)
    assert (z["lengths"] == 50).all()
    assert z["codes"].shape[0] == len(reads)
    # npz -> fastq
    fq2 = str(tmp_path / "r2.fastq")
    _capture(tools.main, ["convert", npz, "--out", fq2])
    codes2, quals2, lengths2 = __import__(
        "allpathslg_tpu.io.native_fastq", fromlist=["x"]).read_fastq_arrays(fq2)
    assert (codes2[:, :50] == reads).all()


def test_align_cli_places_reads(tmp_path):
    g = sim.random_genome(3000, seed=2)
    fa = str(tmp_path / "t.fasta")
    fio.write_fasta(fa, [("t0", g)])
    starts = np.arange(0, 2900, 100)
    reads = np.stack([g[s:s + 80] for s in starts])
    rfa = str(tmp_path / "reads.fasta")
    fio.write_fasta(rfa, [(f"r{i}", r) for i, r in enumerate(reads)])
    out = _capture(tools.main, ["align", rfa, fa])
    rows = [l.split("\t") for l in out.strip().splitlines()]
    assert len(rows) == len(reads)
    ok_rows = [r for r in rows if r[5] == "1"]
    assert len(ok_rows) >= 0.9 * len(reads)
    for r in ok_rows:
        i = int(r[0].split("_")[1])
        assert r[1] == "t0"
        assert abs(int(r[2]) - starts[i]) <= 2
        assert int(r[4]) == 0

"""Multi-Mb real-ingest path exercise (VERDICT r3 Missing #7).

The reference's whole front door is PrepareAllPathsInputs.pl: library
sheets + FASTQ -> binary read sets. Here we generate a multi-Mb FASTQ
from a simulated genome (no network needed) and push it through the REAL
ingest path — the native C++ FASTQ parser and the sheets-driven
prepare_inputs — asserting read counts, base fidelity, pairing and
library classification at a scale (>100 MB of FASTQ text) that the toy
tests never touched.

Marked slow: ~2-4 min of host I/O; run with `-m slow`.
"""

import os

import numpy as np
import pytest

from allpathslg_tpu.eval import sim
from allpathslg_tpu.io.native_fastq import read_fastq_arrays
from allpathslg_tpu.pipeline.prepare import prepare_inputs
from allpathslg_tpu.pipeline.rundir import RunDir

BASES = np.frombuffer(b"ACGTN", np.uint8)


def _write_fastq(path, codes, quals, lens):
    n = codes.shape[0]
    with open(path, "wb") as f:
        for i in range(0, n, 4096):
            chunk = []
            for r in range(i, min(i + 4096, n)):
                L = int(lens[r])
                seq = BASES[np.minimum(codes[r, :L], 4)].tobytes()
                q = (quals[r, :L] + 33).astype(np.uint8).tobytes()
                chunk.append(b"@r" + str(r).encode() + b"\n" + seq
                             + b"\n+\n" + q + b"\n")
            f.write(b"".join(chunk))


@pytest.mark.slow
def test_multi_mb_fastq_ingest(tmp_path):
    G = 2_000_000
    g = sim.random_genome(G, seed=21)
    rb, pairs, _ = sim.simulate_paired_reads(g, coverage=30,
                                             error_rate=0.01, seed=22)
    codes = np.asarray(rb.codes)
    quals = np.asarray(rb.quals)
    lens = np.asarray(rb.lengths)
    n = codes.shape[0]
    assert n * 100 >= 55_000_000      # >= 55 Mb of bases

    fq = str(tmp_path / "frag.fastq")
    _write_fastq(fq, codes, quals, lens)
    assert os.path.getsize(fq) > 100_000_000   # >100 MB of FASTQ text

    # leg 1: the native C++ parser alone round-trips every base
    c2, q2, l2 = read_fastq_arrays(fq)
    assert c2.shape[0] == n
    assert np.array_equal(l2.astype(np.int64), lens.astype(np.int64))
    assert np.array_equal(c2[:, :100], codes[:, :100])
    assert np.array_equal(q2[:, :100], quals[:, :100])

    # leg 2: the sheets-driven prepare path (PrepareAllPathsInputs
    # contract) classifies and lands the library as fragment reads
    (tmp_path / "in_libs.csv").write_text(
        "library_name,project_name,organism_name,type,paired,"
        "frag_size,frag_stddev,insert_size,insert_stddev,read_orientation,"
        "genomic_start,genomic_end\n"
        "frag1,proj,org,fragment,1,180,10,,,inward,,\n")
    (tmp_path / "in_groups.csv").write_text(
        "group_name,library_name,file_name\n"
        f"g1,frag1,{fq}\n")
    rd = RunDir(str(tmp_path / "run"))
    counts = prepare_inputs(rd, str(tmp_path / "in_libs.csv"),
                            str(tmp_path / "in_groups.csv"))
    a = rd.load_arrays("frag_reads_orig")
    assert a["codes"].shape[0] == n
    assert int(a["lengths"].sum()) == int(lens.sum())
    assert "pairs" in a and a["pairs"].shape[0] == n // 2
    assert np.array_equal(np.sort(a["pairs"].ravel()),
                          np.arange(n))

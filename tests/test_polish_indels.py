"""Indel-aware polish (ref: src/paths/FixSomeIndels.cc): an assembly with a
small indel error must be repaired to the exact true substring by banded-DP
variant scoring of the covering reads."""

import numpy as np

from allpathslg_tpu.asm import polish as apol
from allpathslg_tpu.eval import sim


def _seed_alignments(contig_err, reads, starts):
    """Gap-free anchors like the lookup aligner would produce: each read
    lands at the small shift minimizing mismatches against the erroneous
    contig (reads downstream of an indel therefore anchor shifted)."""
    n = len(starts)
    anchor = np.zeros(n, np.int32)
    for i, s in enumerate(starts):
        best = None
        for d in range(-3, 4):
            a = int(s) + d
            if a < 0 or a + reads.shape[1] > len(contig_err):
                continue
            mm = int((contig_err[a : a + reads.shape[1]] != reads[i]).sum())
            if best is None or mm < best[0]:
                best = (mm, a)
        anchor[i] = best[1]
    contig = np.zeros(n, np.int32)
    rc = np.zeros(n, bool)
    ok = np.ones(n, bool)
    return contig, anchor, rc, ok


def _mk_reads(genome, read_len=60, step=7):
    starts = np.arange(0, len(genome) - read_len, step)
    codes = np.stack([genome[s : s + read_len] for s in starts])
    lengths = np.full(len(starts), read_len, np.int32)
    return codes, lengths, starts


def _run_case(true_genome, err_genome):
    codes, lengths, starts = _mk_reads(true_genome)
    c, a, r, ok = _seed_alignments(err_genome, codes, starts)
    offsets = np.asarray([0, len(err_genome)], np.int64)
    bases, off2, n_fix, _ = apol.polish_indels(
        err_genome.copy(), offsets, codes, lengths, c, a, r, ok)
    return bases, n_fix


def test_deletion_error_repaired():
    g = sim.random_genome(3000, seed=7)
    p = 1500
    err = np.concatenate([g[:p], g[p + 1:]])   # contig lost one base
    fixed, n = _run_case(g, err)
    assert n >= 1
    assert bytes(fixed) == bytes(g), "deletion not repaired to exact genome"


def test_insertion_error_repaired():
    g = sim.random_genome(3000, seed=8)
    p = 1100
    ins = np.asarray([2], np.uint8)
    err = np.concatenate([g[:p], ins, g[p:]])  # contig gained one base
    fixed, n = _run_case(g, err)
    assert n >= 1
    assert bytes(fixed) == bytes(g), "insertion not repaired to exact genome"


def test_two_base_deletion_repaired():
    g = sim.random_genome(3000, seed=9)
    p = 2000
    err = np.concatenate([g[:p], g[p + 2:]])
    fixed, n = _run_case(g, err)
    assert n >= 1
    assert bytes(fixed) == bytes(g)


def test_clean_contig_untouched():
    g = sim.random_genome(3000, seed=10)
    fixed, n = _run_case(g, g.copy())
    assert n == 0
    assert bytes(fixed) == bytes(g)

"""Seed-and-verify aligner vs known read placements."""

import numpy as np
import jax.numpy as jnp
import pytest

from allpathslg_tpu.align import lookup
from allpathslg_tpu.eval import sim


@pytest.fixture(scope="module")
def aligned_setup():
    # two "contigs" cut from a genome; reads simulated from the genome
    genome = sim.random_genome(25_000, seed=40)
    c0 = genome[:12_000]
    c1 = genome[12_500:]
    bases = np.concatenate([c0, c1])
    offsets = np.array([0, len(c0), len(c0) + len(c1)], np.int64)
    index = lookup.build_index(bases, offsets, K=24)
    batch, pairs, truth = sim.simulate_paired_reads(
        genome, coverage=8, error_rate=0.01, seed=41)
    return genome, bases, offsets, index, batch, truth


def test_alignments_match_truth(aligned_setup):
    genome, bases, offsets, index, batch, truth = aligned_setup
    cfg = lookup.AlignConfig()
    c, d, o, mm, ok = lookup.align_reads(index, batch.codes, batch.lengths,
                                         cfg, bases)
    n = batch.n_reads
    L = batch.max_len
    n_checked = n_good = 0
    for i in range(n):
        s = truth.read_starts[i]
        rc = truth.read_rc[i]
        # expected contig/pos (skip reads spanning the 12000-12500 cut)
        if s + L <= 12_000:
            ec, ep = 0, s
        elif s >= 12_500:
            ec, ep = 1, s - 12_500
        else:
            continue
        n_checked += 1
        if not ok[i]:
            continue
        # placement: fwd-read anchor = leftmost pos; rc anchor = read0 pos
        start = d[i] if not o[i] else d[i] - (batch.lengths[i] - 1)
        if c[i] == ec and abs(int(start) - ep) == 0 and bool(o[i]) == bool(rc):
            n_good += 1
    assert n_checked > 100
    assert n_good > 0.9 * n_checked, (n_good, n_checked)


def test_align_rate_and_mismatches(aligned_setup):
    genome, bases, offsets, index, batch, truth = aligned_setup
    cfg = lookup.AlignConfig()
    c, d, o, mm, ok = lookup.align_reads(index, batch.codes, batch.lengths,
                                         cfg, bases)
    assert ok.mean() > 0.85
    # mismatch counts equal the simulated error counts for aligned reads
    errs = truth.error_mask.sum(1)
    agree = (mm[ok] == errs[ok]).mean()
    assert agree > 0.9, agree


def test_garbage_reads_unaligned(aligned_setup):
    genome, bases, offsets, index, batch, truth = aligned_setup
    rng = np.random.default_rng(5)
    junk = rng.integers(0, 4, size=(64, 100)).astype(np.uint8)
    cfg = lookup.AlignConfig()
    c, d, o, mm, ok = lookup.align_reads(index, jnp.asarray(junk),
                                         jnp.full(64, 100, jnp.int32), cfg,
                                         bases)
    assert ok.sum() == 0

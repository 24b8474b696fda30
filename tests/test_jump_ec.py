"""Jump EC: outie flipping, chimera truncation, dedupe."""

import numpy as np
import jax.numpy as jnp
import pytest

from allpathslg_tpu.dtypes.reads import batch_from_codes
from allpathslg_tpu.ec import jump as jec
from allpathslg_tpu.ec import spectrum_ec as sec
from allpathslg_tpu.eval import sim
from allpathslg_tpu.kmer import count as kcount


@pytest.fixture(scope="module")
def setup():
    genome = sim.random_genome(30_000, seed=30)
    frag, _, _ = sim.simulate_paired_reads(genome, coverage=40,
                                           error_rate=0.0, seed=31)
    ck = kcount.count_reads(frag.codes, 24, frag.quals)
    table, _ = sec.strong_table(ck, sec.SpectrumECConfig(min_strong_qsum=0))
    jumps, jpairs, jtruth = sim.simulate_paired_reads(
        genome, coverage=10, error_rate=0.0, insert_mean=3000, insert_sd=300,
        outward=True, seed=32)
    return genome, table, jumps, jpairs, jtruth


def test_flip_makes_innies(setup):
    genome, table, jumps, jpairs, jtruth = setup
    c, q, l, pair_ok, m = jec.error_correct_jumps(
        jumps.codes, jumps.quals, jumps.lengths, jpairs.pairs, table)
    assert m["n_pairs_kept"] > 0.9 * m["n_pairs_in"]
    # after flip, read 2i must match the genome forward at its start
    p = np.asarray(jpairs.pairs)
    n_match = n_tot = 0
    for i in range(0, len(p), 11):
        if not pair_ok[i]:
            continue
        r1 = p[i, 0]
        s = jtruth.read_starts[r1]
        seq = c[r1, : l[r1]]
        seg = genome[s : s + l[r1]]
        if len(seg) == l[r1]:
            n_tot += 1
            if (seq == seg).all():
                n_match += 1
    assert n_tot > 10
    assert n_match == n_tot


def test_chimeric_junction_truncated(setup):
    genome, table, jumps, jpairs, jtruth = setup
    # construct chimeras: first 60bp from site A, last 40 from distant site B
    L = 100
    a, b = 5000, 20000
    chim = np.concatenate([genome[a : a + 60], genome[b : b + 40]])
    codes = np.stack([chim, genome[1000 : 1000 + L]]).astype(np.uint8)
    # reads as outies (rc'd)
    codes = np.stack([(3 - codes[0])[::-1], (3 - codes[1])[::-1]]).astype(np.uint8)
    quals = np.full((2, L), 30, np.uint8)
    lengths = np.array([L, L], np.int32)
    pairs = np.array([[0, 1]], np.int32)
    c, q, l, pair_ok, m = jec.error_correct_jumps(
        codes, quals, lengths, pairs, table,
        jec.JumpECConfig(dedupe=False))
    # chimeric mate truncated to ~the trusted prefix of its sequenced strand
    assert l[0] < 70, l[0]
    assert l[0] >= 40
    assert l[1] == L


def test_duplicates_dropped(setup):
    genome, table, jumps, jpairs, jtruth = setup
    codes = np.asarray(jumps.codes)
    quals = np.asarray(jumps.quals)
    lengths = np.asarray(jumps.lengths)
    p = np.asarray(jpairs.pairs)
    # duplicate the first 5 pairs
    dup_rows = np.concatenate([p[:5, 0], p[:5, 1]])
    codes2 = np.concatenate([codes, codes[dup_rows]])
    quals2 = np.concatenate([quals, quals[dup_rows]])
    lengths2 = np.concatenate([lengths, lengths[dup_rows]])
    extra = np.stack([np.arange(len(codes), len(codes) + 5),
                      np.arange(len(codes) + 5, len(codes) + 10)], 1)
    p2 = np.concatenate([p, extra]).astype(np.int32)
    c, q, l, pair_ok, m = jec.error_correct_jumps(
        codes2, quals2, lengths2, p2, table)
    assert m["n_duplicates"] >= 5

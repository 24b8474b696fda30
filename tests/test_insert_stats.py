"""Robustness of the empirical insert-size estimator (ref:
src/paths/SamplePairedReadStats.cc -> IntDistribution; VERDICT r2 weak
#10: chimeric/multi-mapped placements must not fatten the distribution
RemodelGaps then trusts)."""

import numpy as np

from allpathslg_tpu.eval import accuracy as eacc


def _mock_alignments(seps, contig_len=200_000, read_len=100, seed=0):
    """Innie pairs on one contig: read 2i fwd at `left`, 2i+1 rc at
    left+sep-1 (anchor = base-0 position of each read)."""
    rng = np.random.default_rng(seed)
    n = len(seps)
    left = rng.integers(0, contig_len - np.max(seps) - 1, n)
    right = left + np.asarray(seps) - 1
    anchor = np.empty(2 * n, np.int64)
    anchor[0::2], anchor[1::2] = left, right
    contig = np.zeros(2 * n, np.int32)
    rc = np.zeros(2 * n, bool)
    rc[1::2] = True
    ok = np.ones(2 * n, bool)
    lens = np.full(2 * n, read_len, np.int64)
    pairs = np.stack([np.arange(0, 2 * n, 2), np.arange(1, 2 * n, 2)], 1)
    return contig, anchor, rc, ok, lens, pairs


def test_chimeric_tail_trimmed():
    """5% chimeric pairs (uniform bogus separations up to 60 kb) on top of
    a 3000+/-300 library: the MAD-trimmed estimate stays within 2% / 15%
    of the true mean / sd, while the untrimmed moments are demonstrably
    corrupted (sd inflated >2x)."""
    rng = np.random.default_rng(1)
    good = rng.normal(3000, 300, 4000).astype(np.int64)
    chim = rng.integers(200, 60_000, 200)
    seps = np.concatenate([good, chim])
    args = _mock_alignments(seps)

    mean_t, sd_t, hist_t = eacc.estimate_insert_stats(*args)
    assert abs(mean_t - 3000) < 60, mean_t
    assert abs(sd_t - 300) < 45, sd_t
    # the histogram feeding RemodelGaps' MLE must not carry the tail
    assert len(hist_t) < 6000

    mean_u, sd_u, _ = eacc.estimate_insert_stats(*args, trim_sigma=1e9)
    assert sd_u > 2 * 300, "untrimmed sd should be corrupted by the tail"


def test_clean_library_unchanged_by_trim():
    rng = np.random.default_rng(2)
    seps = rng.normal(3000, 300, 5000).astype(np.int64)
    args = _mock_alignments(seps)
    mean_t, sd_t, _ = eacc.estimate_insert_stats(*args)
    mean_u, sd_u, _ = eacc.estimate_insert_stats(*args, trim_sigma=1e9)
    assert abs(mean_t - mean_u) < 10
    assert abs(sd_t - sd_u) < 0.05 * sd_u + 5

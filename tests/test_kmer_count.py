"""K-mer extraction/counting vs independent python oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from allpathslg_tpu.dtypes.reads import batch_from_codes
from allpathslg_tpu.kmer import bits, count, kmerize
from allpathslg_tpu.eval import oracle, sim


def _counts_to_dict(ck, K):
    ck = count.trim_to_host(ck)
    n = int(ck.n_unique)
    words = np.stack([np.asarray(w) for w in ck.words], axis=1)
    cnts = np.asarray(ck.counts)
    out = {}
    for i in range(n):
        out[oracle.words_to_tuple(words[i], K)] = int(cnts[i])
    return out


@pytest.mark.parametrize("K", [5, 24, 31, 96])
def test_counts_match_oracle(K):
    rng = np.random.default_rng(0)
    n, L = 30, 120
    codes = rng.integers(0, 4, size=(n, L)).astype(np.uint8)
    # sprinkle Ns and ragged lengths
    codes[rng.random((n, L)) < 0.01] = 4
    lengths = rng.integers(K, L + 1, size=n).astype(np.int32)
    batch = batch_from_codes(codes, lengths)

    ck = count.count_reads(batch.codes, K)
    got = _counts_to_dict(ck, K)

    reads = [np.asarray(batch.codes[i, : lengths[i]]) for i in range(n)]
    want = oracle.count_kmers(reads, K)
    assert got == dict(want)


def test_counts_read_order_invariant():
    K = 24
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=(20, 80)).astype(np.uint8)
    lengths = np.full(20, 80, dtype=np.int32)
    b1 = batch_from_codes(codes, lengths)
    perm = rng.permutation(20)
    b2 = batch_from_codes(codes[perm], lengths[perm])
    d1 = _counts_to_dict(count.count_reads(b1.codes, K), K)
    d2 = _counts_to_dict(count.count_reads(b2.codes, K), K)
    assert d1 == d2


def test_merge_counted_equals_joint():
    K = 25
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 4, size=(40, 90)).astype(np.uint8)
    lengths = np.full(40, 90, dtype=np.int32)
    whole = batch_from_codes(codes, lengths)
    a = batch_from_codes(codes[:17], lengths[:17])
    b = batch_from_codes(codes[17:], lengths[17:])
    joint = _counts_to_dict(count.count_reads(whole.codes, K), K)
    merged = count.merge_counted(count.count_reads(a.codes, K),
                                 count.count_reads(b.codes, K))
    assert _counts_to_dict(merged, K) == joint


def test_spectrum_matches_oracle():
    K = 24
    genome = sim.random_genome(4000, seed=7)
    batch, _, _ = sim.simulate_paired_reads(genome, coverage=20, error_rate=0.002)
    ck = count.count_reads(batch.codes, K)
    spec = np.asarray(count.spectrum(ck, max_freq=63))

    reads = [np.asarray(batch.codes[i]) for i in range(batch.n_reads)]
    want = oracle.kmer_spectrum(oracle.count_kmers(reads, K), max_freq=63)
    assert (spec == want).all()


def test_qual_weighted_support():
    K = 5
    codes = np.array([[0, 1, 2, 3, 0, 1]], dtype=np.uint8)
    quals = np.array([[30, 20, 10, 25, 30, 40]], dtype=np.uint8)
    batch = batch_from_codes(codes, np.array([6], np.int32), quals)
    ck = count.trim_to_host(count.count_reads(batch.codes, K, batch.quals))
    # windows: [0..4] minq=10, [1..5] minq=10
    assert int(ck.n_unique) == 2
    assert sorted(np.asarray(ck.qsum).tolist()) == [10, 10]

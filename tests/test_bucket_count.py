"""Bucketed grouping must count identically to the flat sort path."""

import numpy as np
import jax.numpy as jnp

from allpathslg_tpu.kmer import count as kcount, kmerize
from allpathslg_tpu.ops import bucket_count


def _table_from(g, counts):
    w = np.stack([np.asarray(x) for x in g])
    c = np.asarray(counts)
    keep = c > 0
    tab = w[:, keep]
    cc = c[keep]
    order = np.lexsort(tab[::-1])
    return tab[:, order], cc[order]


def _oracle(flat):
    skeys, counts, _ = kcount.count_sorted(flat)
    return _table_from(skeys, counts)


def test_grouped_counts_match_flat_sort():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, (400, 60)).astype(np.uint8)
    canon, valid = kmerize.kmer_windows(jnp.asarray(codes), 24)
    flat, _ = kmerize.flatten_kmers(canon, valid, 24)
    ow, oc = _oracle(flat)
    g, counts, _ = bucket_count.count_grouped(flat, tile_rows=2048,
                                              n_buckets=16)
    w, c = _table_from(g, counts)
    np.testing.assert_array_equal(w, ow)
    np.testing.assert_array_equal(c, oc)


def test_grouped_with_heavy_duplication():
    # few distinct keys, huge runs: stresses slab overflow + retry
    rng = np.random.default_rng(1)
    w0 = rng.integers(0, 7, 20000).astype(np.uint32)
    w1 = rng.integers(0, 3, 20000).astype(np.uint32)
    flat = [jnp.asarray(w0), jnp.asarray(w1)]
    ow, oc = _oracle(flat)
    g, counts, _ = bucket_count.count_grouped(flat, tile_rows=1024,
                                              n_buckets=8)
    w, c = _table_from(g, counts)
    np.testing.assert_array_equal(w, ow)
    np.testing.assert_array_equal(c, oc)


def test_grouped_multiword_k96():
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 4, (80, 120)).astype(np.uint8)
    canon, valid = kmerize.kmer_windows(jnp.asarray(codes), 96)
    flat, _ = kmerize.flatten_kmers(canon, valid, 96)
    ow, oc = _oracle(flat)
    g, counts, _ = bucket_count.count_grouped(flat, tile_rows=1024,
                                              n_buckets=8)
    w, c = _table_from(g, counts)
    np.testing.assert_array_equal(w, ow)
    np.testing.assert_array_equal(c, oc)


def test_spectrum_grouped_matches_flat():
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, (512, 80)).astype(np.uint8)
    # some N bases -> invalid windows -> sentinels in the flat key stream
    codes[rng.random(codes.shape) < 0.01] = 4
    spec_f, nu_f = kcount.spectrum_reads(jnp.asarray(codes), 24, 63)
    canon, valid = kmerize.kmer_windows(jnp.asarray(codes), 24)
    flat, _ = kmerize.flatten_kmers(canon, valid, 24)
    N, R, B, S = bucket_count.grouping_plan(int(flat[0].shape[0]),
                                            tile_rows=2048, n_buckets=16)
    words = bucket_count._pad_to(list(flat), N)
    spec_g, nu_g, ok = bucket_count.spectrum_grouped(words, R, B, S, 63)
    assert bool(ok)
    assert int(nu_g) == int(nu_f)
    np.testing.assert_array_equal(np.asarray(spec_g), np.asarray(spec_f))


def test_spectrum_grouped_overflow_flag():
    # one repeated key overflows any slab; ok must be False (not silently wrong)
    flat = [jnp.zeros(4096, jnp.uint32), jnp.zeros(4096, jnp.uint32)]
    N, R, B, S = bucket_count.grouping_plan(4096, tile_rows=1024, n_buckets=8)
    _, _, ok = bucket_count.spectrum_grouped(flat, R, B, S, 63)
    assert not bool(ok)


def test_spectrum_reads_auto_engines(monkeypatch):
    rng = np.random.default_rng(4)
    codes = jnp.asarray(rng.integers(0, 4, (256, 60)).astype(np.uint8))
    spec_f, nu_f = kcount.spectrum_reads(codes, 24, 63)
    monkeypatch.setenv("APLG_COUNT_ENGINE", "bucketed")
    spec_b, nu_b = kcount.spectrum_reads_auto(codes, 24, 63)
    assert int(nu_b) == int(nu_f)
    np.testing.assert_array_equal(np.asarray(spec_b), np.asarray(spec_f))

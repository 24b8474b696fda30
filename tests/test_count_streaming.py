"""count_reads_streaming regimes must all agree with the one-shot count."""

import numpy as np
import jax.numpy as jnp

from allpathslg_tpu.kmer import count as kcount


def _oracle_table(codes, K, quals=None):
    ck = kcount.count_reads(jnp.asarray(codes), K,
                            None if quals is None else jnp.asarray(quals))
    t = kcount.trim_to_host(ck)
    w = np.stack([np.asarray(x) for x in t.words])
    return w, np.asarray(t.counts), (None if t.qsum is None
                                     else np.asarray(t.qsum))


def _as_host(ck):
    t = kcount.trim_to_host(ck)
    w = np.stack([np.asarray(x) for x in t.words])
    return w, np.asarray(t.counts), (None if t.qsum is None
                                     else np.asarray(t.qsum))


def _gen(n=600, L=40, seed=0):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, (n, L)).astype(np.uint8)
    quals = rng.integers(10, 40, (n, L)).astype(np.uint8)
    return codes, quals


def test_incremental_device_merge_matches_oneshot():
    codes, quals = _gen()
    K = 24
    ow, oc, oq = _oracle_table(codes, K, quals)
    # tiny budget -> incremental regime; small groups -> several folds
    ck = kcount.count_reads_streaming(codes, K, quals, batch_size=64,
                                      device_budget_bytes=1,
                                      merge_group=3)
    w, c, q = _as_host(ck)
    np.testing.assert_array_equal(w, ow)
    np.testing.assert_array_equal(c, oc)
    np.testing.assert_array_equal(q, oq)


def test_spill_regime_matches_oneshot():
    codes, quals = _gen(seed=1)
    K = 24
    ow, oc, oq = _oracle_table(codes, K, quals)
    ck = kcount.count_reads_streaming(codes, K, quals, batch_size=64,
                                      device_budget_bytes=1,
                                      merge_group=2,
                                      acc_budget_bytes=1)  # spill every fold
    w, c, q = _as_host(ck)
    np.testing.assert_array_equal(w, ow)
    np.testing.assert_array_equal(c, oc)
    np.testing.assert_array_equal(q, oq)


def test_filters_and_spectrum_consistent_across_regimes():
    codes, quals = _gen(seed=2)
    K = 16
    full_w, full_c, full_q = _oracle_table(codes, K, quals)
    keep = (full_c >= 3) & (full_q >= 50)
    spec_oracle = np.bincount(np.minimum(full_c, 63), minlength=64)
    spec_oracle[0] = 0

    for kw in (dict(device_budget_bytes=1 << 40),
               dict(device_budget_bytes=1, merge_group=3),
               dict(device_budget_bytes=1, merge_group=2,
                    acc_budget_bytes=1)):
        ck, spec = kcount.count_reads_streaming(
            codes, K, quals, batch_size=64, min_count=3, min_qsum=50,
            spectrum_max_freq=63, **kw)
        w, c, q = _as_host(ck)
        np.testing.assert_array_equal(w, full_w[:, keep])
        np.testing.assert_array_equal(c, full_c[keep])
        np.testing.assert_array_equal(np.asarray(spec)[: len(spec_oracle)],
                                      spec_oracle)


def test_no_qual_path():
    codes, _ = _gen(seed=3)
    K = 24
    ow, oc, _ = _oracle_table(codes, K)
    ck = kcount.count_reads_streaming(codes, K, batch_size=64,
                                      device_budget_bytes=1, merge_group=4)
    w, c, q = _as_host(ck)
    assert q is None
    np.testing.assert_array_equal(w, ow)
    np.testing.assert_array_equal(c, oc)

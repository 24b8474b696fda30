"""Hash-bucketed exact join == searchsorted join (ops/join.build_hashed).

The bucketed join replaces the log2(M)-round binary search on the
genome-scale EC hot paths (VERDICT r5: precorrect voting / find_errors
correct are gather-bound); results must be EXACT — identical to
searchsorted_words on every query, present or absent.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from allpathslg_tpu.ops import join


def _mk(M=50_000, Q=200_000, W=3, seed=0, pad_sentinels=True):
    rng = np.random.default_rng(seed)
    tw = [rng.integers(0, 1 << 16, M).astype(np.uint32) for _ in range(W)]
    # sort lexicographically (searchsorted contract)
    order = np.lexsort(tuple(tw[::-1]))
    tw = [w[order] for w in tw]
    # dedup rows so payload lookup is unambiguous between implementations
    rows = np.stack(tw)
    keep = np.ones(M, bool)
    keep[1:] = (rows[:, 1:] != rows[:, :-1]).any(axis=0)
    tw = [w[keep] for w in tw]
    M2 = len(tw[0])
    pay = rng.integers(1, 1 << 20, M2).astype(np.int32)
    if pad_sentinels:
        pad = 1 << 12
        tw = [np.concatenate([w, np.full(pad, 0xFFFFFFFF, np.uint32)])
              for w in tw]
        pay = np.concatenate([pay, np.zeros(pad, np.int32)])
    # half the queries hit, half are random misses
    hit_idx = rng.integers(0, M2, Q // 2)
    qw = [np.concatenate([w[hit_idx],
                          rng.integers(0, 1 << 16, Q - Q // 2)
                          .astype(np.uint32)]) for w in tw]
    return ([jnp.asarray(w) for w in tw], jnp.asarray(pay),
            [jnp.asarray(w) for w in qw])


@pytest.mark.parametrize("W", [1, 2, 3])
def test_hashed_join_matches_searchsorted(W):
    tw, pay, qw = _mk(W=W, seed=W)
    want_pay, want_found = join.lookup_payload(tw, pay, qw, 0)
    hs, ws, ps, bs, shift, H = join.build_hashed(tw, payloads=[pay])
    got_found, got_pay = join.lookup_hashed(hs, bs, ws, qw, shift, H,
                                            payload=ps[0], default=0)
    assert np.array_equal(np.asarray(want_found), np.asarray(got_found))
    assert np.array_equal(np.asarray(want_pay), np.asarray(got_pay))


def test_hashed_membership_no_payload():
    tw, pay, qw = _mk(W=2, seed=9)
    _, want_found = join.searchsorted_words(tw, qw)
    hs, ws, ps, bs, shift, H = join.build_hashed(tw)
    got_found, _ = join.lookup_hashed(hs, bs, ws, qw, shift, H)
    assert np.array_equal(np.asarray(want_found), np.asarray(got_found))


def test_hashed_join_empty_and_tiny():
    tw = [jnp.asarray(np.full(4, 0xFFFFFFFF, np.uint32))]  # all sentinel
    hs, ws, ps, bs, shift, H = join.build_hashed(tw)
    q = [jnp.asarray(np.array([1, 2, 0xFFFFFFFF], np.uint32))]
    found, _ = join.lookup_hashed(hs, bs, ws, q, shift, H)
    assert not np.asarray(found).any()

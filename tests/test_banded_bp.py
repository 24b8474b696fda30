"""Bit-parallel banded DP Pallas kernel vs numpy oracle and jnp reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from allpathslg_tpu.ops import banded
from allpathslg_tpu.ops.pallas import banded_bp

B = 128


def _random_batch(rng, band, Lq=40, Lt=56, ragged=True):
    q = rng.integers(0, 4, (B, Lq)).astype(np.uint8)
    t = rng.integers(0, 4, (B, Lt)).astype(np.uint8)
    # half the batch: targets are mutated copies => realistic diagonals
    for i in range(0, B, 2):
        L = min(Lq, Lt)
        t[i, :L] = q[i, :L]
        for _ in range(int(rng.integers(0, 5))):
            p = int(rng.integers(0, Lt))
            t[i, p] = rng.integers(0, 4)
    ql = (rng.integers(1, Lq + 1, B) if ragged
          else np.full(B, Lq)).astype(np.int32)
    ql[0] = 0  # padding lane
    tl = rng.integers(1, Lt + 1, B).astype(np.int32)
    off = rng.integers(-(Lq + band) - 3, Lt + band + 4, B).astype(np.int32)
    return q, ql, t, tl, off


@pytest.mark.parametrize("band", [1, 4, 8, 15])
def test_matches_oracle(band):
    rng = np.random.default_rng(band)
    q, ql, t, tl, off = _random_batch(rng, band)
    cost, tend = banded_bp.banded_align_bp(
        jnp.asarray(q), jnp.asarray(ql), jnp.asarray(t), jnp.asarray(tl),
        jnp.asarray(off), band=band, interpret=True)
    cost = np.asarray(cost)
    tend = np.asarray(tend)
    for i in range(B):
        want_c, want_e = banded.np_banded_oracle(
            q[i, : ql[i]], t[i, : tl[i]], int(off[i]), band)
        assert cost[i] == want_c, (
            f"lane {i}: cost {cost[i]} != {want_c} "
            f"(band={band} off={off[i]} ql={ql[i]} tl={tl[i]})")
        if want_c < banded_bp.BIG:
            assert tend[i] == want_e, f"lane {i}: tend {tend[i]} != {want_e}"


def test_matches_jnp_reference_batch():
    band = 12
    rng = np.random.default_rng(99)
    q, ql, t, tl, off = _random_batch(rng, band, Lq=70, Lt=90)
    cost, tend = banded_bp.banded_align_bp(
        jnp.asarray(q), jnp.asarray(ql), jnp.asarray(t), jnp.asarray(tl),
        jnp.asarray(off), band=band, interpret=True)
    ref_c, ref_e = banded.banded_align(
        jnp.asarray(q), jnp.asarray(ql), jnp.asarray(t), jnp.asarray(tl),
        jnp.asarray(off), band=band)
    np.testing.assert_array_equal(np.asarray(cost), np.asarray(ref_c))
    feas = np.asarray(cost) < banded_bp.BIG
    np.testing.assert_array_equal(np.asarray(tend)[feas],
                                  np.asarray(ref_e)[feas])


def test_infeasible_offsets_killed():
    band = 6
    q = np.ones((B, 16), np.uint8)
    t = np.ones((B, 20), np.uint8)
    ql = np.full(B, 16, np.int32)
    tl = np.full(B, 20, np.int32)
    off = np.full(B, 10_000, np.int32)  # far outside any feasible window
    cost, tend = banded_bp.banded_align_bp(
        jnp.asarray(q), jnp.asarray(ql), jnp.asarray(t), jnp.asarray(tl),
        jnp.asarray(off), band=band, interpret=True)
    assert int(np.asarray(cost).min()) >= banded_bp.BIG
    assert (np.asarray(tend) == -1).all()


def test_query_longer_than_rows_chunk():
    """Lq > 32 exercises multi-grid-step state carry + word-window advance."""
    band = 9
    rng = np.random.default_rng(7)
    q, ql, t, tl, off = _random_batch(rng, band, Lq=97, Lt=120, ragged=True)
    cost, _ = banded_bp.banded_align_bp(
        jnp.asarray(q), jnp.asarray(ql), jnp.asarray(t), jnp.asarray(tl),
        jnp.asarray(off), band=band, interpret=True)
    cost = np.asarray(cost)
    for i in range(0, B, 7):
        want_c, _ = banded.np_banded_oracle(
            q[i, : ql[i]], t[i, : tl[i]], int(off[i]), band)
        assert cost[i] == want_c, f"lane {i}"

"""Pallas bitonic sort: correctness vs numpy in interpret mode (CPU).

The production counting path uses lax.sort (see ops/pallas/sort_pallas.py
docstring for the measured comparison); this keeps the VMEM formulation
honest.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from allpathslg_tpu.ops.pallas import sort_pallas


@pytest.mark.parametrize("n,trb", [(1000, 4), (1 << 13, 4), (3 << 12, 5)])
def test_sort_two_words_matches_numpy(n, trb):
    rng = np.random.default_rng(n)
    w0 = rng.integers(0, 50, n).astype(np.uint32)  # many duplicate highs
    w1 = rng.integers(0, 2**32, n, dtype=np.uint32)
    s0, s1 = sort_pallas.sort_two_words(
        jnp.asarray(w0), jnp.asarray(w1), tile_r_bits=trb, interpret=True)
    key = (np.asarray(s0).astype(np.uint64) << 32) | np.asarray(s1)
    ref = np.sort((w0.astype(np.uint64) << 32) | w1)
    assert (key == ref).all()


def test_sort_two_words_sentinel_padding():
    # non-power-of-two input: sentinel padding must sort last and be sliced
    rng = np.random.default_rng(7)
    n = 777
    w0 = rng.integers(0, 2**32 - 1, n, dtype=np.uint32)
    w1 = rng.integers(0, 2**32, n, dtype=np.uint32)
    s0, s1 = sort_pallas.sort_two_words(
        jnp.asarray(w0), jnp.asarray(w1), tile_r_bits=4, interpret=True)
    assert s0.shape == (n,)
    key = (np.asarray(s0).astype(np.uint64) << 32) | np.asarray(s1)
    ref = np.sort((w0.astype(np.uint64) << 32) | w1)
    assert (key == ref).all()

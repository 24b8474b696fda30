"""Banded DP vs python oracle and known mutations."""

import numpy as np
import jax.numpy as jnp
import pytest

from allpathslg_tpu.ops import banded
from allpathslg_tpu.eval import sim


def _run(qs, ts, offs, band, Lq=None, Lt=None):
    B = len(qs)
    Lq = Lq or max(len(x) for x in qs)
    Lt = Lt or max(len(x) for x in ts)
    q = np.full((B, Lq), 4, np.uint8)
    t = np.full((B, Lt), 4, np.uint8)
    ql = np.zeros(B, np.int32)
    tl = np.zeros(B, np.int32)
    for i, (a, b) in enumerate(zip(qs, ts)):
        q[i, : len(a)] = a
        t[i, : len(b)] = b
        ql[i], tl[i] = len(a), len(b)
    cost, tend = banded.banded_align(jnp.asarray(q), jnp.asarray(ql),
                                     jnp.asarray(t), jnp.asarray(tl),
                                     jnp.asarray(np.asarray(offs, np.int32)),
                                     band=band)
    return np.asarray(cost), np.asarray(tend)


def test_matches_oracle_random():
    rng = np.random.default_rng(0)
    qs, ts, offs = [], [], []
    for i in range(40):
        lq = rng.integers(5, 60)
        lt = rng.integers(5, 80)
        qs.append(rng.integers(0, 4, lq).astype(np.uint8))
        ts.append(rng.integers(0, 4, lt).astype(np.uint8))
        offs.append(int(rng.integers(-5, 6)))
    cost, tend = _run(qs, ts, offs, band=8)
    for i in range(len(qs)):
        oc, oe = banded.np_banded_oracle(qs[i], ts[i], offs[i], band=8)
        assert cost[i] == oc, (i, cost[i], oc)
        if oc < (1 << 20):
            assert tend[i] == oe or cost[i] == oc  # ties may differ


def test_perfect_and_mutated_substrings():
    rng = np.random.default_rng(1)
    g = sim.random_genome(2000, seed=2)
    qs, ts, offs, want = [], [], [], []
    for i in range(30):
        s = int(rng.integers(0, 1500))
        q = g[s : s + 80].copy()
        t = g[max(0, s - 20) : s + 120]
        # plant mutations
        n_mut = int(rng.integers(0, 4))
        for _ in range(n_mut):
            p = int(rng.integers(0, 80))
            q[p] = (q[p] + 1) % 4
        qs.append(q)
        ts.append(t)
        offs.append(s - max(0, s - 20))
        want.append(n_mut)
    cost, tend = _run(qs, ts, offs, band=10)
    # cost <= planted mutations (mutations may create cheaper indel paths)
    for i in range(30):
        assert cost[i] <= want[i], (i, cost[i], want[i])
        assert cost[i] >= 0


def test_indel_alignment():
    g = sim.random_genome(500, seed=5)
    q = np.concatenate([g[100:140], g[143:180]])  # 3bp deletion in query
    t = g[80:200]
    cost, tend = _run([q], [t], [20], band=8)
    assert cost[0] == 3  # 3 gaps
    q2 = np.concatenate([g[100:140], np.array([0, 1, 2], np.uint8), g[140:180]])
    cost2, _ = _run([q2], [t], [20], band=8)
    assert cost2[0] <= 3


def test_out_of_band_returns_big():
    q = np.zeros(50, np.uint8)
    t = np.full(50, 1, np.uint8)
    # offset far beyond target length
    cost, tend = _run([q], [t], [500], band=4)
    assert cost[0] >= (1 << 20)
    assert tend[0] == -1

"""FillFragments behavior on simulated pairs with known inserts."""

import numpy as np
import jax.numpy as jnp
import pytest

from allpathslg_tpu.asm import fill
from allpathslg_tpu.eval import sim
from allpathslg_tpu.dtypes.reads import string_from_codes


def test_fill_reconstructs_inserts():
    genome = sim.random_genome(30_000, seed=3)
    batch, pairs, truth = sim.simulate_paired_reads(
        genome, coverage=30, error_rate=0.002, insert_mean=180, insert_sd=15,
        seed=4)
    p = np.asarray(pairs.pairs)
    codes = np.asarray(batch.codes)
    quals = np.asarray(batch.quals)
    lens = np.asarray(batch.lengths)
    cfg = fill.FillConfig()
    merged, mq, mlen, ok = fill.fill_pairs(
        jnp.asarray(codes[p[:, 0]]), jnp.asarray(quals[p[:, 0]]),
        jnp.asarray(lens[p[:, 0]]),
        jnp.asarray(codes[p[:, 1]]), jnp.asarray(quals[p[:, 1]]),
        jnp.asarray(lens[p[:, 1]]), cfg, 260)
    ok = np.asarray(ok)
    merged = np.asarray(merged)
    mlen = np.asarray(mlen)
    # fillable = true overlap >= min_overlap (insert <= 2L - min_overlap)
    true_d = (truth.read_starts[p[:, 1]] + 100 - truth.read_starts[p[:, 0]])
    fillable = true_d <= 200 - cfg.min_overlap - 2
    assert ok[fillable].mean() > 0.95, ok[fillable].mean()
    # accepted fills recover the true insert size
    assert (np.asarray(mlen)[ok] == true_d[ok]).mean() > 0.97

    # filled reads must match the genome segment they came from
    n_checked = n_exact = 0
    for i in range(0, len(p), 7):
        if not ok[i]:
            continue
        s = truth.read_starts[p[i, 0]]
        seg = genome[s : s + mlen[i]]
        if len(seg) < mlen[i]:
            continue
        n_checked += 1
        m = merged[i, : mlen[i]]
        mm = (m != seg).sum()
        # allow residual read errors
        if mm <= 3:
            n_exact += 1
    assert n_checked > 50
    assert n_exact > 0.95 * n_checked


def test_fill_rejects_non_overlapping():
    """Jump-sized inserts (3kb) must not fill."""
    genome = sim.random_genome(30_000, seed=5)
    batch, pairs, truth = sim.simulate_paired_reads(
        genome, coverage=5, error_rate=0.002, insert_mean=3000, insert_sd=200,
        seed=6)
    p = np.asarray(pairs.pairs)
    codes = np.asarray(batch.codes)
    quals = np.asarray(batch.quals)
    lens = np.asarray(batch.lengths)
    merged, mq, mlen, ok = fill.fill_pairs(
        jnp.asarray(codes[p[:, 0]]), jnp.asarray(quals[p[:, 0]]),
        jnp.asarray(lens[p[:, 0]]),
        jnp.asarray(codes[p[:, 1]]), jnp.asarray(quals[p[:, 1]]),
        jnp.asarray(lens[p[:, 1]]), fill.FillConfig(), 260)
    assert np.asarray(ok).mean() < 0.05

"""Long-read gap patching on a constructed gap with known truth."""

import numpy as np
import pytest

from allpathslg_tpu.asm import longread
from allpathslg_tpu.eval import sim


@pytest.fixture(scope="module")
def gap_setup():
    genome = sim.random_genome(30_000, seed=60)
    # contigs flank a 1.5kb gap
    c1 = genome[:12_000]
    c2 = genome[13_500:26_000]
    true_patch = genome[12_000:13_500]
    reads, starts, rcs = sim.simulate_long_reads(
        genome, coverage=12, mean_len=6000, error_rate=0.12, seed=61)
    return genome, c1, c2, true_patch, reads


def test_long_read_gap_closure(gap_setup):
    genome, c1, c2, true_patch, reads = gap_setup
    merged = longread.close_gap_with_long_reads(
        c1, c2, gap=1500, dev=60, long_reads=reads)
    assert merged is not None
    # patched length should be near truth (long-read indel noise allowed)
    patch_len = len(merged) - len(c1) - len(c2)
    assert abs(patch_len - 1500) < 350, patch_len
    # the patch is raw long-read sequence (short-read polish cleans it
    # downstream): it must align to the true patch within long-read error
    import jax.numpy as jnp
    from allpathslg_tpu.ops import banded
    patch = merged[len(c1) : len(merged) - len(c2)]
    B = 128
    q = np.full((B, len(patch)), 4, np.uint8)
    t = np.full((B, len(true_patch) + 200), 4, np.uint8)
    q[0, :] = patch
    t[0, : len(true_patch)] = true_patch
    cost, _ = banded.banded_align(
        jnp.asarray(q), jnp.asarray(np.r_[len(patch), np.zeros(B - 1, np.int64)].astype(np.int32)),
        jnp.asarray(t), jnp.asarray(np.r_[len(true_patch), np.zeros(B - 1, np.int64)].astype(np.int32)),
        jnp.asarray(np.zeros(B, np.int32)), band=192)
    c = int(np.asarray(cost)[0])
    assert c < 0.3 * len(true_patch), c
    # nonrandom identity: well below the ~0.75 distance of random sequence
    assert c > 0  # it is noisy, after all


def test_no_close_without_spanning_reads(gap_setup):
    genome, c1, c2, true_patch, reads = gap_setup
    # reads from an unrelated genome must not close the gap
    other = sim.random_genome(30_000, seed=99)
    bad_reads, _, _ = sim.simulate_long_reads(other, coverage=10, seed=100)
    merged = longread.close_gap_with_long_reads(
        c1, c2, gap=1500, dev=60, long_reads=bad_reads)
    assert merged is None

"""Distributed hash-sharded spectrum vs single-device counting (8-dev CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from allpathslg_tpu.dtypes.reads import batch_from_codes
from allpathslg_tpu.kmer import count
from allpathslg_tpu.parallel import mesh as pmesh
from allpathslg_tpu.parallel import dist_count


@pytest.mark.parametrize("K", [24, 96])
def test_distributed_spectrum_matches_single(K):
    rng = np.random.default_rng(0)
    n, L = 64, 120
    codes = rng.integers(0, 4, size=(n, L)).astype(np.uint8)
    lengths = np.full(n, L, dtype=np.int32)
    batch = batch_from_codes(codes, lengths)

    single = np.asarray(count.spectrum(count.count_reads(batch.codes, K), max_freq=63))

    m = pmesh.make_mesh()
    assert m.devices.size == 8
    spec, dropped, words, counts, nu = dist_count.distributed_spectrum(
        m, batch.codes, K, capacity_factor=4.0, max_freq=63)
    assert int(dropped) == 0
    assert (np.asarray(spec) == single).all()
    # every owned kmer lands on its hash shard exactly once
    assert int(np.asarray(nu).sum()) == int(single.sum())


def test_distributed_capacity_overflow_counts_drops():
    K = 24
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=(32, 60)).astype(np.uint8)
    batch = batch_from_codes(codes, np.full(32, 60, np.int32))
    m = pmesh.make_mesh()
    spec, dropped, *_ = dist_count.distributed_spectrum(
        m, batch.codes, K, capacity_factor=0.05, max_freq=63)
    assert int(dropped) > 0

"""Distributed sample sort vs a single global sort (8-way virtual mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from allpathslg_tpu.parallel import mesh as pmesh
from allpathslg_tpu.parallel.sample_sort import sample_sort, SENTINEL


def _run(keys_hi, keys_lo, pay, n_dev=8, **kw):
    m = pmesh.make_mesh(n_devices=n_dev)
    sharding = pmesh.sharded(m)
    words = [jax.device_put(jnp.asarray(keys_hi), sharding),
             jax.device_put(jnp.asarray(keys_lo), sharding)]
    pays = [jax.device_put(jnp.asarray(pay), sharding)]
    sw, sp, n_real, n_drop = sample_sort(m, words, pays, **kw)
    return ([np.asarray(w) for w in sw], [np.asarray(p) for p in sp],
            np.asarray(n_real), int(n_drop))


def test_sample_sort_matches_global_sort():
    rng = np.random.default_rng(0)
    n = 8 * 4096
    hi = rng.integers(0, 1 << 16, n).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    pay = np.arange(n, dtype=np.int32)
    sw, sp, n_real, n_drop = _run(hi, lo, pay)
    assert n_drop == 0
    assert int(n_real.sum()) == n
    # strip sentinels per shard and concatenate in shard order
    got = np.stack(sw + sp)
    mask = ~((sw[0] == 0xFFFFFFFF) & (sw[1] == 0xFFFFFFFF))
    gh, gl, gp = sw[0][mask], sw[1][mask], sp[0][mask]
    order = np.lexsort((pay, lo, hi))
    assert (gh == hi[order]).all()
    assert (gl == lo[order]).all()
    # payloads must follow their keys (stable within equal keys not required
    # across shards; compare the multiset per key instead)
    want_keys = (hi.astype(np.uint64) << 32) | lo
    got_keys = (gh.astype(np.uint64) << 32) | gl
    assert (np.sort(want_keys) == got_keys).all()
    assert (want_keys[gp] == got_keys).all()


def test_sample_sort_skewed_keys():
    # heavy skew: 70% identical key — splitter sampling must not drop data
    rng = np.random.default_rng(1)
    n = 8 * 2048
    hi = np.where(rng.random(n) < 0.7, 42,
                  rng.integers(0, 1 << 20, n)).astype(np.uint32)
    lo = rng.integers(0, 1 << 20, n).astype(np.uint32)
    pay = np.arange(n, dtype=np.int32)
    sw, sp, n_real, n_drop = _run(hi, lo, pay, capacity_factor=4.0)
    assert n_drop == 0
    mask = ~((sw[0] == 0xFFFFFFFF) & (sw[1] == 0xFFFFFFFF))
    got_keys = ((sw[0][mask].astype(np.uint64) << 32) | sw[1][mask])
    want_keys = np.sort((hi.astype(np.uint64) << 32) | lo)
    assert (got_keys == want_keys).all()


def test_sample_sort_overflow_is_counted():
    # capacity too small for extreme skew: drops must be REPORTED
    rng = np.random.default_rng(2)
    n = 8 * 1024
    hi = np.zeros(n, np.uint32)          # all identical → one bucket
    lo = np.zeros(n, np.uint32)
    pay = np.arange(n, dtype=np.int32)
    # capacity below even the local fair share → local bucket overflow
    sw, sp, n_real, n_drop = _run(hi, lo, pay, capacity_factor=0.5)
    assert n_drop > 0
    assert int(n_real.sum()) + n_drop == n

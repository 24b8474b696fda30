"""Hash-sharded distributed k-mer counting — the central multi-chip kernel.

TPU-native replacement for the reference's single-host hash-partitioned
parcels (ref: src/kmers/kmer_parcels/KmerParcelsBuilder.cc,
src/kmers/naif_kmer/NaifKmerizer.cc multi-pass hash blocks): read batches are
data-parallel across the mesh axis; every device kmerizes its shard, routes
each canonical kmer to its owner shard ``hash(kmer) % n`` through a
fixed-capacity `all_to_all`, and owners sort+count their partition. Spectra
merge with `psum`. The owned kmer table stays resident, sharded across HBM.

Fixed-shape routing: per-destination capacity buckets padded with sentinel
keys; overflowed kmers are counted in `dropped` (capacity is sized from
expected balance + slack; hash mixing makes skew binomial, SURVEY.md §7.4).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from allpathslg_tpu.kmer import bits, kmerize
from allpathslg_tpu.kmer import count as kcount
from allpathslg_tpu.ops import sort as ops_sort
from allpathslg_tpu.ops import segmented
from allpathslg_tpu.parallel.mesh import AXIS

SENT = jnp.uint32(0xFFFFFFFF)


def _route_local(flat_words, vmask, n_shards: int, capacity: int):
    """Bucket local kmers by owner shard into [n_shards*capacity] slots."""
    h = bits.hash_words(flat_words)
    owner = (h % jnp.uint32(n_shards)).astype(jnp.int32)
    owner = jnp.where(vmask, owner, n_shards)  # invalid routed past the end
    sowner, spay = ops_sort.sort_by_words([owner.astype(jnp.uint32)], list(flat_words))
    sowner = sowner[0].astype(jnp.int32)
    starts = ops_sort.run_starts([sowner])
    rank = segmented.position_in_run(starts)
    ok = (rank < capacity) & (sowner < n_shards)
    slot = jnp.where(ok, sowner * capacity + rank, n_shards * capacity)
    buf = []
    for w in spay:
        b = jnp.full((n_shards * capacity,), SENT, dtype=jnp.uint32)
        buf.append(b.at[slot].set(w, mode="drop"))
    dropped = jnp.sum((~ok) & (sowner < n_shards))
    return buf, dropped


def _spectrum_step_local(codes_blk, K: int, capacity: int, max_freq: int):
    """Per-shard body (runs under shard_map over AXIS)."""
    n = lax.axis_size(AXIS)
    canon, valid = kmerize.kmer_windows(codes_blk, K)
    flat, vmask = kmerize.flatten_kmers(canon, valid, K)
    buf, dropped = _route_local(flat, vmask, n, capacity)

    # exchange: row i of the reshaped buffer goes to shard i
    recv = [lax.all_to_all(b.reshape(n, capacity), AXIS, 0, 0).reshape(-1)
            for b in buf]
    skeys, counts, starts = kcount.count_sorted(recv)
    ck = kcount.compact_table(skeys, counts, starts)
    spec_local = kcount.spectrum_from_counts(counts, max_freq)
    spec = lax.psum(spec_local, AXIS)
    dropped_tot = lax.psum(dropped, AXIS)
    # per-shard owned table (padded); n_unique as [1] so it shards cleanly
    return (spec, dropped_tot, ck.words, ck.counts, ck.n_unique[None])


def distributed_spectrum(mesh: Mesh, codes, K: int, capacity_factor: float = 2.0,
                        max_freq: int = 255):
    """Count kmers of `codes` (uint8 [N, L], N divisible by mesh size) with
    the kmer table sharded by hash across `mesh`.

    Returns (spectrum [max_freq+1], dropped scalar, table_words, table_counts,
    n_unique_per_shard) — table arrays are globally [n * n * capacity] but
    physically sharded; rows of shard s hold only kmers with hash%n == s.
    """
    n = mesh.devices.size
    N, L = codes.shape
    P_ = L - K + 1
    per_shard = (N // n) * P_
    capacity = int(capacity_factor * per_shard / n) + 16
    capacity = -(-capacity // 8) * 8  # round up to 8

    fn = functools.partial(_spectrum_step_local, K=K, capacity=capacity,
                           max_freq=max_freq)
    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=P(AXIS),
        out_specs=(P(), P(), [P(AXIS)] * bits.n_words(K), P(AXIS), P(AXIS)),
    )
    return mapped(codes)

"""Pallas TPU bitonic sort for 2-word (uint32, uint32) lexicographic keys.

Candidate replacement for `lax.sort` on the k-mer counting hot path (ref:
the OpenMP `ParallelSort` engine behind naif_kmerize,
src/ParallelVecUtilities.h). The kernel keeps whole tiles resident in VMEM
and runs every in-tile stage of the bitonic network in one kernel visit.

MEASURED OUTCOME (v5e, 2^24 elems): 133–164 ms vs `lax.sort` 2-key 41 ms —
the traced-shift `pltpu.roll` + per-stage `lax.cond` dominate; XLA's own
sort is already within ~1.4x of the VPU op-count floor (~30 G ops). Kept as
a correct, tested reference of the VMEM-resident formulation; the
production path stays on `lax.sort` (ops/sort.py).

Index scheme: the virtual sorted index j of N = T * 2^19 elements has bits
[t | c(7) | r(TILE_R_BITS=12)] — t = tile, c = lane, r = row-within-tile.
Element j lives at physical [t*TILE_R + r, c] of a [T*TILE_R, 128] array.
A bitonic stage at distance 2^e therefore needs:

  e < 12        sublane roll within the tile          (in-tile)
  12 <= e < 19  lane roll within the tile             (in-tile)
  e >= 19       tile-pair min/max (pure elementwise)  (one cheap HBM pass)

so ALL O(log^2) fine-grained stages run from VMEM: one `local` kernel visit
sorts levels 1..19 of each tile (190 stages, fori_loop with dynamic-shift
`pltpu.roll`), and each level k > 19 costs (k-19) elementwise cross-tile
passes plus one fused in-tile visit for its remaining 19 stages.

Input order is irrelevant to a sort, so the input is reshaped directly;
only the output pays one transpose back to flat sorted order. Sentinel
padding (all-ones) sorts last, matching kmer/bits.py conventions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
LANE_BITS = 7
TILE_R_BITS = 10            # rows per tile: [2^10, 128] uint32 = 512 KB/word; the
                            # sized so sweep temporaries fit the 16 MB VMEM


def _lex_lt(a0, a1, b0, b1):
    """(a0,a1) < (b0,b1) lexicographic, unsigned."""
    return (a0 < b0) | ((a0 == b0) & (a1 < b1))


def _sweep(w0, w1, jfull, e, k, tile_r_bits):
    """One bitonic compare-exchange stage at distance 2^e, level k.

    jfull: virtual index incl. tile bits [R, 128]. Since in-tile distances
    have e below the tile bits, jfull's low bits serve for the pair-side
    test too. e, k are traced scalars; roll axis resolved with lax.cond.
    """
    R = w0.shape[0]
    d = jnp.left_shift(jnp.int32(1), e)
    up = ((jnp.right_shift(jfull, e)) & 1) == 0  # lower index of the pair

    def partner(x, axis, dd, n):
        # select immediately so only one partner array stays live per word
        return jnp.where(up, pltpu.roll(x, n - dd, axis),   # x[i+d]
                         pltpu.roll(x, dd, axis))           # x[i-d]

    def row_partners():
        return partner(w0, 0, d, R), partner(w1, 0, d, R)

    def lane_partners():
        dl = jnp.right_shift(d, tile_r_bits)
        return partner(w0, 1, dl, LANES), partner(w1, 1, dl, LANES)

    p0, p1 = lax.cond(e < tile_r_bits, row_partners, lane_partners)
    asc = ((jnp.right_shift(jfull, k)) & 1) == 0
    keep_small = up == asc
    take = _lex_lt(p0, p1, w0, w1) == keep_small
    return jnp.where(take, p0, w0), jnp.where(take, p1, w1)


def _local_kernel(w0_ref, w1_ref, o0_ref, o1_ref, *, tile_r_bits,
                  merge_k, n_levels):
    """In-tile stages. merge_k=None: full local sort (levels 1..in_bits);
    merge_k=k: the in-tile tail (stages e=in_bits-1..0) of merge level k."""
    in_bits = tile_r_bits + LANE_BITS
    t = pl.program_id(0)
    R = 1 << tile_r_bits
    r_iota = lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    c_iota = lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    jv = (c_iota << tile_r_bits) + r_iota
    jfull = jv + (t << in_bits)

    w0 = w0_ref[:, :]
    w1 = w1_ref[:, :]

    if merge_k is None:
        def level(k, carry):
            def stage(i, carry):
                w0, w1 = carry
                e = k - 1 - i
                return _sweep(w0, w1, jfull, e, k, tile_r_bits)
            return lax.fori_loop(0, k, stage, carry)
        w0, w1 = lax.fori_loop(1, min(in_bits, n_levels) + 1, level, (w0, w1))
    else:
        k = jnp.int32(merge_k)
        def stage(i, carry):
            w0, w1 = carry
            e = in_bits - 1 - i
            return _sweep(w0, w1, jfull, e, k, tile_r_bits)
        w0, w1 = lax.fori_loop(0, in_bits, stage, (w0, w1))

    o0_ref[:, :] = w0
    o1_ref[:, :] = w1


def _cross_kernel(s0_ref, s1_ref, p0_ref, p1_ref, o0_ref, o1_ref, *,
                  k, e, tile_r_bits):
    """Cross-tile stage at distance 2^e (e >= in-tile bits): elementwise
    lex min/max between a tile and its partner tile."""
    in_bits = tile_r_bits + LANE_BITS
    t = pl.program_id(0)
    sb = e - in_bits
    is_lower = ((t >> sb) & 1) == 0
    asc = ((t >> (k - in_bits)) & 1) == 0
    a0, a1 = s0_ref[:, :], s1_ref[:, :]
    b0, b1 = p0_ref[:, :], p1_ref[:, :]
    mine_lt = _lex_lt(a0, a1, b0, b1)
    keep_mine = mine_lt == (is_lower == asc)
    o0_ref[:, :] = jnp.where(keep_mine, a0, b0)
    o1_ref[:, :] = jnp.where(keep_mine, a1, b1)


def _run_sort(a0, a1, T, tile_r_bits, n_levels, interpret):
    R = 1 << tile_r_bits
    in_bits = tile_r_bits + LANE_BITS
    shape = [jax.ShapeDtypeStruct(a0.shape, a0.dtype)] * 2
    tile_spec = pl.BlockSpec((R, LANES), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)

    def local(a0, a1, merge_k):
        kern = functools.partial(_local_kernel, tile_r_bits=tile_r_bits,
                                 merge_k=merge_k, n_levels=n_levels)
        return pl.pallas_call(
            kern, grid=(T,),
            in_specs=[tile_spec, tile_spec],
            out_specs=[tile_spec, tile_spec],
            out_shape=shape,
            input_output_aliases={0: 0, 1: 1},
            interpret=interpret,
        )(a0, a1)

    def cross(a0, a1, k, e):
        sb = e - in_bits
        kern = functools.partial(_cross_kernel, k=k, e=e,
                                 tile_r_bits=tile_r_bits)
        partner_spec = pl.BlockSpec((R, LANES), lambda t: (t ^ (1 << sb), 0),
                                    memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern, grid=(T,),
            in_specs=[tile_spec, tile_spec, partner_spec, partner_spec],
            out_specs=[tile_spec, tile_spec],
            out_shape=shape,
            interpret=interpret,
        )(a0, a1, a0, a1)

    a0, a1 = local(a0, a1, None)
    for k in range(in_bits + 1, n_levels + 1):
        for e in range(k - 1, in_bits - 1, -1):
            a0, a1 = cross(a0, a1, k, e)
        a0, a1 = local(a0, a1, k)
    return a0, a1


@functools.partial(jax.jit, static_argnames=("tile_r_bits", "interpret"))
def sort_two_words(w0, w1, tile_r_bits: int = TILE_R_BITS,
                   interpret: bool = False):
    """Sort flat (w0, w1) ascending-lexicographic (unstable). Any length;
    pads with the all-ones sentinel, which sorts last."""
    N0 = w0.shape[0]
    in_bits = tile_r_bits + LANE_BITS
    n_levels = max(in_bits, (N0 - 1).bit_length())
    N = 1 << n_levels
    sent = jnp.uint32(0xFFFFFFFF)
    if N != N0:
        a0 = jnp.full((N,), sent, jnp.uint32).at[:N0].set(w0)
        a1 = jnp.full((N,), sent, jnp.uint32).at[:N0].set(w1)
    else:
        a0, a1 = w0, w1
    T = N >> in_bits
    R = 1 << tile_r_bits
    a0 = a0.reshape(T * R, LANES)
    a1 = a1.reshape(T * R, LANES)
    a0, a1 = _run_sort(a0, a1, T, tile_r_bits, n_levels, interpret)
    # physical [t*R + r, c] holds virtual j = (t, c, r): transpose back
    a0 = a0.reshape(T, R, LANES).transpose(0, 2, 1).reshape(-1)
    a1 = a1.reshape(T, R, LANES).transpose(0, 2, 1).reshape(-1)
    return a0[:N0], a1[:N0]

"""Pallas TPU kernel for the batched banded alignment DP.

Same semantics as ops/banded.py (ref: SmithWatBandedA) but engineered for
the TPU memory system:

  * problems across the 128 lanes, band across sublanes;
  * each target is aligned to its diagonal offset INSIDE the kernel, once
    per lane-block: a per-lane log-shift (log2(shift range) lane-masked
    `pltpu.roll`s over the VMEM-resident target block) writes an aligned
    copy to scratch — no HBM gather at all (the previous host-side chunked
    gather dominated end-to-end time ~8x over the DP itself);
  * 8 query rows per grid step (aligned dynamic chunk loads, unrolled in
    python) to amortize grid-step overhead;
  * the within-row horizontal dependency closes in log2(K) min-plus
    doubling steps on the band axis.

Aligned layout: t_al[s, b] = t[b, (s - band) + off_b] (code 5 outside the
target), so tb(row r, slot k) = t_al[(r-1) + k] and for the 8-row group
starting at grid row i: chunk = t_al[8i : 8i + CH], tb(u, k) = chunk[u + k].
The host pads the target left by a static P rows of code 5 so the per-lane
shift s_b = off_b - band + P is non-negative; offsets outside the feasible
window [-(Lq+band), Lt+band] are clamped with t_len forced to -1 (every
band cell then fails the j-bounds mask, preserving cost=BIG semantics).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1 << 20
LANES = 128
ROWS = 8  # default query rows per grid step


def _min_prefix(v, gap_cost, K, ks):
    """out[k] = min_{k'<=k} (v[k'] + (k-k')*gap).

    Downward shifts via pltpu.roll (single sublane rotate, no concat
    relayouts); wrapped-in rows are masked to BIG."""
    x = v - ks * gap_cost
    s = 1
    while s < K:
        shifted = jnp.where(ks >= s, pltpu.roll(x, s, 0), BIG)
        x = jnp.minimum(x, shifted)
        s *= 2
    return x + ks * gap_cost


def _kernel(q_ref, tp_ref, qlen_ref, tlen_ref, off_ref, shift_ref,
            cost_ref, tend_ref, state_ref, result_ref, tal_ref,
            *, Lq, K, CH, band, sub_cost, gap_cost, S, Ltp, shift_bits,
            rows):
    ib = pl.program_id(1)
    n_ib = pl.num_programs(1)
    qlen = qlen_ref[0, :]
    tlen = tlen_ref[0, :]
    off = off_ref[0, :]
    ks = lax.broadcasted_iota(jnp.int32, (K, LANES), 0)

    @pl.when(ib == 0)
    def _init():
        j0 = off[None, :] - band + ks
        row0 = jnp.where((j0 >= 0) & (j0 <= tlen[None, :]), 0, BIG)
        state_ref[:, :] = row0
        result_ref[:, :] = row0  # q_len == 0 answer
        # Align the target block to each lane's diagonal: x[s] <- x[s+sh_b]
        # by lane-masked power-of-two upward rolls. Rows we consume satisfy
        # s + sh < Ltp by construction, so wraparound rows are never read.
        sh = shift_ref[0, :]
        x = tp_ref[:, :]
        for bit in range(shift_bits):
            amt = (1 << bit) % Ltp
            rolled = pltpu.roll(x, Ltp - amt, 0)
            cond = ((sh & (1 << bit)) != 0)[None, :]
            x = jnp.where(cond, rolled, x)
        tal_ref[:, :] = x[0:S, :]

    chunk = tal_ref[pl.ds(pl.multiple_of(ib * rows, rows), CH), :]
    prev = state_ref[:, :]
    result = result_ref[:, :]

    j0 = (ib * rows + 1) + off[None, :] - band + ks
    for u in range(rows):
        r = ib * rows + u + 1
        j = j0 + u
        in_t = (j >= 1) & (j <= tlen[None, :])
        tb = chunk[u : u + K, :].astype(jnp.int32)
        qb = q_ref[u, :].astype(jnp.int32)[None, :]
        sub = jnp.where(tb == qb, 0, sub_cost)

        diag = prev + sub
        up = jnp.where(ks < K - 1, pltpu.roll(prev, K - 1, 0), BIG) + gap_cost
        m = jnp.minimum(diag, up)
        m = jnp.where(in_t, m, BIG)
        m = jnp.where(j == 0, r * gap_cost, m)
        row = jnp.minimum(m, _min_prefix(m, gap_cost, K, ks))
        row = jnp.where(in_t | (j == 0), row, BIG)
        result = jnp.where(qlen[None, :] == r, row, result)
        prev = row

    state_ref[:, :] = prev
    result_ref[:, :] = result

    @pl.when(ib == n_ib - 1)
    def _finish():
        res = result_ref[:, :]
        jf = qlen[None, :] + off[None, :] - band + ks
        ok = (jf >= 0) & (jf <= tlen[None, :])
        vals = jnp.where(ok, res, BIG)
        cost = jnp.min(vals, axis=0)
        is_min = vals == cost[None, :]
        kbest = jnp.min(jnp.where(is_min, ks, K), axis=0)
        t_end = qlen + off - band + kbest
        cost_ref[0, :] = cost
        tend_ref[0, :] = jnp.where(cost < BIG, t_end, -1)


@functools.partial(jax.jit, static_argnames=("band", "sub_cost", "gap_cost",
                                             "interpret", "rows"))
def banded_align_pallas(q, q_len, t, t_len, offset, band: int = 16,
                        sub_cost: int = 1, gap_cost: int = 1,
                        interpret: bool = False, rows: int = ROWS):
    """Drop-in replacement for ops.banded.banded_align (B must be a
    multiple of 128; pad with q_len=0 rows)."""
    B, Lq0 = q.shape
    Lt = t.shape[1]
    K = 2 * band + 1
    assert B % LANES == 0, f"B={B} must be a multiple of {LANES}"
    Lq = ((Lq0 + rows - 1) // rows) * rows
    if Lq != Lq0:
        q = jnp.pad(q, ((0, 0), (0, Lq - Lq0)), constant_values=4)

    CH = rows - 1 + K          # chunk rows needed per row-group
    S = (Lq - rows) + CH       # last chunk start + size
    S = max(S, Lq + 2 * band)
    S = ((S + 7) // 8) * 8

    # Feasible-offset clamp: outside [-(Lq+band), Lt+band] no band cell can
    # land inside the target; clamp the offset (to bound the shift range
    # statically) and kill the problem via t_len = -1.
    off32 = offset.astype(jnp.int32)
    off_min, off_max = -(Lq + band), Lt + band
    bad = (off32 < off_min) | (off32 > off_max)
    offc = jnp.clip(off32, off_min, off_max)
    tl32 = jnp.where(bad, -1, t_len.astype(jnp.int32))

    # Static left pad P makes shift = off - band + P >= 0; the kernel reads
    # aligned rows s in [0, S) from source rows s + shift < Ltp.
    P = Lq + 2 * band
    shift = offc - band + P
    shift_max = Lt + P
    Ltp = ((shift_max + S + 7) // 8) * 8
    shift_bits = max(1, shift_max.bit_length())
    tp = jnp.pad(t.astype(jnp.int32), ((0, 0), (P, Ltp - Lt - P)),
                 constant_values=5)
    tpT = tp.T  # [Ltp, B]

    qT = q.T.astype(jnp.int32)  # [Lq, B]

    grid = (B // LANES, Lq // rows)
    kern = functools.partial(_kernel, Lq=Lq, K=K, CH=CH, band=band,
                             sub_cost=sub_cost, gap_cost=gap_cost,
                             S=S, Ltp=Ltp, shift_bits=shift_bits, rows=rows)
    cost, tend = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda b, i: (i, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ltp, LANES), lambda b, i: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda b, i: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda b, i: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda b, i: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda b, i: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, LANES), lambda b, i: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda b, i: (0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, LANES), jnp.int32),
            pltpu.VMEM((K, LANES), jnp.int32),
            pltpu.VMEM((S, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(qT, tpT, q_len.reshape(1, B).astype(jnp.int32),
      tl32.reshape(1, B),
      offc.reshape(1, B),
      shift.reshape(1, B))
    return cost[0], tend[0]

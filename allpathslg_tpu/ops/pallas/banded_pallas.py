"""Pallas TPU kernel for the batched banded alignment DP.

Same semantics as ops/banded.py (ref: SmithWatBandedA) but engineered for
the TPU memory system:

  * problems across the 128 lanes, band across sublanes;
  * each target is pre-aligned by its diagonal offset ONCE (one [B, S]
    gather, with out-of-range columns baked to a never-matching code), so
    in-kernel the row-r window is simply rows [u, u+K) of an aligned chunk
    — static shifted slices, no gathers, no per-lane indexing;
  * 8 query rows per grid step (aligned dynamic chunk loads, unrolled in
    python) to amortize grid-step overhead;
  * the within-row horizontal dependency closes in log2(K) min-plus
    doubling steps on the band axis.

t_aligned layout: t_al[s, b] = t[b, (s - band) + off_b] (code 5 outside the
target), so tb(row r, slot k) = t_al[(r-1) + k] and for the 8-row group
starting at grid row i: chunk = t_al[8i : 8i + CH], tb(u, k) = chunk[u + k].
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
ROWS = 8  # query rows per grid step


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


def _kernel(q_ref, tal_ref, qlen_ref, tlen_ref, off_ref, cost_ref, tend_ref,
            state_ref, result_ref, *, Lq, K, CH, band, sub_cost, gap_cost):
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

    chunk = tal_ref[pl.ds(pl.multiple_of(ib * ROWS, ROWS), CH), :]
    prev = state_ref[:, :]
    result = result_ref[:, :]

    j0 = (ib * ROWS + 1) + off[None, :] - band + ks
    for u in range(ROWS):
        r = ib * ROWS + u + 1
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
                                             "interpret"))
def banded_align_pallas(q, q_len, t, t_len, offset, band: int = 16,
                        sub_cost: int = 1, gap_cost: int = 1,
                        interpret: bool = False):
    """Drop-in replacement for ops.banded.banded_align (B must be a
    multiple of 128; pad with q_len=0 rows)."""
    B, Lq0 = q.shape
    Lt = t.shape[1]
    K = 2 * band + 1
    assert B % LANES == 0, f"B={B} must be a multiple of {LANES}"
    Lq = ((Lq0 + ROWS - 1) // ROWS) * ROWS
    if Lq != Lq0:
        q = jnp.pad(q, ((0, 0), (0, Lq - Lq0)), constant_values=4)

    CH = ROWS - 1 + K          # chunk rows needed per 8-row group
    S = (Lq - ROWS) + CH       # last chunk start + size
    S = max(S, Lq + 2 * band)
    S = ((S + 7) // 8) * 8

    # t_al[s, b] = t[b, s - band + off_b]; never-matching 5 outside the
    # padded target. Chunked two-level gather: take_along_axis on the TPU
    # minor axis is per-element addressed (~7x slower measured); gathering
    # 32-wide chunks then closing the residual shift with 32 fused selects
    # is bandwidth-bound. Positions beyond t_len may carry real bases here —
    # the kernel's in_t masking (j bounds) makes them inert.
    CHG = 32
    c = offset.astype(jnp.int32) - band
    pad = ((band + CHG - 1) // CHG + 1) * CHG
    Ltp = ((Lt + pad + S + 2 * CHG + CHG - 1) // CHG) * CHG
    tp = jnp.pad(t.astype(jnp.int8), ((0, 0), (pad, Ltp - Lt - pad)),
                 constant_values=5)
    cp = c + pad
    a_ = cp // CHG
    rres = cp % CHG
    nch = Ltp // CHG
    tc = tp.reshape(B, nch, CHG)
    m_ch = S // CHG + 2
    idx = jnp.clip(a_[:, None] + jnp.arange(m_ch, dtype=jnp.int32)[None, :],
                   0, nch - 1)
    gf = jnp.take_along_axis(tc, idx[:, :, None], axis=1).reshape(B, m_ch * CHG)
    acc = jnp.full((B, S), 5, jnp.int8)
    for rr in range(CHG):
        acc = jnp.where((rres == rr)[:, None],
                        lax.dynamic_slice(gf, (0, rr), (B, S)), acc)
    t_al = acc.T

    qT = q.T.astype(jnp.int32)  # [Lq, B]

    grid = (B // LANES, Lq // ROWS)
    kern = functools.partial(_kernel, Lq=Lq, K=K, CH=CH, band=band,
                             sub_cost=sub_cost, gap_cost=gap_cost)
    cost, tend = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, LANES), lambda b, i: (i, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANES), lambda b, i: (0, b), memory_space=pltpu.VMEM),
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
        ],
        interpret=interpret,
    )(qT, t_al, q_len.reshape(1, B).astype(jnp.int32),
      t_len.reshape(1, B).astype(jnp.int32),
      offset.reshape(1, B).astype(jnp.int32))
    return cost[0], tend[0]

"""Bit-parallel banded alignment — Pallas TPU kernel (north-star #2).

Same glocal semantics as ops/banded.py `banded_align` (ref:
src/pairwise_aligners/SmithWatBandedA.{h,cc}) for the unit-cost case
(sub_cost == gap_cost == 1), which is what every call site uses. Where the
general kernel (ops/pallas/banded_pallas.py) spends ~30 VPU ops per band
CELL (log-step min-plus closure per row), this one spends ~40 bitwise ops
per band ROW: the whole K<=32-slot band lives in one uint32 per problem,
Myers-style (Myers 1999; Hyyro 2003 banded variant re-derived for the
diagonal-slot coordinate system — validated exhaustively against the numpy
oracle in scripts/proto_myers.py before this kernel was written).

Formulation (slot k = j - i - off + band, K = 2*band+1 <= 32):
  row values v[k] are delta-encoded: P/M bits k=1..K-1 give
  v[k] - v[k-1] = +1/-1, s0 = v[0]. Row advance i-1 -> i:
    Eq[k] = (q_i == t[j(i,k)])            (0 outside the real target)
    X  = Eq | (M >> 1)                    (diag-or-up improves)
    c  = carries(X + (X | P))             (c[k] == Z[k-1])
    Z  = X | (P & c)                      (Z[k]: new[k] == old[k], i.e. the
                                           diagonal step is free)
    P' = (P & ~(c ^ Z)) | (~P & ~M & c & ~Z)
    M' = (M & ~(c ^ Z)) | (~P & ~M & ~c & Z)
    s0 += 1 - (Z & 1)
  Glocal boundaries come out all-zero: row 0 is P = M = 0, s0 = 0, because
  the target is virtually extended with never-matching sentinels on both
  sides — left-extension cells then equal i exactly (the j=0 deletion
  column) and right-extension cells are provably never read by valid cells.

Layout: problems on the 128 lanes; the target is bit-packed per base code
(4 planes) and aligned to each lane's diagonal offset IN the kernel: pack
first ([Ltp,128] chars -> [Wt,128] uint32 bit-planes), then shift per lane
by sh = off - band + P via masked word rolls (sh >> 5) plus one per-lane
variable-shift funnel (sh & 31) — ~100x less data moved than aligning
chars. 32 query rows per grid step makes the per-row window a STATIC
funnel of two consecutive aligned words (word index == program_id).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1 << 20
LANES = 128
ROWS = 32  # rows per grid step; MUST stay 32 (window word index == ib)

U32 = jnp.uint32


def _pack_planes(tp, Wt):
    """[Ltp, 128] int32 codes -> 4 x [Wt, 128] uint32 bit planes (bit b of
    word w is (tp[32w + b] == sigma); sentinel codes never match)."""
    Ltp = tp.shape[0]
    r = lax.broadcasted_iota(jnp.int32, (Ltp, LANES), 0)
    sh = r & 31
    planes = []
    for sigma in range(4):
        # sum in int32 (Mosaic has no unsigned reductions); the bit
        # positions are disjoint so two's-complement addition == OR
        bits = (tp == sigma).astype(jnp.int32) << sh
        acc = jnp.sum(bits.reshape(Wt, 32, LANES), axis=1, dtype=jnp.int32)
        planes.append(lax.bitcast_convert_type(acc, U32))
    return planes


def _align_plane(bp, ws, bs, Wt, ws_bits):
    """Per-lane bit-stream shift: out word w = bits [32w+sh .. 32w+31+sh]
    of plane `bp`, sh = 32*ws + bs. Word part: masked power-of-2 upward
    rolls; bit part: variable-shift funnel with the next word."""
    x = bp
    for bit in range(ws_bits):
        amt = (1 << bit) % Wt
        rolled = pltpu.roll(x, Wt - amt, 0)
        x = jnp.where(((ws >> bit) & 1) != 0, rolled, x)
    nxt = pltpu.roll(x, Wt - 1, 0)
    hi = jnp.where(bs == 0, U32(0), nxt << jnp.where(bs == 0, U32(0),
                                                     U32(32) - bs))
    return (x >> bs) | hi


def _kernel(q_ref, tp_ref, qlen_ref, tlen_ref, off_ref, shift_ref,
            cost_ref, tend_ref,
            aw0, aw1, aw2, aw3, pv, mv, s0v, rp, rm, rs0,
            *, K, band, Wt, Wa, ws_bits, rows):
    ib = pl.program_id(1)
    n_ib = pl.num_programs(1)
    qlen = qlen_ref[0, :]

    kmask = U32((1 << K) - 1)
    bandmask = U32(((1 << K) - 1) & ~1)

    @pl.when(ib == 0)
    def _init():
        sh = shift_ref[0, :].astype(U32)
        ws = (sh >> 5)[None, :]
        bs = (sh & 31)[None, :]
        planes = _pack_planes(tp_ref[:, :], Wt)
        for ref, bpl in zip((aw0, aw1, aw2, aw3), planes):
            ref[0:Wa, :] = _align_plane(bpl, ws, bs, Wt, ws_bits)[0:Wa, :]
        z = jnp.zeros((1, LANES), U32)
        pv[:, :] = z
        mv[:, :] = z
        rp[:, :] = z
        rm[:, :] = z
        s0v[:, :] = jnp.zeros((1, LANES), jnp.int32)
        rs0[:, :] = jnp.zeros((1, LANES), jnp.int32)

    pair0 = aw0[pl.ds(ib, 2), :]
    pair1 = aw1[pl.ds(ib, 2), :]
    pair2 = aw2[pl.ds(ib, 2), :]
    pair3 = aw3[pl.ds(ib, 2), :]

    P = pv[0, :]
    M = mv[0, :]
    s0 = s0v[0, :]
    resP = rp[0, :]
    resM = rm[0, :]
    resS0 = rs0[0, :]

    for u in range(rows):
        r = ib * rows + (u + 1)  # query row index i
        qc = q_ref[u, :]
        w0 = jnp.where(qc == 0, pair0[0], jnp.where(qc == 1, pair1[0],
                       jnp.where(qc == 2, pair2[0], pair3[0])))
        if u == 0:
            eq = w0
        else:
            w1 = jnp.where(qc == 0, pair0[1], jnp.where(qc == 1, pair1[1],
                           jnp.where(qc == 2, pair2[1], pair3[1])))
            eq = (w0 >> U32(u)) | (w1 << U32(32 - u))
        eq = jnp.where(qc >= 4, U32(0), eq) & kmask

        x = eq | (M >> 1)
        v = x | P
        c = ((x + v) ^ x) ^ v
        z = x | (P & c)
        ncz = ~(c ^ z)
        pm = ~(P | M)
        nz = ~z
        P2 = ((P & ncz) | (pm & c & nz)) & bandmask
        M2 = ((M & ncz) | (pm & ~c & z)) & bandmask
        s0 = s0 + 1 - (z & 1).astype(jnp.int32)
        P, M = P2, M2
        sel = qlen == r
        resP = jnp.where(sel, P, resP)
        resM = jnp.where(sel, M, resM)
        resS0 = jnp.where(sel, s0, resS0)

    pv[0, :] = P
    mv[0, :] = M
    s0v[0, :] = s0
    rp[0, :] = resP
    rm[0, :] = resM
    rs0[0, :] = resS0

    @pl.when(ib == n_ib - 1)
    def _finish():
        tlen = tlen_ref[0, :]
        off = off_ref[0, :]
        ql = qlen_ref[0, :]
        fP = rp[0, :]
        fM = rm[0, :]
        val = rs0[0, :]
        jbase = ql + off - band
        cost = jnp.full((LANES,), BIG, jnp.int32)
        tend = jnp.full((LANES,), -1, jnp.int32)
        for k in range(K):
            if k > 0:
                val = (val + ((fP >> k) & 1).astype(jnp.int32)
                       - ((fM >> k) & 1).astype(jnp.int32))
            jf = jbase + k
            ok = (jf >= 0) & (jf <= tlen)
            cand = jnp.where(ok, val, BIG)
            better = cand < cost
            cost = jnp.where(better, cand, cost)
            tend = jnp.where(better, jf, tend)
        cost_ref[0, :] = cost
        tend_ref[0, :] = jnp.where(cost < BIG, tend, -1)


@functools.partial(jax.jit, static_argnames=("band", "interpret"))
def banded_align_bp(q, q_len, t, t_len, offset, band: int = 15,
                    interpret: bool = False):
    """Bit-parallel drop-in for ops.banded.banded_align at unit costs.

    Requires band <= 15 (K = 2*band+1 <= 31 so the band plus its guard bit
    fits a uint32 word) and B a multiple of 128.
    """
    B, Lq0 = q.shape
    Lt = t.shape[1]
    K = 2 * band + 1
    assert K <= 32, f"band={band} too wide for the bit-parallel kernel"
    assert B % LANES == 0, f"B={B} must be a multiple of {LANES}"
    rows = ROWS
    Lq = ((Lq0 + rows - 1) // rows) * rows
    if Lq != Lq0:
        q = jnp.pad(q, ((0, 0), (0, Lq - Lq0)), constant_values=4)

    # feasible-offset clamp (same contract as banded_pallas)
    off32 = offset.astype(jnp.int32)
    off_min, off_max = -(Lq0 + band), Lt + band
    bad = (off32 < off_min) | (off32 > off_max)
    offc = jnp.clip(off32, off_min, off_max)
    tl32 = jnp.where(bad, -1, t_len.astype(jnp.int32))

    P = Lq + 2 * band              # static left pad => shift >= 0
    shift = offc - band + P
    shift_max = Lt + band - band + P  # offc <= Lt + band
    ws_bits = max(1, (shift_max >> 5).bit_length())
    Wa = ((Lq + K - 2) >> 5) + 2   # aligned words consumed (incl. funnel)
    Ltp = shift_max + 32 * Wa + 32
    Wt = (Ltp + 31) // 32
    Wt = ((Wt + 7) // 8) * 8       # sublane-aligned plane height
    Ltp = 32 * Wt
    tp = jnp.pad(t.astype(jnp.int32), ((0, 0), (P, Ltp - Lt - P)),
                 constant_values=5)

    grid = (B // LANES, Lq // rows)
    kern = functools.partial(_kernel, K=K, band=band, Wt=Wt, Wa=Wa,
                             ws_bits=ws_bits, rows=rows)
    lane_spec = pl.BlockSpec((1, LANES), lambda b, i: (0, b),
                             memory_space=pltpu.VMEM)
    cost, tend = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda b, i: (i, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ltp, LANES), lambda b, i: (0, b),
                         memory_space=pltpu.VMEM),
            lane_spec, lane_spec, lane_spec, lane_spec,
        ],
        out_specs=[lane_spec, lane_spec],
        out_shape=[
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Wa + 8, LANES), U32),  # aw0 (+ funnel guard rows)
            pltpu.VMEM((Wa + 8, LANES), U32),
            pltpu.VMEM((Wa + 8, LANES), U32),
            pltpu.VMEM((Wa + 8, LANES), U32),
            pltpu.VMEM((1, LANES), U32),       # Pv
            pltpu.VMEM((1, LANES), U32),       # Mv
            pltpu.VMEM((1, LANES), jnp.int32),  # s0
            pltpu.VMEM((1, LANES), U32),       # result P
            pltpu.VMEM((1, LANES), U32),       # result M
            pltpu.VMEM((1, LANES), jnp.int32),  # result s0
        ],
        interpret=interpret,
    )(q.T.astype(jnp.int32), tp.T,
      q_len.reshape(1, B).astype(jnp.int32),
      tl32.reshape(1, B), offc.reshape(1, B), shift.reshape(1, B))
    return cost[0], tend[0]

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

Layout (full-VPU): each grid block carries 1024 problems as an [8, 128]
tile — 8 problems down the sublanes x 128 across the lanes — so every
bitwise op in the row loop advances 1024 bands at once. Word-indexed
arrays (target bit-planes) are [n*8, 128] with row w*8 + s. The target is
bit-packed per base code (4 planes) and aligned to each problem's diagonal
IN the kernel: pack first, then shift per problem by sh = off - band + P
via masked 8-row word rolls (sh >> 5) plus one variable-shift funnel
(sh & 31) — ~100x less data moved than aligning chars. 32 query rows per
grid step makes the per-row window a STATIC funnel of two consecutive
aligned words (word index == program_id).
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
SUBS = 8
TILE = SUBS * LANES  # problems per grid block
ROWS = 32  # rows per grid step; MUST stay 32 (window word index == ib)

U32 = jnp.uint32


def _pack_planes(tpb, Wt):
    """[Ltp*8, 128] int32 codes (row t*8+s) -> 4 planes [Wt*8, 128] uint32
    (row w*8+s; bit b of word w is (t[32w+b] == sigma))."""
    n = tpb.shape[0]
    rr = lax.broadcasted_iota(jnp.int32, (n, LANES), 0)
    sh = (rr >> 3) & 31
    planes = []
    for sigma in range(4):
        # sum in int32 (Mosaic has no unsigned reductions); the bit
        # positions are disjoint so two's-complement addition == OR
        bits = (tpb == sigma).astype(jnp.int32) << sh
        acc = jnp.sum(bits.reshape(Wt, 32, SUBS, LANES), axis=1,
                      dtype=jnp.int32)
        planes.append(lax.bitcast_convert_type(acc.reshape(Wt * SUBS, LANES),
                                               U32))
    return planes


def _bcast_words(m, Wt):
    """[8,128] -> [Wt*8,128] repeating per word row-group."""
    return jnp.broadcast_to(m[None], (Wt, SUBS, LANES)).reshape(
        Wt * SUBS, LANES)


def _align_plane(bp, wsf, bsf, Wt, ws_bits):
    """Per-problem bit-stream shift: out word w = bits [32w+sh..32w+31+sh]
    of plane `bp`, sh = 32*ws + bs. Word part: masked power-of-2 8-row
    rolls; bit part: variable-shift funnel with the next word."""
    n = Wt * SUBS
    x = bp
    for bit in range(ws_bits):
        amt = (1 << bit) % Wt
        rolled = pltpu.roll(x, n - SUBS * amt, 0)
        x = jnp.where(((wsf >> bit) & 1) != 0, rolled, x)
    nxt = pltpu.roll(x, n - SUBS, 0)
    hi = jnp.where(bsf == 0, U32(0),
                   nxt << jnp.where(bsf == 0, U32(0), U32(32) - bsf))
    return (x >> bsf) | hi


def _kernel(q_ref, tp_ref, qlen_ref, tlen_ref, off_ref, shift_ref,
            cost_ref, tend_ref,
            aw0, aw1, aw2, aw3, pv, mv, s0v, rp, rm, rs0,
            *, K, band, Wt, Wa, ws_bits, rows):
    ib = pl.program_id(1)
    n_ib = pl.num_programs(1)
    qlen = qlen_ref[:, :]

    kmask = U32((1 << K) - 1)
    bandmask = U32(((1 << K) - 1) & ~1)

    @pl.when(ib == 0)
    def _init():
        sh = lax.bitcast_convert_type(shift_ref[:, :], U32)
        wsf = _bcast_words(sh >> 5, Wt)
        bsf = _bcast_words(sh & 31, Wt)
        planes = _pack_planes(tp_ref[:, :], Wt)
        for ref, bpl in zip((aw0, aw1, aw2, aw3), planes):
            ref[0 : Wa * SUBS, :] = _align_plane(
                bpl, wsf, bsf, Wt, ws_bits)[0 : Wa * SUBS, :]
        z = jnp.zeros((SUBS, LANES), U32)
        pv[:, :] = z
        mv[:, :] = z
        rp[:, :] = z
        rm[:, :] = z
        s0v[:, :] = jnp.zeros((SUBS, LANES), jnp.int32)
        rs0[:, :] = jnp.zeros((SUBS, LANES), jnp.int32)

    pairs = [ref[pl.ds(ib * SUBS, 2 * SUBS), :]
             for ref in (aw0, aw1, aw2, aw3)]

    P = pv[:, :]
    M = mv[:, :]
    s0 = s0v[:, :]
    resP = rp[:, :]
    resM = rm[:, :]
    resS0 = rs0[:, :]

    for u in range(rows):
        r = ib * rows + (u + 1)  # query row index i
        qc = q_ref[u * SUBS : (u + 1) * SUBS, :]
        w0 = jnp.where(qc == 0, pairs[0][0:SUBS],
                       jnp.where(qc == 1, pairs[1][0:SUBS],
                                 jnp.where(qc == 2, pairs[2][0:SUBS],
                                           pairs[3][0:SUBS])))
        if u == 0:
            eq = w0
        else:
            w1 = jnp.where(qc == 0, pairs[0][SUBS:],
                           jnp.where(qc == 1, pairs[1][SUBS:],
                                     jnp.where(qc == 2, pairs[2][SUBS:],
                                               pairs[3][SUBS:])))
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

    pv[:, :] = P
    mv[:, :] = M
    s0v[:, :] = s0
    rp[:, :] = resP
    rm[:, :] = resM
    rs0[:, :] = resS0

    @pl.when(ib == n_ib - 1)
    def _finish():
        tlen = tlen_ref[:, :]
        off = off_ref[:, :]
        ql = qlen_ref[:, :]
        fP = rp[:, :]
        fM = rm[:, :]
        val = rs0[:, :]
        jbase = ql + off - band
        cost = jnp.full((SUBS, LANES), BIG, jnp.int32)
        tend = jnp.full((SUBS, LANES), -1, jnp.int32)
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
        cost_ref[:, :] = cost
        tend_ref[:, :] = jnp.where(cost < BIG, tend, -1)


def _to_tiles(x, G):
    """[B, L] -> [L*8, G*128]: row u*8+s, col g*128+l for p = g*1024+s*128+l."""
    L = x.shape[1]
    return x.reshape(G, SUBS, LANES, L).transpose(3, 1, 0, 2).reshape(
        L * SUBS, G * LANES)


def _scalar_tiles(x, G):
    """[B] -> [8, G*128]."""
    return x.reshape(G, SUBS, LANES).transpose(1, 0, 2).reshape(
        SUBS, G * LANES)


def _from_tiles(x, B):
    """[8, G*128] -> [B]."""
    G = x.shape[1] // LANES
    return x.reshape(SUBS, G, LANES).transpose(1, 0, 2).reshape(B)


def vmem_fits(Lq0: int, Lt: int, band: int,
              budget_bytes: int = 12 << 20) -> bool:
    """Scoped-VMEM estimate for one grid block of this kernel: the whole
    padded target (Ltp columns) sits in VMEM per block. Calibrated
    against the observed r5 OOM: filled-read rescue problems (Lq0=288,
    Lt=304, band=8 -> Ltp=992) allocated 16.23 MB against the 16 MB
    scoped limit — i.e. ~4x the raw t-tile bytes (pipelining buffers).
    Callers must route oversized shapes to the general banded kernel
    (ops/banded.banded_align_auto does)."""
    K = 2 * band + 1
    Lq = ((Lq0 + ROWS - 1) // ROWS) * ROWS
    P = Lq + 2 * band
    shift_max = Lt + P
    Wa = ((Lq + K - 2) >> 5) + 2
    Ltp = shift_max + 32 * Wa + 32
    Ltp = ((Ltp + 31) // 32) * 32
    t_tile = Ltp * SUBS * LANES * 4
    scratches = 4 * (Wa + 2) * SUBS * LANES * 4
    return 4 * t_tile + scratches <= budget_bytes


def prep_operands(q, q_len, t, t_len, offset, band: int):
    """The full pre-pallas prep of banded_align_bp: batch/row padding,
    feasible-offset clamp, target left-pad, and tile transposes. Returns
    (tiled operands tuple, static dims dict). Shared with
    scripts/profile_banded_e2e.py so the measured prep decomposition can
    never drift from the product path (ADVICE r3)."""
    B0, Lq0 = q.shape
    Lt = t.shape[1]
    K = 2 * band + 1
    assert K <= 32, f"band={band} too wide for the bit-parallel kernel"
    B = ((B0 + TILE - 1) // TILE) * TILE
    if B != B0:
        pad = B - B0
        q = jnp.pad(q, ((0, pad), (0, 0)), constant_values=4)
        t = jnp.pad(t, ((0, pad), (0, 0)), constant_values=4)
        q_len = jnp.pad(q_len, (0, pad))
        t_len = jnp.pad(t_len, (0, pad))
        offset = jnp.pad(offset, (0, pad))
    G = B // TILE
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
    shift_max = Lt + P             # offc <= Lt + band
    ws_bits = max(1, (shift_max >> 5).bit_length())
    Wa = ((Lq + K - 2) >> 5) + 2   # aligned words consumed (incl. funnel)
    Ltp = shift_max + 32 * Wa + 32
    Wt = (Ltp + 31) // 32
    Ltp = 32 * Wt
    tp = jnp.pad(t.astype(jnp.int32), ((0, 0), (P, Ltp - Lt - P)),
                 constant_values=5)
    ops = (_to_tiles(q.astype(jnp.int32), G), _to_tiles(tp, G),
           _scalar_tiles(q_len.astype(jnp.int32), G),
           _scalar_tiles(tl32, G), _scalar_tiles(offc, G),
           _scalar_tiles(shift, G))
    dims = dict(B0=B0, B=B, G=G, K=K, Lq=Lq, Wt=Wt, Wa=Wa,
                ws_bits=ws_bits, rows=rows, Ltp=Ltp)
    return ops, dims


@functools.partial(jax.jit, static_argnames=("band", "interpret"))
def banded_align_bp(q, q_len, t, t_len, offset, band: int = 15,
                    interpret: bool = False):
    """Bit-parallel drop-in for ops.banded.banded_align at unit costs.

    Requires band <= 15 (K = 2*band+1 <= 31 so the band plus its guard bit
    fits a uint32 word). Any batch size (padded to 1024 internally).
    """
    ops, dm = prep_operands(q, q_len, t, t_len, offset, band)
    B0, B, G, K = dm["B0"], dm["B"], dm["G"], dm["K"]
    Lq, Wt, Wa, ws_bits, rows, Ltp = (dm["Lq"], dm["Wt"], dm["Wa"],
                                      dm["ws_bits"], dm["rows"], dm["Ltp"])

    grid = (G, Lq // rows)
    kern = functools.partial(_kernel, K=K, band=band, Wt=Wt, Wa=Wa,
                             ws_bits=ws_bits, rows=rows)
    tile_spec = pl.BlockSpec((SUBS, LANES), lambda b, i: (0, b),
                             memory_space=pltpu.VMEM)
    cost, tend = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows * SUBS, LANES), lambda b, i: (i, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ltp * SUBS, LANES), lambda b, i: (0, b),
                         memory_space=pltpu.VMEM),
            tile_spec, tile_spec, tile_spec, tile_spec,
        ],
        out_specs=[tile_spec, tile_spec],
        out_shape=[
            jax.ShapeDtypeStruct((SUBS, G * LANES), jnp.int32),
            jax.ShapeDtypeStruct((SUBS, G * LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM(((Wa + 2) * SUBS, LANES), U32),  # aw0..aw3
            pltpu.VMEM(((Wa + 2) * SUBS, LANES), U32),
            pltpu.VMEM(((Wa + 2) * SUBS, LANES), U32),
            pltpu.VMEM(((Wa + 2) * SUBS, LANES), U32),
            pltpu.VMEM((SUBS, LANES), U32),       # Pv
            pltpu.VMEM((SUBS, LANES), U32),       # Mv
            pltpu.VMEM((SUBS, LANES), jnp.int32),  # s0
            pltpu.VMEM((SUBS, LANES), U32),       # result P
            pltpu.VMEM((SUBS, LANES), U32),       # result M
            pltpu.VMEM((SUBS, LANES), jnp.int32),  # result s0
        ],
        interpret=interpret,
    )(*ops)
    return _from_tiles(cost, B)[:B0], _from_tiles(tend, B)[:B0]

"""Where does the banded-DP end-to-end vs kernel-alone gap go? (VERDICT r2
weak #5 / next #8: bench end-to-end ~16 Gcells/s vs ~110 Gcells/s
kernel-alone; name the difference with measurements, then fix or document.)

Decomposes one bench-shaped batch (B=16384, Lq=100, Lt=140, band=15) into:
  full      — banded_align_bp as the product calls it
  prep      — host-visible XLA prep only: pads + clamp + tile transposes
              (_to_tiles/_scalar_tiles) with the pallas_call skipped
  kern-only — pallas_call on PRE-TILED cached operands (the "kernel alone"
              number; layout transforms excluded)
Each timed as REP chained iterations inside one jitted fori_loop with
loop-varying inputs (same methodology as bench.py — see its docstring).

Prints one JSON line with ms/batch and Gcells/s for the three views.
"""

import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from allpathslg_tpu.ops.pallas import banded_bp as bb

REP = 8
B, Lq, Lt, W = 16384, 100, 140, 15


def sustain(fn, *args):
    @jax.jit
    def many(*a):
        def body(i, tot):
            r = fn(i, *a)
            return tot + r
        return lax.fori_loop(0, REP, body, jnp.int32(0))

    int(many(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        int(many(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / REP


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 4, (B, Lq)).astype(np.uint8))
    t = jnp.asarray(rng.integers(0, 4, (B, Lt)).astype(np.uint8))
    ql = jnp.full((B,), Lq, jnp.int32)
    tl = jnp.full((B,), Lt, jnp.int32)
    off = jnp.asarray(rng.integers(-4, 5, B).astype(np.int32))
    cells = B * Lq * (2 * W + 1)
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.device_kind})", file=sys.stderr, flush=True)

    out = {"B": B, "Lq": Lq, "Lt": Lt, "band": W}

    # ---- full product path
    def full(i, q, ql, t, tl, off):
        c, e = bb.banded_align_bp(q, ql, t, tl, off + (i % 3) - 1, band=W)
        return c.sum() + e.sum()

    dt = sustain(full, q, ql, t, tl, off)
    out["full_ms"] = round(dt * 1e3, 2)
    out["full_gcells_s"] = round(cells / dt / 1e9, 1)

    # ---- the EXACT prep the product path does, stopping before
    # pallas_call (shared helper — cannot drift from banded_align_bp)
    def prep(i, q, ql, t, tl, off):
        ops, _ = bb.prep_operands(q, ql, t, tl, off + (i % 3) - 1, W)
        return sum(o.astype(jnp.int32).sum() for o in ops)

    dt = sustain(prep, q, ql, t, tl, off)
    out["prep_ms"] = round(dt * 1e3, 2)

    # ---- kernel on pre-tiled operands (layout transforms excluded)
    ops0, dm = bb.prep_operands(q, ql, t, tl, off, W)
    K, G, rows = dm["K"], dm["G"], dm["rows"]
    Lqp, Wt, Wa, ws_bits = dm["Lq"], dm["Wt"], dm["Wa"], dm["ws_bits"]
    Ltp = 32 * Wt
    qt, tt, qlt, tlt, offt, shiftt = ops0

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kern = functools.partial(bb._kernel, K=K, band=W, Wt=Wt, Wa=Wa,
                             ws_bits=ws_bits, rows=rows)
    tile_spec = pl.BlockSpec((bb.SUBS, bb.LANES), lambda b, i: (0, b),
                             memory_space=pltpu.VMEM)

    def kern_only(i, qt, tt, qlt, tlt, offt, shiftt):
        cost, tend = pl.pallas_call(
            kern,
            grid=(G, Lqp // rows),
            in_specs=[
                pl.BlockSpec((rows * bb.SUBS, bb.LANES), lambda b, i: (i, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Ltp * bb.SUBS, bb.LANES), lambda b, i: (0, b),
                             memory_space=pltpu.VMEM),
                tile_spec, tile_spec, tile_spec, tile_spec,
            ],
            out_specs=[tile_spec, tile_spec],
            out_shape=[
                jax.ShapeDtypeStruct((bb.SUBS, G * bb.LANES), jnp.int32),
                jax.ShapeDtypeStruct((bb.SUBS, G * bb.LANES), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM(((Wa + 2) * bb.SUBS, bb.LANES), bb.U32),
                pltpu.VMEM(((Wa + 2) * bb.SUBS, bb.LANES), bb.U32),
                pltpu.VMEM(((Wa + 2) * bb.SUBS, bb.LANES), bb.U32),
                pltpu.VMEM(((Wa + 2) * bb.SUBS, bb.LANES), bb.U32),
                pltpu.VMEM((bb.SUBS, bb.LANES), bb.U32),
                pltpu.VMEM((bb.SUBS, bb.LANES), bb.U32),
                pltpu.VMEM((bb.SUBS, bb.LANES), jnp.int32),
                pltpu.VMEM((bb.SUBS, bb.LANES), bb.U32),
                pltpu.VMEM((bb.SUBS, bb.LANES), bb.U32),
                pltpu.VMEM((bb.SUBS, bb.LANES), jnp.int32),
            ],
        )(qt, tt, qlt, tlt, offt + (i % 3) - 1, shiftt + (i % 3) - 1)
        return cost.sum() + tend.sum()

    dt = sustain(kern_only, qt, tt, qlt, tlt, offt, shiftt)
    out["kern_only_ms"] = round(dt * 1e3, 2)
    out["kern_only_gcells_s"] = round(cells / dt / 1e9, 1)
    out["layout_ms"] = round(out["full_ms"] - out["kern_only_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

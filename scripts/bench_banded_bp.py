"""TPU A/B: bit-parallel banded kernel vs general int kernel vs correctness."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from allpathslg_tpu.ops.pallas import banded_bp, banded_pallas

REP = 8


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.device_kind})", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    B, Lq, Lt, W = 16384, 100, 140, 15
    q = jnp.asarray(rng.integers(0, 4, (B, Lq)).astype(np.uint8))
    t = jnp.asarray(rng.integers(0, 4, (B, Lt)).astype(np.uint8))
    ql = jnp.full((B,), Lq, jnp.int32)
    tl = jnp.full((B,), Lt, jnp.int32)
    off = jnp.asarray(rng.integers(-4, 5, B).astype(np.int32))

    # correctness on-device vs the general kernel (same band)
    c1, e1 = banded_bp.banded_align_bp(q, ql, t, tl, off, band=W)
    c2, e2 = banded_pallas.banded_align_pallas(q, ql, t, tl, off, band=W)
    assert (np.asarray(c1) == np.asarray(c2)).all(), "cost mismatch"
    assert (np.asarray(e1) == np.asarray(e2)).all(), "tend mismatch"
    print("on-device parity vs general kernel: OK", flush=True)

    def chained(fn):
        @jax.jit
        def many(q, ql, t, tl, off):
            def body(i, tot):
                c, e = fn(q, ql, t, tl, off + (i % 3) - 1, band=W)
                return tot + c.sum() + e.sum()
            return lax.fori_loop(0, REP, body, jnp.int32(0))
        return many

    for name, fn in (("bitparallel", banded_bp.banded_align_bp),
                     ("general-int", banded_pallas.banded_align_pallas)):
        many = chained(fn)
        int(many(q, ql, t, tl, off))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            int(many(q, ql, t, tl, off))
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / REP
        cells = B * Lq * (2 * W + 1)
        print(f"{name}: {dt*1e3:.2f} ms/batch, {cells/dt/1e9:.1f} Gcells/s, "
              f"{B/dt/1e6:.2f} M alignments/s", flush=True)


if __name__ == "__main__":
    main()

"""Autotune the k-mer counting engine on the current backend and persist
the winner to allpathslg_tpu/kernel_tuning.json (read by kmer/count.py's
spectrum_reads_auto and bench.py).

Run on the real chip:  timeout 1200 python scripts/tune_count.py
Dry (no write):        timeout 1200 python scripts/tune_count.py --dry
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from allpathslg_tpu import tuning
from allpathslg_tpu.kmer import count as kcount, kmerize
from allpathslg_tpu.ops import bucket_count

REP = 8
K = 24
N_READS, READ_LEN = 131072, 150
KMERS = N_READS * (READ_LEN - K + 1)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sustained(name, jfn, *args):
    int(np.asarray(jfn(*args)).ravel()[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        int(np.asarray(jfn(*args)).ravel()[0])
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / REP
    log(f"{name:28s} {dt*1e3:8.2f} ms/batch  {KMERS/dt/1e6:8.1f} Mkmers/s")
    return dt


def main():
    rng = np.random.default_rng(0)
    codes = jnp.asarray(
        rng.integers(0, 4, (N_READS, READ_LEN)).astype(np.uint8))
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.device_kind})")

    @jax.jit
    def flat(codes):
        def body(i, tot):
            c = codes.at[0, 0].set((i % 4).astype(jnp.uint8))
            spec, nu = kcount.spectrum_reads(c, K, 255)
            return tot + nu
        return lax.fori_loop(0, REP, body, jnp.int32(0))

    N, R, B, S = bucket_count.grouping_plan(KMERS)
    log(f"bucketed plan: N={N} R={R} B={B} S={S}")

    @jax.jit
    def bucketed(codes):
        def body(i, carry):
            tot, allok = carry
            c = codes.at[0, 0].set((i % 4).astype(jnp.uint8))
            canon, valid = kmerize.kmer_windows(c, K)
            fw, _ = kmerize.flatten_kmers(canon, valid, K)
            words = bucket_count._pad_to(list(fw), N)
            spec, nu, ok = bucket_count.spectrum_grouped(words, R, B, S, 255)
            return tot + nu, allok & ok
        tot, allok = lax.fori_loop(0, REP, body,
                                   (jnp.int32(0), jnp.bool_(True)))
        return jnp.where(allok, tot, jnp.int32(-1))

    t_flat = sustained("flat lax.sort", flat, codes)
    ok_sum = int(np.asarray(bucketed(codes)).ravel()[0])
    if ok_sum < 0:
        log("bucketed: slab overflow at bench shape -> keeping flat")
        winner = "flat"
        t_b = float("inf")
    else:
        t_b = sustained("bucketed grouping", bucketed, codes)
        winner = "bucketed" if t_b < t_flat else "flat"
    log(f"winner: {winner}  (flat {KMERS/t_flat/1e6:.1f} vs "
        f"bucketed {KMERS/t_b/1e6:.1f} Mkmers/s)")
    if "--dry" not in sys.argv:
        path = tuning.save({"count_engine": winner})
        log(f"wrote {path}")


if __name__ == "__main__":
    main()

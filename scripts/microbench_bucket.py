"""Microbench on the real chip: flat-lax.sort counting vs bucketed grouping
(ops/bucket_count.group_keys) at the bench shape (131072x150 reads, K=24).

timeout 600 python scripts/microbench_bucket.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from allpathslg_tpu.kmer import count as kcount
from allpathslg_tpu.kmer import kmerize, bits
from allpathslg_tpu.ops import bucket_count, sort as ops_sort, segmented

REP = 8
K = 24
n_reads, read_len = 131072, 150
KMERS = n_reads * (read_len - K + 1)


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
    log(f"{name:40s} {dt*1e3:8.2f} ms/batch  {KMERS/dt/1e6:8.1f} Mkmers/s")
    return dt


def main():
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, (n_reads, read_len)).astype(np.uint8))
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.device_kind})")

    @jax.jit
    def flat(codes):
        def body(i, tot):
            c = codes.at[0, 0].set((i % 4).astype(jnp.uint8))
            spec, nu = kcount.spectrum_reads(c, K, 255)
            return tot + nu
        return lax.fori_loop(0, REP, body, jnp.int32(0))

    def make_bucketed(R, B, slack):
        N0 = KMERS
        Rr = R
        N = ((N0 + Rr - 1) // Rr) * Rr
        T = N // Rr
        S = int(np.ceil(N / (B * T) * slack))

        @jax.jit
        def bucketed(codes):
            def body(i, tot):
                c = codes.at[0, 0].set((i % 4).astype(jnp.uint8))
                canon, valid = kmerize.kmer_windows(c, K)
                fw, _ = kmerize.flatten_kmers(canon, valid, K)
                words = bucket_count._pad_to(list(fw), N)
                g, max_run = bucket_count.group_keys(words, Rr, B, S)
                starts = ops_sort.run_starts(g)
                counts = segmented.run_lengths(starts)
                real = ~bits.is_sentinel(g)
                counts = jnp.where(real, counts, 0)
                nu = jnp.sum((counts > 0).astype(jnp.int32))
                return tot + nu + (max_run <= S).astype(jnp.int32)
            return lax.fori_loop(0, REP, body, jnp.int32(0))
        return bucketed, (T, B, S)

    t_flat = sustained("flat lax.sort spectrum_reads", flat, codes)

    cfgs = [(1 << 17, 128, 1.5)]
    if len(sys.argv) > 1 and sys.argv[1] == "all":
        cfgs = [(1 << 16, 128, 1.5), (1 << 17, 256, 1.5),
                (1 << 18, 128, 1.5), (1 << 17, 64, 1.5)]
    for R, B, slack in cfgs:
        fn, (T, B_, S) = make_bucketed(R, B, slack)
        try:
            sustained(f"bucketed R=2^{R.bit_length()-1} B={B_} S={S} T={T}",
                      fn, codes)
        except Exception as e:
            log(f"bucketed R={R} B={B}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()

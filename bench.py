"""Benchmark: canonical k-mer counting throughput per chip (north-star #1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against a single-CPU-socket k-mer counting rate. The
ALLPATHS-LG reference publishes no kernel-level numbers (BASELINE.md); the
binding target is >=10x one CPU socket. We use a KMC2/Jellyfish-class
optimized-CPU-socket rate of 150M canonical kmers/s as the baseline bar,
and also measure this host's own CPU backend running the identical XLA
program (reported to stderr for context).
"""

import json
import sys
import time

import numpy as np

CPU_SOCKET_KMERS_PER_S = 150e6  # KMC2-class optimized CPU socket (BASELINE.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_batch(n_reads, read_len, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 4, size=(n_reads, read_len)).astype(np.uint8)


def time_fn(fn, *args, iters=5):
    """Times with a forced scalar fetch per iteration: under the axon remote
    platform, block_until_ready alone does not reliably await execution."""
    int(fn(*args)[1])  # warmup/compile + sync
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = int(out[1])  # n_unique depends on the whole computation
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from allpathslg_tpu.models.flagship import spectrum_step

    K = 24
    n_reads, read_len = 262144, 150
    kmers_per_batch = n_reads * (read_len - K + 1)
    codes = make_batch(n_reads, read_len)

    dev = jax.devices()[0]
    log(f"bench device: {dev} ({dev.device_kind})")
    x = jax.device_put(jnp.asarray(codes), dev)
    fn = lambda c: spectrum_step(c, K=K, max_freq=255)
    dt = time_fn(fn, x)
    kps = kmers_per_batch / dt
    log(f"TPU: {dt*1e3:.1f} ms/batch, {kps/1e6:.1f} M kmers/s")

    # context: identical program on this host's CPU backend (smaller batch)
    try:
        cpu = jax.devices("cpu")[0]
        codes_cpu = codes[: n_reads // 8]
        with jax.default_device(cpu):
            xc = jax.device_put(jnp.asarray(codes_cpu), cpu)
            dt_cpu = time_fn(lambda c: spectrum_step(c, K=K, max_freq=255), xc, iters=2)
        kps_cpu = codes_cpu.shape[0] * (read_len - K + 1) / dt_cpu
        log(f"host CPU (same XLA program): {kps_cpu/1e6:.1f} M kmers/s")
    except Exception as e:  # CPU backend may be absent under axon
        log(f"cpu reference skipped: {e}")

    print(json.dumps({
        "metric": "canonical_kmer_count_throughput",
        "value": round(kps / 1e6, 2),
        "unit": "Mkmers/s/chip",
        "vs_baseline": round(kps / CPU_SOCKET_KMERS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()

"""Benchmark: canonical k-mer counting throughput per chip (north-star #1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline divides by a MEASURED host-CPU k-mer counting rate: at bench
time we build and run scripts/cpu_kmer_baseline.cpp (KMC2-class canonical
K=24 radix counter) on this host and use its best rate; if the toolchain
is unavailable we fall back to the last committed measurement (42.7 M/s,
docs/counting_baseline.md). The ALLPATHS-LG reference publishes no
kernel-level numbers (BASELINE.md); the full socket-extrapolation and
roofline analysis is in docs/counting_baseline.md.

Timing method: REP iterations of the full count+spectrum program chained
inside ONE jitted fori_loop with iteration-varying input (prevents loop
hoisting). This measures sustained device throughput; per-dispatch sync
through the axon tunnel adds a fixed ~30-50 ms floor that would otherwise
dominate (see .claude/skills/verify/SKILL.md).

stderr also reports the banded-DP alignment kernel rate (north-star #2) and
this host's CPU backend on the identical XLA program for context.
"""

import json
import sys
import time

import numpy as np

CPU_HOST_KMERS_PER_S_FALLBACK = 67e6  # measured 2026-08, docs/counting_baseline.md
REP = 8


def measure_cpu_baseline(timeout_s=120):
    """Build + run the host-CPU canonical-kmer counter; return kmers/s.

    Falls back to the last committed measurement if g++ or the run fails
    (docs/counting_baseline.md records the methodology)."""
    import os
    import subprocess

    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "scripts", "cpu_kmer_baseline.cpp")
    exe = "/tmp/cpu_kmer_baseline_bench"
    try:
        if not os.path.exists(exe):
            subprocess.run(["g++", "-O3", "-march=native", "-pthread",
                            src, "-o", exe],
                           check=True, capture_output=True, timeout=timeout_s)
        # matched shape with the TPU bench batch: 131072 reads x 150 bp
        r = subprocess.run([exe, "131072", "150", "3"], capture_output=True,
                           timeout=timeout_s, text=True)
        best = max(json.loads(line)["mkmers_per_s"]
                   for line in r.stdout.splitlines() if line.startswith("{"))
        log(f"cpu baseline measured on this host: {best:.1f} M kmers/s")
        return best * 1e6, "measured"
    except Exception as e:
        log(f"cpu baseline build/run failed ({e}); using committed "
            f"measurement {CPU_HOST_KMERS_PER_S_FALLBACK/1e6:.1f} M/s")
        return CPU_HOST_KMERS_PER_S_FALLBACK, "committed-measurement"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _probe_device(timeout_s=None):
    """The axon tunnel can wedge if a prior client was SIGKILLed mid-claim;
    probe in a SUBPROCESS with a bounded wait (an in-process probe thread
    would race this process's own jax import for the device claim).
    Claim latency varies 30-250s day to day, so the bound is generous and
    env-tunable (APLG_PROBE_TIMEOUT)."""
    import os
    import subprocess

    if timeout_s is None:
        timeout_s = int(os.environ.get("APLG_PROBE_TIMEOUT", "480"))
    code = ("import jax, jax.numpy as jnp; "
            "assert int(jnp.arange(8).sum()) == 28")
    t0 = time.perf_counter()
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout_s)
        log(f"device probe: rc={r.returncode} in {time.perf_counter()-t0:.0f}s")
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    cpu_fallback = False
    if not _probe_device():
        log("TPU unresponsive after 240s; falling back to CPU backend")
        cpu_fallback = True
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from jax import lax
    from allpathslg_tpu import tuning
    from allpathslg_tpu.kmer import count as kcount, kmerize

    K = 24
    n_reads, read_len = 131072, 150
    if cpu_fallback:
        n_reads = 16384
    kmers_per_batch = n_reads * (read_len - K + 1)
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, (n_reads, read_len)).astype(np.uint8))

    dev = jax.devices()[0]
    engine = tuning.get("count_engine")
    log(f"bench device: {dev} ({dev.device_kind}); count_engine={engine}")

    if engine == "bucketed":
        from allpathslg_tpu.ops import bucket_count

        N, R, Bk, S = bucket_count.grouping_plan(kmers_per_batch)

        @jax.jit
        def many(codes):
            def body(i, carry):
                tot, allok = carry
                c = codes.at[0, 0].set((i % 4).astype(jnp.uint8))
                canon, valid = kmerize.kmer_windows(c, K)
                flat, _ = kmerize.flatten_kmers(canon, valid, K)
                words = bucket_count._pad_to(list(flat), N)
                spec, nu, ok = bucket_count.spectrum_grouped(
                    words, R, Bk, S, 255)
                return tot + nu, allok & ok
            tot, allok = lax.fori_loop(0, REP, body,
                                       (jnp.int32(0), jnp.bool_(True)))
            return tot + jnp.where(allok, 0, 1 << 30)
    else:
        @jax.jit
        def many(codes):
            def body(i, tot):
                c = codes.at[0, 0].set((i % 4).astype(jnp.uint8))
                spec, nu = kcount.spectrum_reads(c, K, 255)
                return tot + nu
            return lax.fori_loop(0, REP, body, jnp.int32(0))

    int(many(codes))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        int(many(codes))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / REP
    kps = kmers_per_batch / dt
    log(f"TPU sustained: {dt*1e3:.1f} ms/batch, {kps/1e6:.1f} M kmers/s")

    # context: banded-DP kernel rate (north-star #2)
    try:
        if cpu_fallback:
            raise RuntimeError("cpu fallback: skipping Pallas kernel bench")
        from allpathslg_tpu.ops.pallas import banded_bp, banded_pallas
        B, Lq, Lt, W = 16384, 100, 140, 15
        q = jnp.asarray(rng.integers(0, 4, (B, Lq)).astype(np.uint8))
        t = jnp.asarray(rng.integers(0, 4, (B, Lt)).astype(np.uint8))
        ql = jnp.full((B,), Lq, jnp.int32)
        tl = jnp.full((B,), Lt, jnp.int32)
        off = jnp.asarray(rng.integers(-4, 5, B).astype(np.int32))

        def sustain_dp(name, align_fn):
            @jax.jit
            def many_dp(q, ql, t, tl, off):
                def body(i, tot):
                    # (i % 3) - 1 keeps the body loop-VARYING so XLA cannot
                    # hoist the kernel out of the fori_loop (a prior `tot&0`
                    # formulation constant-folded, over-reporting ~27%).
                    c, e = align_fn(q, ql, t, tl, off + (i % 3) - 1, band=W)
                    return tot + c.sum() + e.sum()
                return lax.fori_loop(0, REP, body, jnp.int32(0))

            int(many_dp(q, ql, t, tl, off))
            t0 = time.perf_counter()
            int(many_dp(q, ql, t, tl, off))
            ddt = (time.perf_counter() - t0) / REP
            cells = B * Lq * (2 * W + 1)
            log(f"banded-DP {name}: {ddt*1e3:.1f} ms/batch, "
                f"{cells/ddt/1e9:.2f} Gcells/s, "
                f"{B/ddt/1e6:.2f} M alignments/s")

        # bit-parallel kernel = the product path for unit-cost narrow bands
        # (asm/patch, polish, assisted); general int kernel for wide bands
        sustain_dp("bit-parallel", banded_bp.banded_align_bp)
        sustain_dp("general", banded_pallas.banded_align_pallas)
    except Exception as e:
        log(f"banded-DP bench skipped: {e}")

    # aligned read-pairs/s (the other half of the binding metric, ref:
    # src/lookup/QueryLookupTable.cc + AlignPairsToHyper, BASELINE.md):
    # index a simulated 2 Mb contig set, stream read batches through the
    # seed-vote-verify aligner inside one jitted fori_loop
    pairs_per_s = 0.0
    try:
        from allpathslg_tpu.align import lookup as alook
        from allpathslg_tpu.eval import sim

        genome = sim.random_genome(2_000_000, seed=5)
        n_contigs = 16
        cl = len(genome) // n_contigs
        offs = np.arange(n_contigs + 1, dtype=np.int64) * cl
        index = alook.build_index(genome[: offs[-1]], offs, K=24)
        rb, _, _ = sim.simulate_paired_reads(genome, coverage=3.3,
                                             error_rate=0.01, seed=6)
        n_r = (min(rb.n_reads, 65536) // 2) * 2
        rcodes = jnp.asarray(np.asarray(rb.codes)[:n_r])
        rlens = jnp.asarray(np.asarray(rb.lengths)[:n_r])
        acfg = alook.AlignConfig(K=24)
        fb = jnp.asarray(genome[: offs[-1]])

        @jax.jit
        def many_align(codes, lens):
            def body(i, tot):
                c = codes.at[0, 0].set((i % 4).astype(jnp.uint8))
                if index.packed is not None:
                    rid, cc, d, o, okc = alook._candidates_packed(
                        index.hash, index.bucket_starts, index.packed,
                        index.offsets, c, lens, acfg, index.shift)
                else:
                    rid, cc, d, o, okc = alook._candidates(
                        index.hash, index.bucket_starts, index.contig,
                        index.pos, index.is_rc, c, lens, acfg, index.shift)
                NB = c.shape[0]
                _, _, _, _, aligned, _ = alook._vote_and_verify_dense(
                    cc.reshape(NB, -1), d.reshape(NB, -1),
                    o.reshape(NB, -1), okc.reshape(NB, -1),
                    fb, index.offsets, c, lens, acfg)
                return tot + aligned.sum()
            return lax.fori_loop(0, REP, body, jnp.int32(0))

        n_al = int(many_align(rcodes, rlens))
        t0 = time.perf_counter()
        n_al = int(many_align(rcodes, rlens))
        adt = (time.perf_counter() - t0) / REP
        pairs_per_s = (n_r / 2) / adt
        log(f"lookup align: {adt*1e3:.1f} ms/batch of {n_r} reads, "
            f"{n_al/REP/n_r:.2f} aligned frac, "
            f"{pairs_per_s/1e6:.3f} M read-pairs/s")
    except Exception as e:
        log(f"read-pairs bench skipped: {e}")

    cpu_rate, cpu_rate_kind = measure_cpu_baseline()
    print(json.dumps({
        "metric": "canonical_kmer_count_throughput",
        "value": round(kps / 1e6, 2),
        "unit": "Mkmers/s/chip" + ("(cpu-fallback)" if cpu_fallback else ""),
        "vs_baseline": round(kps / cpu_rate, 3),
        "extra": {"aligned_read_pairs_per_s": round(pairs_per_s, 0),
                  "cpu_host_mkmers_s": round(cpu_rate / 1e6, 1),
                  "cpu_baseline_kind": cpu_rate_kind},
    }))


if __name__ == "__main__":
    main()

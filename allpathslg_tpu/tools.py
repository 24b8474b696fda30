"""Standalone utility CLI (ref: SURVEY.md §2.6 standalone tools).

Subcommands mirror the reference's ad-hoc executables:
  stats        read-set statistics                  (ref: FastbStats)
  search       find a query sequence in a FASTA     (ref: SearchFastb2)
  mutate       mutated copy of a reference genome   (ref: MutateReference)
  simulate     simulated paired reads from a FASTA  (ref: paths/simulation)
  kspec        k-mer spectrum + genome size report  (ref: KmerSpectra CLI use)

Usage: python -m allpathslg_tpu.tools <subcommand> [args]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def cmd_stats(args):
    from allpathslg_tpu.io import native_fastq, fasta as fio

    if args.path.endswith((".fastq", ".fq", ".fastq.gz", ".fq.gz")):
        codes, quals, lengths = native_fastq.read_fastq_arrays(args.path)
        lens = lengths
        qmean = float(quals[quals > 0].mean()) if (quals > 0).any() else 0.0
    else:
        recs = fio.read_fasta(args.path)
        lens = np.array([len(s) for _, s in recs])
        qmean = None
    from allpathslg_tpu.eval import stats

    out = {
        "n_reads": int(len(lens)),
        "total_bases": int(lens.sum()),
        "min_len": int(lens.min()) if len(lens) else 0,
        "max_len": int(lens.max()) if len(lens) else 0,
        "mean_len": round(float(lens.mean()), 1) if len(lens) else 0,
        "n50": stats.n50(lens),
    }
    if qmean is not None:
        out["mean_qual"] = round(qmean, 1)
    print(json.dumps(out))


def cmd_search(args):
    from allpathslg_tpu.io import fasta as fio
    from allpathslg_tpu.dtypes.reads import codes_from_string

    recs = fio.read_fasta(args.fasta)
    q = codes_from_string(args.query.upper())
    qs = "".join(map(str, q))
    rqs = "".join(map(str, (3 - q)[::-1]))
    for name, seq in recs:
        hay = "".join(map(str, seq))
        for pat, strand in ((qs, "+"), (rqs, "-")):
            at = hay.find(pat)
            while at >= 0:
                print(f"{name}\t{at}\t{strand}")
                at = hay.find(pat, at + 1)


def cmd_mutate(args):
    from allpathslg_tpu.io import fasta as fio
    from allpathslg_tpu.eval import sim

    recs = fio.read_fasta(args.fasta)
    out = []
    for name, seq in recs:
        out.append((name + "_mut",
                    sim.mutate_genome(seq, args.snp_rate, seed=args.seed)))
    fio.write_fasta(args.out, out)
    print(f"wrote {args.out}")


def cmd_simulate(args):
    from allpathslg_tpu.io import fasta as fio
    from allpathslg_tpu.eval import sim
    from allpathslg_tpu.dtypes.reads import strings_from_batch

    recs = fio.read_fasta(args.fasta)
    genome = np.concatenate([s for _, s in recs])
    batch, pairs, truth = sim.simulate_paired_reads(
        genome, coverage=args.coverage, read_len=args.read_len,
        insert_mean=args.insert, insert_sd=args.insert_sd,
        error_rate=args.error_rate, seed=args.seed)
    codes = np.asarray(batch.codes)
    quals = np.asarray(batch.quals)
    lengths = np.asarray(batch.lengths)
    fio.write_fastq(args.out, ((f"read_{i}", codes[i, : lengths[i]],
                                quals[i, : lengths[i]])
                               for i in range(batch.n_reads)))
    print(f"wrote {batch.n_reads} reads to {args.out}")


def cmd_kspec(args):
    from allpathslg_tpu.io import native_fastq
    from allpathslg_tpu.models.flagship import spectrum_step
    from allpathslg_tpu.kmer import spectrum as kspec
    import jax.numpy as jnp

    codes, quals, lengths = native_fastq.read_fastq_arrays(args.fastq)
    spec, nu = spectrum_step(jnp.asarray(codes), K=args.k, max_freq=255)
    a = kspec.analyze(np.asarray(spec))
    print(json.dumps({
        "k": args.k, "n_distinct": a.n_distinct,
        "genome_size_est": a.genome_size_est,
        "coverage_est": a.coverage_est, "valley": a.valley, "peak": a.peak,
        "frac_repetitive": round(a.frac_repetitive, 4),
    }))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="allpathslg_tpu.tools")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("stats")
    p.add_argument("path")
    p.set_defaults(fn=cmd_stats)

    p = sub.add_parser("search")
    p.add_argument("fasta")
    p.add_argument("query")
    p.set_defaults(fn=cmd_search)

    p = sub.add_parser("mutate")
    p.add_argument("fasta")
    p.add_argument("--out", required=True)
    p.add_argument("--snp-rate", type=float, default=0.001)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_mutate)

    p = sub.add_parser("simulate")
    p.add_argument("fasta")
    p.add_argument("--out", required=True)
    p.add_argument("--coverage", type=float, default=50)
    p.add_argument("--read-len", type=int, default=100)
    p.add_argument("--insert", type=int, default=180)
    p.add_argument("--insert-sd", type=int, default=18)
    p.add_argument("--error-rate", type=float, default=0.005)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_simulate)

    p = sub.add_parser("kspec")
    p.add_argument("fastq")
    p.add_argument("--k", type=int, default=25)
    p.set_defaults(fn=cmd_kspec)

    args = ap.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())

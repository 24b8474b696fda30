"""Flagship jittable steps: the assembler's compute core as pure functions.

An assembler has no "model" in the ML sense; the flagship forward step is the
fused kmerize→canonicalize→sort→count→spectrum program (north-star kernel #1,
ref: src/kmers/naif_kmer/NaifKmerizer.cc), and the multi-chip step is its
hash-sharded version (parallel/dist_count.py) — the analog of a sharded
training step (dp over reads, all_to_all kmer routing, psum spectrum merge).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from allpathslg_tpu.kmer import count as kcount


@functools.partial(jax.jit, static_argnames=("K", "max_freq"))
def spectrum_step(codes: jnp.ndarray, K: int = 24, max_freq: int = 255):
    """Single-chip forward: read batch → (kmer spectrum, n distinct kmers).

    codes: uint8 [N, L] with pad code 4 beyond read ends.
    """
    return kcount.spectrum_reads(codes, K, max_freq)


@functools.partial(jax.jit, static_argnames=("K", "max_freq"))
def spectrum_step_weighted(codes, quals, K: int = 24, max_freq: int = 255):
    """Quality-aware forward used by error correction (strong/weak support)."""
    ck = kcount.count_reads(codes, K, quals)
    spec = kcount.spectrum(ck, max_freq)
    return spec, ck.n_unique, ck.qsum

"""Error-correction behavior tests on simulated reads with known truth."""

import numpy as np
import jax.numpy as jnp
import pytest

from allpathslg_tpu.dtypes.reads import batch_from_codes
from allpathslg_tpu.eval import sim
from allpathslg_tpu.ec import precorrect as pc
from allpathslg_tpu.ec import spectrum_ec as sec


def _simulated(coverage=45, err=0.008, G=20_000, seed=5):
    genome = sim.random_genome(G, seed=seed)
    batch, pairs, truth = sim.simulate_paired_reads(
        genome, coverage=coverage, error_rate=err, seed=seed + 1)
    return genome, batch, truth


def _true_codes(truth, batch):
    """Error-free read codes reconstructed from truth."""
    n, L = batch.codes.shape
    out = np.empty((n, L), dtype=np.uint8)
    g = truth.genome
    for i in range(n):
        s = truth.read_starts[i]
        seg = g[s : s + L]
        out[i] = (3 - seg)[::-1] if truth.read_rc[i] else seg
    return out


def test_precorrect_fixes_most_errors_without_new_ones():
    genome, batch, truth = _simulated()
    codes = np.asarray(batch.codes)
    true = _true_codes(truth, batch)
    err_before = int((codes != true).sum())
    assert err_before > 0

    fixed, n_corr = pc.precorrect(batch.codes, batch.quals)
    fixed = np.asarray(fixed)
    err_after = int((fixed != true).sum())
    # interior band only is correctable (first/last 12 bases lack context)
    interior = slice(12, codes.shape[1] - 12)
    int_before = int((codes[:, interior] != true[:, interior]).sum())
    int_after = int((fixed[:, interior] != true[:, interior]).sum())
    assert int_after < 0.35 * int_before, (int_before, int_after)
    assert err_after <= err_before
    # never introduces errors where the read was correct
    newly_wrong = ((fixed != true) & (codes == true)).sum()
    assert newly_wrong <= max(2, 0.001 * err_before), newly_wrong


def test_spectrum_ec_fixes_remaining_errors():
    genome, batch, truth = _simulated()
    true = _true_codes(truth, batch)
    codes1, _ = pc.precorrect(batch.codes, batch.quals)
    before = int((np.asarray(codes1) != true).sum())

    cfg = sec.SpectrumECConfig(rounds=2)
    codes2, table, n_fixed = sec.find_errors(codes1, batch.quals, cfg)
    after = int((np.asarray(codes2) != true).sum())
    assert n_fixed > 0
    assert after < 0.5 * before, (before, after)
    newly_wrong = ((np.asarray(codes2) != true) & (np.asarray(codes1) == true)).sum()
    assert newly_wrong <= max(2, 0.02 * before), newly_wrong


def test_clean_reads_drops_uncorrectable():
    genome, batch, truth = _simulated(err=0.01)
    cfg = sec.SpectrumECConfig(rounds=2)
    codes1, _ = pc.precorrect(batch.codes, batch.quals)
    codes2, table, _ = sec.find_errors(codes1, batch.quals, cfg)
    codes3, lengths3, n_kept = sec.clean_reads(codes2, batch.lengths, table, cfg)
    n = batch.n_reads
    assert int(n_kept) > 0.8 * n
    # all kept reads: padding beyond length, no drop of pairing rows
    codes3 = np.asarray(codes3)
    lengths3 = np.asarray(lengths3)
    assert codes3.shape[0] == n
    for i in range(0, n, 97):
        assert (codes3[i, lengths3[i]:] == 4).all()


def test_ec_preserves_het_snps():
    """Diploid safety: kmers from a het SNP at ~cov/2 stay strong → untouched."""
    g1 = sim.random_genome(8000, seed=11)
    g2 = sim.mutate_genome(g1, snp_rate=0.002, seed=12)
    b1, _, t1 = sim.simulate_paired_reads(g1, coverage=25, error_rate=0.004, seed=13)
    b2, _, t2 = sim.simulate_paired_reads(g2, coverage=25, error_rate=0.004, seed=14)
    codes = np.concatenate([np.asarray(b1.codes), np.asarray(b2.codes)])
    quals = np.concatenate([np.asarray(b1.quals), np.asarray(b2.quals)])
    lengths = np.concatenate([np.asarray(b1.lengths), np.asarray(b2.lengths)])
    batch = batch_from_codes(codes, lengths, quals)

    true = np.concatenate([_true_codes(t1, b1), _true_codes(t2, b2)])
    c1, _ = pc.precorrect(batch.codes, batch.quals)
    cfg = sec.SpectrumECConfig(rounds=2)
    c2, _, _ = sec.find_errors(c1, batch.quals, cfg)
    # het positions must not be "corrected" to the other haplotype:
    # count positions that were correct pre-EC but wrong after
    newly_wrong = ((np.asarray(c2) != true) & (np.asarray(batch.codes) == true)).sum()
    errs = (np.asarray(batch.codes) != true).sum()
    assert newly_wrong <= max(3, 0.01 * errs), (newly_wrong, errs)


def test_precorrect_global_matches_single_batch():
    # one batch >= all reads: global stacks == in-batch stacks -> identical
    genome, batch, truth = _simulated()
    codes = np.asarray(batch.codes)
    quals = np.asarray(batch.quals)
    fixed_b, n_b = pc.precorrect(batch.codes, batch.quals)
    fixed_g, n_g = pc.precorrect_global(codes, quals,
                                        batch_size=codes.shape[0])
    assert int(n_g) == int(n_b)
    np.testing.assert_array_equal(fixed_g, np.asarray(fixed_b))


def test_precorrect_global_pools_evidence_across_batches():
    # THE genome-scale failure mode: reads split into thin batches starve
    # per-batch stacks below min_winner; global stacks must still vote.
    genome, batch, truth = _simulated(coverage=40, G=8_000, seed=9)
    codes = np.asarray(batch.codes)
    quals = np.asarray(batch.quals)
    true = _true_codes(truth, batch)
    interior = slice(12, codes.shape[1] - 12)
    int_before = int((codes[:, interior] != true[:, interior]).sum())
    assert int_before > 0

    bs = max(8, codes.shape[0] // 16)  # ~2.5x coverage per batch
    per_batch_total = 0
    for s in range(0, codes.shape[0], bs):
        _, k = pc.precorrect(jnp.asarray(codes[s : s + bs]),
                             jnp.asarray(quals[s : s + bs]))
        per_batch_total += int(k)
    fixed_g, n_g = pc.precorrect_global(codes, quals, batch_size=bs)
    int_after = int((fixed_g[:, interior] != true[:, interior]).sum())
    assert n_g > 2 * max(per_batch_total, 1), (n_g, per_batch_total)
    assert int_after < 0.35 * int_before, (int_before, int_after)
    newly_wrong = ((fixed_g != true) & (codes == true)).sum()
    assert newly_wrong <= max(2, 0.001 * int_before), newly_wrong


def test_precorrect_resident_blocked_matches_unblocked():
    """Hash-block pass-1 (the genome-scale spill fix) must produce exactly
    the same corrections as a single global pass: blocks partition the key
    space, so per-block min_count filtering is globally correct."""
    import numpy as np
    from allpathslg_tpu.dtypes.devcache import DeviceBatches
    from allpathslg_tpu.ec import precorrect as pc
    from allpathslg_tpu.eval import sim

    g = sim.random_genome(8000, seed=5)
    b, _, _ = sim.simulate_paired_reads(g, coverage=25, error_rate=0.01,
                                        read_len=60, seed=5)
    codes, quals = np.asarray(b.codes), np.asarray(b.quals)
    cfg = pc.PrecorrectConfig()

    db1 = DeviceBatches.from_host(codes, quals, batch_size=512)
    n1 = pc.precorrect_global_resident(db1, cfg, n_blocks=1)
    out1 = db1.codes_to_host()

    db3 = DeviceBatches.from_host(codes, quals, batch_size=512)
    n3 = pc.precorrect_global_resident(db3, cfg, n_blocks=3)
    out3 = db3.codes_to_host()

    assert n1 == n3 and n1 > 0
    assert (out1 == out3).all()

"""LongProto consensus scoring + iterative refinement (ConsensusScoreModel
analog)."""

import numpy as np

from allpathslg_tpu.long import consensus as lcons


def _noisy(truth, rng, err=0.04):
    seq = truth.copy()
    # substitutions
    m = rng.random(len(seq)) < err
    seq[m] = (seq[m] + rng.integers(1, 4, m.sum())) % 4
    # one indel
    if rng.random() < 0.7 and len(seq) > 20:
        p = int(rng.integers(5, len(seq) - 5))
        if rng.random() < 0.5:
            seq = np.delete(seq, p)
        else:
            seq = np.insert(seq, p, rng.integers(0, 4))
    return seq.astype(np.uint8)


def test_refine_fixes_seed_errors():
    rng = np.random.default_rng(0)
    truth = rng.integers(0, 4, 160).astype(np.uint8)
    reads = [_noisy(truth, rng, err=0.02) for _ in range(12)]
    # corrupt seed: 3 subs + a deletion
    seed = truth.copy()
    seed[30] = (seed[30] + 1) % 4
    seed[80] = (seed[80] + 2) % 4
    seed[120] = (seed[120] + 1) % 4
    seed = np.delete(seed, 60)
    cons, n_edits = lcons.refine_consensus(
        seed, reads, [0] * len(reads),
        lcons.ConsensusConfig(rounds=4))
    assert n_edits > 0
    # refined consensus should be (near-)exactly the truth
    assert len(cons) == len(truth)
    mismatches = int((cons != truth).sum())
    assert mismatches <= 1, mismatches


def test_score_stack_prefers_truth():
    rng = np.random.default_rng(1)
    truth = rng.integers(0, 4, 120).astype(np.uint8)
    reads = [_noisy(truth, rng, err=0.03) for _ in range(10)]
    bad = truth.copy()
    bad[40] = (bad[40] + 1) % 4
    bad = np.delete(bad, 70)
    s_true = lcons.score_stack(truth, reads, [0] * len(reads))
    s_bad = lcons.score_stack(bad, reads, [0] * len(reads))
    assert s_true < s_bad


def test_refine_noop_on_clean_stack():
    rng = np.random.default_rng(2)
    truth = rng.integers(0, 4, 100).astype(np.uint8)
    reads = [truth.copy() for _ in range(8)]
    cons, n_edits = lcons.refine_consensus(truth, reads, [0] * 8)
    np.testing.assert_array_equal(cons, truth)
    assert n_edits == 0

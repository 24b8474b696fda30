"""Iterative conflict-breaking scaffolder + IntDistribution gap MLE
(ref: src/paths/MakeScaffolds*.cc re-derive/break loop and
src/paths/RemodelGaps.cc MLE against IntDistribution)."""

import numpy as np

from allpathslg_tpu.scaffold.links import LinkGraph
from allpathslg_tpu.scaffold import scaffolder
from allpathslg_tpu.utils.intdist import IntDistribution


def _lg(rows, spans=None):
    a, b, oa, ob, n, gm, gs = zip(*rows)
    so = sv = None
    if spans is not None:
        so = np.zeros(len(rows) + 1, np.int64)
        np.cumsum([len(s) for s in spans], out=so[1:])
        sv = np.concatenate([np.asarray(s, np.int64) for s in spans]) \
            if spans else np.zeros(0, np.int64)
    return LinkGraph(np.asarray(a, np.int32), np.asarray(b, np.int32),
                     np.asarray(oa, bool), np.asarray(ob, bool),
                     np.asarray(n, np.int32), np.asarray(gm, float),
                     np.asarray(gs, float), so, sv)


def test_chimeric_link_broken():
    """Round-1 greedy accepts a heavily-weighted chimeric join 0->2 that
    contradicts the (true) layout evidence 0->1->2; the conflict pass must
    break it and the rebuild recovers the true chain."""
    clens = np.asarray([10000, 10000, 10000], np.int64)
    rows = [
        # chimera: strongest single link, gap 100
        (0, 2, False, False, 20, 100.0, 10.0),
        # truth: 0 -> 1 (gap 100) and 1 -> 2 (gap 100)
        (0, 1, False, False, 15, 100.0, 10.0),
        (1, 2, False, False, 15, 100.0, 10.0),
    ]
    lg = _lg(rows)
    # greedy alone: 0->2 accepted first; 1 can only attach inconsistently
    sb1 = scaffolder.make_scaffolds(lg, 3)
    joined1 = {tuple(s.contig_ids) for s in sb1 if s.n_contigs > 1}
    assert any(0 in t and 2 in t and (t.index(2) - t.index(0) == 1
               if 0 in t and 2 in t else False) or t == (0, 2)
               for t in joined1) or (0, 2) in joined1 \
        or any(s.contig_ids[:2] == [0, 2] or s.contig_ids[-2:] == [0, 2]
               for s in sb1)

    sb2, n_broken = scaffolder.make_scaffolds_iterative(lg, 3, clens)
    assert n_broken >= 1
    chains = sorted(tuple(s.contig_ids) for s in sb2 if s.n_contigs > 1)
    # the rebuilt assembly must contain the true adjacency 0-1 and 1-2
    # (as one chain 0,1,2 or its reverse)
    ok = any(t in [(0, 1, 2), (2, 1, 0)] for t in chains)
    assert ok, f"expected true chain, got {chains} (broke {n_broken})"


def test_consistent_links_not_broken():
    clens = np.asarray([5000, 5000, 5000], np.int64)
    rows = [
        (0, 1, False, False, 10, 50.0, 5.0),
        (1, 2, False, False, 10, 50.0, 5.0),
        # spanning link 0->2 consistent with the layout: gap = 50+5000+50
        (0, 2, False, False, 5, 5100.0, 20.0),
    ]
    sb, n_broken = scaffolder.make_scaffolds_iterative(_lg(rows), 3, clens)
    assert n_broken == 0
    chains = [tuple(s.contig_ids) for s in sb if s.n_contigs > 1]
    assert chains and chains[0] in [(0, 1, 2), (2, 1, 0)]


def test_remodel_gaps_mle_beats_inverse_variance():
    """Skewed (asymmetric) insert distribution: the empirical-MLE gap lands
    near the truth while the plain mean-based estimate is biased."""
    rng = np.random.default_rng(0)
    # library: mixture with a long right tail (e.g. 2000 + Exp(800))
    lib = 2000 + rng.exponential(800, 200000).astype(np.int64)
    dist = IntDistribution.from_samples(lib)
    true_gap = 500
    # spanning pairs: insert drawn from lib; span = insert - true_gap
    ins = 2000 + rng.exponential(800, 300).astype(np.int64)
    spans = ins - true_gap
    # naive estimate uses E[lib] - span_i => gap_i; mean biased by tail draws
    naive = float(np.mean(dist.mean() - spans))
    g_mle, ll = dist.mle_gap(spans, true_gap - 600, true_gap + 600)
    assert np.isfinite(ll)
    assert abs(g_mle - true_gap) < abs(naive - true_gap), (g_mle, naive)
    assert abs(g_mle - true_gap) <= 120, g_mle


def test_remodel_gaps_uses_distribution():
    clens = np.asarray([4000, 4000], np.int64)
    rng = np.random.default_rng(1)
    lib = 1000 + rng.exponential(300, 100000).astype(np.int64)
    dist = IntDistribution.from_samples(lib)
    true_gap = 200
    ins = 1000 + rng.exponential(300, 100).astype(np.int64)
    spans = ins - true_gap
    gm = float(np.mean(dist.mean() - spans))
    lg = _lg([(0, 1, False, False, len(spans), gm,
               float(np.std(spans) / np.sqrt(len(spans))))], [spans])
    from allpathslg_tpu.scaffold.superb import Superb
    sb = [Superb([0, 1], [False, False], [int(gm)], [30])]
    out = scaffolder.remodel_gaps(sb, lg, dist)
    assert abs(out[0].gaps[0] - true_gap) <= abs(gm - true_gap) + 1
    assert abs(out[0].gaps[0] - true_gap) <= 100


def test_conflict_tolerance_derived_from_sem_and_layout():
    """The conflict tolerance is slack*sqrt(SEM^2 + crossed-junction
    gap-dev^2) + conflict_slop_bp, NOT a constant times sd*sqrt(n): a
    heavily-sampled spanning link (tiny SEM = 50, n = 40) whose mean
    contradicts the layout by 1500 bp MUST vote the junctions it spans
    down — the old 6*sd*sqrt(n)+86 form (= 1983 here) grew MORE tolerant
    with more pairs and called this consistent."""
    from allpathslg_tpu.scaffold.superb import Superb

    clens = np.asarray([10000, 10000, 10000], np.int64)
    sb = [Superb([0, 1, 2], [False, False, False], [100, 100], [5, 5])]
    rows = [
        (0, 1, False, False, 15, 100.0, 5.0),
        (1, 2, False, False, 15, 100.0, 5.0),
        # layout predicts sep 10100; mean 8600 is 1500 short; tol_new =
        # 6*sqrt(50^2+5^2+5^2)+100 = ~403 -> conflict, outvoting the +15s
        (0, 2, False, False, 40, 8600.0, 50.0),
    ]
    breaks = scaffolder.find_conflicts(
        sb, _lg(rows), clens, scaffolder.ScaffoldConfig())
    assert set(breaks) == {(0, 0), (0, 1)}, breaks


def test_conflict_tolerance_wide_sem_long_jump_tolerated():
    """Same 1500 bp deviation from a sloppy long-jump link (SEM = 400):
    within slack robust-sigmas (tol = 6*sqrt(400^2+50)+100 = ~2500), so
    wide libraries must NOT shatter true scaffolds."""
    from allpathslg_tpu.scaffold.superb import Superb

    clens = np.asarray([10000, 10000, 10000], np.int64)
    sb = [Superb([0, 1, 2], [False, False, False], [100, 100], [5, 5])]
    rows = [
        (0, 1, False, False, 15, 100.0, 5.0),
        (1, 2, False, False, 15, 100.0, 5.0),
        (0, 2, False, False, 40, 8600.0, 400.0),
    ]
    breaks = scaffolder.find_conflicts(
        sb, _lg(rows), clens, scaffolder.ScaffoldConfig())
    assert breaks == [], breaks

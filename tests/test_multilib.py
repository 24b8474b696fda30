"""Multi-library scaffolding: per-pair library inserts in pair_links and
per-library IntDistributions in remodel_gaps (ref: src/PairsManager.h
per-lib stats; src/paths/MakeScaffolds*.cc; VERDICT r2 Next #4).

The oracle genome has three contigs A-B-C with known gaps; a 3 kb library
links A-B and B-C, a 10 kb library links A-C. Per-library handling recovers
every gap; pooling all pairs under one insert demonstrably does not.
"""

import numpy as np
import pytest

from allpathslg_tpu.scaffold import links as slinks
from allpathslg_tpu.scaffold import scaffolder
from allpathslg_tpu.scaffold.superb import Superb
from allpathslg_tpu.utils.intdist import IntDistribution

CLENS = np.array([20_000, 5_000, 20_000], np.int64)
GAP_AB = 400
GAP_BC = 2_000
READ_LEN = 100
LIBS = [(3_000, 150), (10_000, 500)]   # (insert, sd)


def _simulate_alignlets(n_per_lib=400, seed=0):
    """Innie pairs (post jump-EC convention): r1 fwd at insert left end,
    r2 rc with base 0 at the right end; anchors = contig coord of base 0."""
    rng = np.random.default_rng(seed)
    starts = np.array([0, CLENS[0] + GAP_AB,
                       CLENS[0] + GAP_AB + CLENS[1] + GAP_BC])
    ends = starts + CLENS
    total = ends[-1]

    recs = []  # (contig, anchor, is_rc)
    pair_rows, lib_rows = [], []
    for li, (ins, sd) in enumerate(LIBS):
        made = 0
        while made < n_per_lib:
            x = int(rng.integers(0, total - ins - 1))
            insert = int(rng.normal(ins, sd))
            y = x + insert - 1          # genome coord of r2 base 0
            c1 = np.searchsorted(ends, x, side="right")
            c2 = np.searchsorted(ends, y, side="right")
            if c1 >= 3 or c2 >= 3:
                continue
            if not (starts[c1] <= x and x + READ_LEN <= ends[c1]):
                continue
            if not (starts[c2] + READ_LEN <= y + 1 and y < ends[c2]):
                continue
            i1 = len(recs)
            recs.append((c1, x - starts[c1], False))
            recs.append((c2, y - starts[c2], True))
            pair_rows.append((i1, i1 + 1))
            lib_rows.append(li)
            made += 1
    contig = np.array([r[0] for r in recs], np.int32)
    anchor = np.array([r[1] for r in recs], np.int32)
    is_rc = np.array([r[2] for r in recs], bool)
    aligned = np.ones(len(recs), bool)
    pairs = np.array(pair_rows, np.int32)
    lib_ids = np.array(lib_rows, np.int32)
    read_lens = np.full(len(recs), READ_LEN, np.int32)
    return contig, anchor, is_rc, aligned, pairs, lib_ids, read_lens


def _edge_gap(lg, a, b):
    for i in range(lg.n_edges):
        if lg.a[i] == a and lg.b[i] == b and not lg.oa[i] and not lg.ob[i]:
            return float(lg.gap_mean[i]), i
    return None, -1


def test_per_lib_links_recover_gaps():
    c, a, o, ok, pairs, libs, rl = _simulate_alignlets()
    ins = np.array([l[0] for l in LIBS])
    sds = np.array([l[1] for l in LIBS])
    lg = slinks.pair_links(c, a, o, ok, rl, pairs, CLENS, ins, sds,
                           lib_ids=libs)
    g_ab, _ = _edge_gap(lg, 0, 1)
    g_bc, _ = _edge_gap(lg, 1, 2)
    g_ac, _ = _edge_gap(lg, 0, 2)
    assert g_ab is not None and abs(g_ab - GAP_AB) < 60
    assert g_bc is not None and abs(g_bc - GAP_BC) < 60
    # A-C links (10 kb lib) imply the through-B distance
    through = GAP_AB + CLENS[1] + GAP_BC
    assert g_ac is not None and abs(g_ac - through) < 200


def test_pooled_insert_gets_gaps_wrong():
    """The old single-insert path (every pair scored with one pooled
    insert) misestimates gaps by ~the insert difference."""
    c, a, o, ok, pairs, libs, rl = _simulate_alignlets()
    pooled = int(np.mean([l[0] for l in LIBS]))   # 6500
    lg = slinks.pair_links(c, a, o, ok, rl, pairs, CLENS, pooled, 500)
    g_ab, _ = _edge_gap(lg, 0, 1)
    # pooled insert mixes 3 kb and 10 kb pairs under one separation: the
    # A-B gap lands hundreds of bp off (negative, here) or the sane-gap
    # filter drops the edge — either way the result is wrong, where the
    # per-lib path above recovers it within 60 bp
    assert g_ab is None or abs(g_ab - GAP_AB) > 500


def test_remodel_gaps_per_lib_distributions():
    c, a, o, ok, pairs, libs, rl = _simulate_alignlets(n_per_lib=600, seed=3)
    ins = np.array([l[0] for l in LIBS])
    sds = np.array([l[1] for l in LIBS])
    lg = slinks.pair_links(c, a, o, ok, rl, pairs, CLENS, ins, sds,
                           lib_ids=libs)
    # per-lib empirical insert distributions (the .distribs analog)
    rng = np.random.default_rng(9)
    dists = []
    for li, (m, sd) in enumerate(LIBS):
        sample = rng.normal(m, sd, 20_000).astype(np.int64)
        hist = np.bincount(np.maximum(sample, 0))
        dists.append(IntDistribution.from_histogram(hist))
    sb = Superb([0, 1, 2], [False, False, False], [100, 100], [500, 500])
    out = scaffolder.remodel_gaps([sb], lg, dists)[0]
    assert abs(out.gaps[0] - GAP_AB) < 60, out.gaps
    assert abs(out.gaps[1] - GAP_BC) < 60, out.gaps


def test_remodel_mixed_lib_junction_uses_both():
    """A junction whose spans come from two libraries sums per-lib
    log-likelihood grids; scoring lib-1 spans with lib-0's distribution
    (the pooled bug) lands far from truth."""
    c, a, o, ok, pairs, libs, rl = _simulate_alignlets(n_per_lib=600, seed=5)
    ins = np.array([l[0] for l in LIBS])
    sds = np.array([l[1] for l in LIBS])
    lg = slinks.pair_links(c, a, o, ok, rl, pairs, CLENS, ins, sds,
                           lib_ids=libs)
    _, ei = _edge_gap(lg, 0, 2)   # A-C edge: all lib-1 spans
    assert ei >= 0
    spans = lg.spans(ei)
    assert (lg.span_libs(ei) == 1).all()
    rng = np.random.default_rng(11)
    d0 = IntDistribution.from_histogram(np.bincount(np.maximum(
        rng.normal(*LIBS[0], 20_000).astype(np.int64), 0)))
    d1 = IntDistribution.from_histogram(np.bincount(np.maximum(
        rng.normal(*LIBS[1], 20_000).astype(np.int64), 0)))
    through = GAP_AB + CLENS[1] + GAP_BC
    lo, hi = through - 2_000, through + 2_000
    g_right, _ = d1.mle_grid(spans, lo, hi)
    g_wrong, llw = d0.mle_grid(spans, lo, hi)
    assert abs(g_right - through) < 200
    # lib-0 dist pushed to the grid edge (all mass far below these inserts)
    assert llw is None or abs(g_wrong - through) > 1_000 or \
        not np.isfinite(llw).any()


def test_e2e_two_jump_libraries(tmp_path_factory):
    """Full pipeline with a 3 kb + an 8 kb jump library: per-lib insert
    estimates land near truth and scaffolding consumes both."""
    from allpathslg_tpu.pipeline.run import main
    from allpathslg_tpu.pipeline.rundir import RunDir

    rd_path = str(tmp_path_factory.mktemp("e2e_multilib"))
    rc = main(["--run-dir", rd_path, "--sim-genome", "60000",
               "--coverage", "50", "--error-rate", "0.004",
               "--jump-libs", "3000:300:12,8000:800:8",
               "batch_reads=16384"])
    assert rc == 0
    rd = RunDir(rd_path)
    am = rd.metrics("align_jumps")
    means = am.get("lib_insert_means")
    assert means and len(means) == 2
    assert abs(means[0] - 3000) < 450, means
    assert abs(means[1] - 8000) < 1200, means
    da = rd.load_arrays("jump_distribs")
    assert int(da["n_libs"][0]) == 2
    sm = rd.metrics("make_scaffolds")
    assert sm["n_scaffolds"] >= 1
    assert sm["scaffold_total"] > 50_000

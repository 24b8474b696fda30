"""Long-jump second scaffolding pass (ref: src/paths/MakeScaffolds*.cc
later iterations admitting long-jump libraries; VERDICT r2 Next #4).

Oracle: contigs placed on a known genome layout; first-pass scaffolds are
given; long-jump pairs (10 kb inserts) must join the scaffolds in the right
order/orientation with the right junction gap.
"""

import numpy as np

from allpathslg_tpu.scaffold import longjump as slj
from allpathslg_tpu.scaffold.superb import Superb

READ_LEN = 100
INSERT, SD = 10_000, 400


def _genome_layout(placements, clens):
    """placements: list of (contig id, rc) in genome order with gaps
    interleaved: [c, gap, c, gap, ...]. Returns starts/ends arrays."""
    starts, ends, ids, rcs = [], [], [], []
    at = 0
    for item in placements:
        if isinstance(item, int):
            at += item
            continue
        cid, rc = item
        starts.append(at)
        ends.append(at + int(clens[cid]))
        ids.append(cid)
        rcs.append(rc)
        at += int(clens[cid])
    return (np.asarray(starts), np.asarray(ends), np.asarray(ids),
            np.asarray(rcs), at)


def _simulate_long_jump_alignlets(placements, clens, n=500, seed=1):
    starts, ends, ids, rcs, total = _genome_layout(placements, clens)
    rng = np.random.default_rng(seed)
    recs, pair_rows = [], []

    def place(x, read_rc):
        k = np.searchsorted(ends, x, side="right")
        if k >= len(ids) or x < starts[k]:
            return None
        cid = int(ids[k])
        if not rcs[k]:
            return (cid, x - starts[k], read_rc)
        return (cid, ends[k] - 1 - x, not read_rc)

    made = 0
    while made < n:
        x = int(rng.integers(0, total - INSERT - 1))
        y = x + int(rng.normal(INSERT, SD)) - 1
        if y >= total:
            continue
        p1 = place(x, False)
        p2 = place(y, True)
        if p1 is None or p2 is None:
            continue
        i1 = len(recs)
        recs.append(p1)
        recs.append(p2)
        pair_rows.append((i1, i1 + 1))
        made += 1
    contig = np.array([r[0] for r in recs], np.int32)
    anchor = np.array([r[1] for r in recs], np.int32)
    is_rc = np.array([r[2] for r in recs], bool)
    aligned = np.ones(len(recs), bool)
    pairs = np.array(pair_rows, np.int32)
    read_lens = np.full(len(recs), READ_LEN, np.int32)
    return contig, anchor, is_rc, aligned, pairs, read_lens


def test_long_jump_joins_two_scaffolds_with_gap():
    clens = np.array([8000, 6000, 7000, 9000], np.int64)
    # genome: [c0 +] 300 [c1 +]   1500   [c2 +] 250 [c3 +]
    placements = [(0, False), 300, (1, False), 1500,
                  (2, False), 250, (3, False)]
    scaffolds = [Superb([0, 1], [False, False], [300], [30]),
                 Superb([2, 3], [False, False], [250], [25])]
    al = _simulate_long_jump_alignlets(placements, clens)
    out, m = slj.long_jump_pass(scaffolds, clens, *al[:4], al[5], al[4],
                                INSERT, SD)
    assert m["n_joins"] == 1, m
    assert len(out) == 1
    sb = out[0]
    order = list(sb.contig_ids)
    assert order in ([0, 1, 2, 3], [3, 2, 1, 0]), order
    if order == [0, 1, 2, 3]:
        assert sb.rc == [False] * 4
        gaps = sb.gaps
    else:
        assert sb.rc == [True] * 4
        gaps = sb.gaps[::-1]
    assert gaps[0] == 300 and gaps[2] == 250          # inner gaps preserved
    assert abs(gaps[1] - 1500) < 350, gaps            # junction gap ~ truth


def test_long_jump_joins_rc_scaffold():
    clens = np.array([9000, 8000], np.int64)
    # genome: [c0 +] 1200 [c1 -]  — c1's stored sequence is the rc of its
    # genome segment, and its first-pass scaffold records it forward
    placements = [(0, False), 1200, (1, True)]
    scaffolds = [Superb([0], [False], [], []),
                 Superb([1], [False], [], [])]
    al = _simulate_long_jump_alignlets(placements, clens, seed=3)
    out, m = slj.long_jump_pass(scaffolds, clens, *al[:4], al[5], al[4],
                                INSERT, SD)
    assert m["n_joins"] == 1, m
    sb = out[0]
    assert sorted(sb.contig_ids) == [0, 1]
    i0 = sb.contig_ids.index(0)
    i1 = sb.contig_ids.index(1)
    # orientation: c1 must be flipped relative to c0
    assert sb.rc[i0] != sb.rc[i1]
    assert abs(sb.gaps[0] - 1200) < 350, sb.gaps


def test_contig_placements_roundtrip():
    clens = np.array([100, 200, 300], np.int64)
    sbs = [Superb([2, 0], [True, False], [50], [5]),
           Superb([1], [False], [], [])]
    sid, soff, src, slen = slj.contig_placements(sbs, clens)
    assert sid.tolist() == [0, 1, 0]
    assert soff[2] == 0 and soff[0] == 350 and soff[1] == 0
    assert src[2] and not src[0]
    assert slen.tolist() == [450, 200]


def test_e2e_pipeline_with_long_jump_library(tmp_path_factory):
    """Full pipeline with a regular 3 kb jump plus a 12 kb long-jump
    library: the second scaffolding pass runs, aligns the long jumps and
    does not regress the scaffold N50."""
    from allpathslg_tpu.pipeline.run import main
    from allpathslg_tpu.pipeline.rundir import RunDir

    rd_path = str(tmp_path_factory.mktemp("e2e_longjump"))
    rc = main(["--run-dir", rd_path, "--sim-genome", "50000",
               "--coverage", "45", "--error-rate", "0.004",
               "--jump-libs", "3000:300:12",
               "--long-jump-libs", "12000:1200:8",
               "batch_reads=16384"])
    assert rc == 0
    rd = RunDir(rd_path)
    lm = rd.metrics("long_jump_scaffolds")
    assert "skipped" not in lm, lm
    assert lm["n_aligned"] > 0
    sm = rd.metrics("make_scaffolds")
    assert lm["scaffold_n50"] >= sm["scaffold_n50"], (lm, sm)
    assert lm["n_scaffolds_out"] <= lm["n_scaffolds_in"]

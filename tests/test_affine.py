"""Affine-gap banded DP + traceback vs oracles (ref: SmithWatAffine,
PackAlign)."""

import numpy as np
import jax.numpy as jnp

from allpathslg_tpu.ops import affine
from allpathslg_tpu.align import packalign


def _batch(qs, ts, offs, Lq=None, Lt=None):
    B = len(qs)
    Lq = Lq or max(len(x) for x in qs)
    Lt = Lt or max(len(x) for x in ts)
    q = np.full((B, Lq), 4, np.uint8)
    t = np.full((B, Lt), 4, np.uint8)
    ql = np.zeros(B, np.int32)
    tl = np.zeros(B, np.int32)
    for i, (a, b) in enumerate(zip(qs, ts)):
        q[i, : len(a)] = a
        t[i, : len(b)] = b
        ql[i] = len(a)
        tl[i] = len(b)
    return (jnp.asarray(q), jnp.asarray(ql), jnp.asarray(t), jnp.asarray(tl),
            jnp.asarray(np.asarray(offs, np.int32)))


def test_device_matches_oracle_random():
    rng = np.random.default_rng(7)
    qs, ts, offs = [], [], []
    for _ in range(40):
        lt = int(rng.integers(20, 60))
        t = rng.integers(0, 4, lt).astype(np.uint8)
        s = int(rng.integers(0, max(lt - 15, 1)))
        e = int(rng.integers(s + 10, min(s + 40, lt) + 1))
        q = t[s:e].copy()
        # mutate: subs + an indel
        for _ in range(int(rng.integers(0, 3))):
            q[rng.integers(0, len(q))] = rng.integers(0, 4)
        if rng.random() < 0.5 and len(q) > 12:
            p = int(rng.integers(2, len(q) - 2))
            if rng.random() < 0.5:
                q = np.delete(q, slice(p, p + int(rng.integers(1, 3))))
            else:
                ins = rng.integers(0, 4, int(rng.integers(1, 3))).astype(np.uint8)
                q = np.concatenate([q[:p], ins, q[p:]])
        qs.append(q)
        ts.append(t)
        offs.append(s)
    band = 8
    args = _batch(qs, ts, offs)
    cost, tend = affine.affine_banded_align(*args, band=band)
    cost = np.asarray(cost)
    tend = np.asarray(tend)
    for i in range(len(qs)):
        oc, oe = affine.np_affine_oracle(qs[i], ts[i], offs[i], band)
        assert int(cost[i]) == oc, (i, int(cost[i]), oc)
        if oc < (1 << 20):
            # cost at the reported end must equal the optimum
            assert int(tend[i]) >= 0


def test_affine_prefers_one_gap_run():
    # a 3-base deletion: affine gives open + 3*ext; unit-cost would give 3
    rng = np.random.default_rng(3)
    t = rng.integers(0, 4, 50).astype(np.uint8)
    q = np.concatenate([t[:20], t[23:]])
    args = _batch([q], [t], [0])
    cost, _ = affine.affine_banded_align(*args, band=6, sub_cost=3,
                                         gap_open=4, gap_ext=1)
    assert int(cost[0]) == 4 + 3 * 1


def test_path_traceback_roundtrip():
    rng = np.random.default_rng(11)
    for trial in range(30):
        lt = int(rng.integers(30, 80))
        t = rng.integers(0, 4, lt).astype(np.uint8)
        s = int(rng.integers(0, 10))
        q = t[s : s + int(rng.integers(15, lt - s))].copy()
        for _ in range(int(rng.integers(0, 3))):
            q[rng.integers(0, len(q))] = rng.integers(0, 4)
        if len(q) > 14:
            p = int(rng.integers(3, len(q) - 3))
            if rng.random() < 0.5:
                q = np.delete(q, slice(p, p + 2))
            else:
                q = np.concatenate([q[:p], rng.integers(0, 4, 2).astype(np.uint8), q[p:]])
        band = 8
        cost, aln = packalign.affine_align_path(q, t, s, band)
        oc, _ = affine.np_affine_oracle(q, t, s, band)
        assert cost == oc, (trial, cost, oc)
        # the path must re-produce its own cost and consume the whole query
        assert aln.cost(q, t) == cost, (trial, aln.blocks)
        qspan = sum(l for _, l in aln.blocks) + sum(-g for g, _ in aln.blocks if g < 0)
        assert qspan == len(q)
        assert 0 <= aln.t_start <= aln.t_end <= len(t)


def test_known_indel_cigar():
    t = np.random.default_rng(5).integers(0, 4, 32).astype(np.uint8)
    t[10:16] = [0, 1, 2, 3, 0, 2]                  # locally aperiodic
    q = np.concatenate([t[:12], t[14:26]])         # 2-base deletion vs target
    cost, aln = packalign.affine_align_path(q, t, 0, band=6)
    assert cost == 4 + 2 * 1
    assert aln.cigar() == "12M2D12M"
    mm, opens, gapb = aln.errors(q, t)
    assert (mm, opens, gapb) == (0, 1, 2)

    q2 = np.concatenate([t[:12], np.array([2, 2], np.uint8), t[12:24]])
    cost2, aln2 = packalign.affine_align_path(q2, t, 0, band=6)
    assert aln2.cigar() in ("12M2I12M",)
    assert cost2 == 4 + 2 * 1


def test_print_alignment_shape():
    t = np.random.default_rng(9).integers(0, 4, 24).astype(np.uint8)
    q = np.delete(t, slice(8, 10))
    _, aln = packalign.affine_align_path(q, t, 0, band=4)
    s = packalign.print_alignment(q, t, aln)
    lines = [l for l in s.splitlines() if l]
    assert lines[0].startswith("Q ")
    assert lines[2].startswith("T ")
    assert "-" in lines[0]  # the deletion shows as gaps in the query line

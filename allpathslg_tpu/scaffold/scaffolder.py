"""Greedy scaffolder + gap remodeling.

Behavior contract (ref: src/paths/MakeScaffolds*.cc — SURVEY.md §2.5 row 17,
§3.5): iterate over contig links in support order, accept the best-supported
consistent link joining free contig ends, grow scaffolds as chains, and
break/skip on conflicts. RemodelGaps (ref: src/paths/RemodelGaps.cc, row 18)
then re-estimates each junction's gap from its spanning pairs against the
library insert distribution (inverse-variance weighting here; full
IntDistribution MLE when empirical distributions land).

The link graph is tiny (thousands of contigs) → host code, like the
reference's own in-memory digraphE<sepdev> walk.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np

from allpathslg_tpu.scaffold.links import LinkGraph
from allpathslg_tpu.scaffold.superb import Superb


@dataclasses.dataclass(frozen=True)
class ScaffoldConfig:
    min_links: int = 2          # pairs required to accept a join
    max_gap_sd: float = 1e9     # reject sloppier link estimates


class _UF:
    def __init__(self, n):
        self.p = list(range(n))

    def find(self, x):
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[ra] = rb


def make_scaffolds(lg: LinkGraph, n_contigs: int,
                   cfg: ScaffoldConfig = ScaffoldConfig()) -> List[Superb]:
    """Greedy end-joining. Ends: (contig, 0=start, 1=end)."""
    # edge endpoint ends: oriented-a followed by oriented-b joins
    #   a's trailing end (start if flipped else end) to
    #   b's leading end (end if flipped else start)
    order = np.lexsort((lg.gap_sd, -lg.n_pairs))
    used_end: Dict[Tuple[int, int], Tuple[int, int, float, float, int]] = {}
    uf = _UF(n_contigs)
    for ei in order:
        n = int(lg.n_pairs[ei])
        if n < cfg.min_links or lg.gap_sd[ei] > cfg.max_gap_sd:
            continue
        a, b = int(lg.a[ei]), int(lg.b[ei])
        oa, ob = bool(lg.oa[ei]), bool(lg.ob[ei])
        end_a = (a, 0 if oa else 1)
        end_b = (b, 1 if ob else 0)
        if end_a in used_end or end_b in used_end:
            continue
        if uf.find(a) == uf.find(b):
            continue  # would close a cycle / conflict
        g = float(lg.gap_mean[ei])
        sd = float(lg.gap_sd[ei])
        used_end[end_a] = (*end_b, g, sd, n)
        used_end[end_b] = (*end_a, g, sd, n)
        uf.union(a, b)

    # extract chains
    seen = [False] * n_contigs
    scaffolds: List[Superb] = []
    for c in range(n_contigs):
        if seen[c]:
            continue
        free = [e for e in (0, 1) if (c, e) not in used_end]
        if len(free) == 0:
            continue  # interior contig; reached from a terminus
        # walk from the terminus: the free end faces outward/left
        start_enter_end = free[0]  # entering "via" this end
        chain = []
        cur, enter = c, start_enter_end
        prev_gap = None
        while True:
            seen[cur] = True
            flip = enter == 1
            chain.append((cur, flip, prev_gap))
            exit_end = 1 - enter
            nxt = used_end.get((cur, exit_end))
            if nxt is None:
                break
            ncon, nend, g, sd, n = nxt
            prev_gap = (g, sd, n)
            cur, enter = ncon, nend
            if seen[cur]:
                break
        sb = Superb(
            contig_ids=[x[0] for x in chain],
            rc=[x[1] for x in chain],
            gaps=[int(round(x[2][0])) for x in chain[1:]],
            gap_devs=[int(round(x[2][1])) + 1 for x in chain[1:]],
        )
        scaffolds.append(sb)
    # singletons with both ends used were skipped above only if interior;
    # isolated contigs (no links) have both ends free → emitted already
    for c in range(n_contigs):
        if not seen[c]:
            # cycle component: break arbitrarily at c
            chain = []
            cur, enter = c, 0
            prev_gap = None
            while not seen[cur]:
                seen[cur] = True
                flip = enter == 1
                chain.append((cur, flip, prev_gap))
                nxt = used_end.get((cur, 1 - enter))
                if nxt is None:
                    break
                ncon, nend, g, sd, n = nxt
                prev_gap = (g, sd, n)
                cur, enter = ncon, nend
            scaffolds.append(Superb(
                contig_ids=[x[0] for x in chain],
                rc=[x[1] for x in chain],
                gaps=[int(round(x[2][0])) for x in chain[1:]],
                gap_devs=[int(round(x[2][1])) + 1 for x in chain[1:]],
            ))
    return scaffolds


def remodel_gaps(scaffolds: List[Superb], lg: LinkGraph,
                 dist=None) -> List[Superb]:
    """Re-estimate junction gaps from their spanning pairs (ref:
    src/paths/RemodelGaps.cc). With an empirical per-library insert
    IntDistribution, each junction's gap is the maximum-likelihood value of
    sum_i log pmf(d_i + g) over its raw spans; without one (or without raw
    spans) it falls back to the inverse-variance mean."""
    # index edges by canonical (a, b, oa, ob)
    emap = {}
    for i in range(lg.n_edges):
        emap[(int(lg.a[i]), int(lg.b[i]), bool(lg.oa[i]), bool(lg.ob[i]))] = i

    for sb in scaffolds:
        for j in range(len(sb.gaps)):
            c1, f1 = sb.contig_ids[j], sb.rc[j]
            c2, f2 = sb.contig_ids[j + 1], sb.rc[j + 1]
            # canonical edge form
            if c1 <= c2:
                key = (c1, c2, f1, f2)
            else:
                key = (c2, c1, not f2, not f1)
            i = emap.get(key)
            if i is None:
                continue
            g = float(lg.gap_mean[i])
            sem = float(lg.gap_sd[i])
            n = int(lg.n_pairs[i])
            spans = lg.spans(i)
            if dist is not None and len(spans) >= 2:
                sample_sd = max(sem * np.sqrt(max(n, 1)), 1.0)
                lo = int(g - 4 * sample_sd - 20)
                hi = int(g + 4 * sample_sd + 20)
                g_mle, ll = dist.mle_gap(spans, lo, hi)
                if np.isfinite(ll):
                    g = float(g_mle)
                    # Fisher-information-style dev: the MLE's curvature is
                    # unavailable cheaply; keep the SEM, floored
                    sem = max(sem, 1.0)
            sb.gaps[j] = int(round(g))
            sb.gap_devs[j] = max(1, int(round(sem)))
    return scaffolds

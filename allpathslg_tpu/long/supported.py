"""Supported assembly graph: edges carry read-path support.

Behavior contract (ref: src/paths/long/SupportedHyperBasevector.{h,cc} and
src/paths/long/ReadPath.h — SURVEY.md §2.5 long-read extensions): the
second-generation representation keeps, alongside the assembly graph, the
multiset of read paths (edge-id sequences) threading it, and drives graph
simplification from that support: low-support edge deletion and pull-aparts
(duplicating a shared middle segment when paired paths disambiguate a
2-in/2-out junction).

Here the graph is the oriented unipath graph (graph/unipath.UniGraph) and
paths are graph/pathsdb.ReadPaths; support ops reuse the globally-batched
threading machinery of asm/localize.py (the reference's per-read walking,
recast as vectorized joins — SURVEY.md §7.2 step 7).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np

from allpathslg_tpu.graph.pathsdb import ReadPaths
from allpathslg_tpu.graph.unipath import UniGraph, Unipaths
from allpathslg_tpu.asm import localize


@dataclasses.dataclass
class SupportedGraph:
    """Unipath graph + per-edge read-path support + per-node path coverage.

    (ref: SupportedHyperBasevector's paths/weights pair)
    """
    ups: Unipaths
    g: UniGraph
    edge_support: np.ndarray   # int32 [E] reads crossing each adjacency edge
    node_cov: np.ndarray       # int32 [n] path entries touching each unipath

    @property
    def n_edges(self) -> int:
        return len(self.g.a)


def build_supported(ups: Unipaths, g: UniGraph, rp: ReadPaths) -> SupportedGraph:
    sup = localize.edge_support(g, rp)
    cov = np.bincount(rp.uid, minlength=ups.n).astype(np.int32)
    return SupportedGraph(ups=ups, g=g, edge_support=sup, node_cov=cov)


def delete_low_support(sg: SupportedGraph, min_support: int = 2
                       ) -> Tuple[SupportedGraph, int]:
    """Drop edges crossed by fewer than min_support read paths, except
    bridges that would disconnect a node (ref: SupportedHyperBasevector::
    DeleteLowCoverage behavior)."""
    cfg = localize.LocalizeConfig(min_edge_support=min_support)
    g2, n_dropped = localize.filter_unsupported_edges(
        sg.g, sg.edge_support, cfg)
    return dataclasses.replace(
        sg, g=g2,
        edge_support=_resupport(sg, g2)), n_dropped


def _resupport(sg: SupportedGraph, g2: UniGraph) -> np.ndarray:
    """Carry edge support over to a filtered edge list."""
    from allpathslg_tpu.graph.pathsdb import pack_edges
    old = {}
    kf = pack_edges(sg.g.a, sg.g.fa, sg.g.b, sg.g.fb)
    kr = pack_edges(sg.g.b, ~sg.g.fb, sg.g.a, ~sg.g.fa)
    for k, s in zip(np.minimum(kf, kr), sg.edge_support):
        old[int(k)] = int(s)
    kf2 = pack_edges(g2.a, g2.fa, g2.b, g2.fb)
    kr2 = pack_edges(g2.b, ~g2.fb, g2.a, ~g2.fa)
    return np.array([old.get(int(k), 0)
                     for k in np.minimum(kf2, kr2)], np.int32)


def pull_apart(sg: SupportedGraph, rp: ReadPaths,
               min_thread_support: int = 2, max_rounds: int = 8
               ) -> Tuple[SupportedGraph, int]:
    """Pull-apart: replicate a junction unipath per supported (in, out)
    thread pairing (ref: SupportedHyperBasevector::PullApart — the 2-in/
    2-out case; generalized here to k-in/k-out perfect pairings)."""
    cfg = localize.LocalizeConfig(min_thread_support=min_thread_support,
                                  max_rounds=max_rounds)
    ups, g, n = sg.ups, sg.g, 0
    for _ in range(max_rounds):
        ups, g, k = localize.thread_repeats(ups, g, rp, cfg)
        n += k
        if k == 0:
            break
    sg2 = SupportedGraph(ups=ups, g=g,
                         edge_support=np.zeros(len(g.a), np.int32),
                         node_cov=np.zeros(ups.n, np.int32))
    return sg2, n


def simplify_supported(sg: SupportedGraph, rp: ReadPaths,
                       min_support: int = 2, min_thread_support: int = 2
                       ) -> Tuple[SupportedGraph, Dict[str, int]]:
    """The LongProto cleanup loop: low-support deletion then pull-aparts."""
    sg, n_dropped = delete_low_support(sg, min_support)
    sg, n_split = pull_apart(sg, rp, min_thread_support)
    return sg, {"n_edges_dropped": int(n_dropped),
                "n_pulled_apart": int(n_split)}
